package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Nearest-centroid assignment over a float-vector column, as a
  * codegen'd expression (replaces the boxed Seq[Float] UDFs the round-1
  * KMeans/IVF used — VERDICT r1 #3/#7).
  *
  * Distances are EXACT-QUANTIZED: each squared-difference term is
  * widened to double, rounded half-away-from-zero to integer 1e-12
  * units, and summed as longs (the CosineSim pattern). The argmin is
  * therefore independent of summation order and bit-reproducible in
  * the DuckDB oracle — which is what unlocks an exact unrolled-SQL
  * KMeans oracle (the raw-double formulation was order-sensitive
  * cross-engine and could not be oracle-checked).
  *
  * The centroid matrix is a bounded driver-side constant (k x dim
  * scalars) embedded as a codegen reference object — the Spark-first
  * analogue of the reference's broadcast-set KMeans centroids
  * ([U] stratosphere-examples/.../clustering/KMeans.java).
  */
case class NearestCellExpr(child: Expression, cells: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireFloatArray("nearest_cell", child.dataType)

  override def nullSafeEval(v: Any): Any =
    NearestCell.assign(v.asInstanceOf[ArrayData], cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCell.assign($v, $cellsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest cell ids, ordered by (quantized distance,
  * cell id) — the IVF multi-probe expansion for the query side. */
case class NearestCellsExpr(child: Expression, cells: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireFloatArray("nearest_cells", child.dataType)

  override def nullSafeEval(v: Any): Any =
    NearestCell.probes(v.asInstanceOf[ArrayData], cells, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCell.probes($v, $cellsRef, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCell {

  /** Exact-quantized squared L2 distance: sum of per-term
    * round((v_i - c_i)^2 * 1e12) as longs. Terms are <= ~4e12 and dims
    * are small, so the long sum never approaches overflow. */
  def quantDist(v: ArrayData, cent: Array[Double]): Long = {
    val n = v.numElements()
    if (n != cent.length)
      throw new IllegalArgumentException(
        s"vector dim $n != centroid dim ${cent.length}")
    var d = 0L
    var i = 0
    while (i < n) {
      val t = v.getFloat(i).toDouble - cent(i)
      d += CosineSim.rs(t * t)
      i += 1
    }
    d
  }

  /** Argmin cell id; strict < keeps the lowest id on ties. */
  def assign(v: ArrayData, cells: Array[Array[Double]]): Int = {
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < cells.length) {
      val d = quantDist(v, cells(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The nprobe nearest cell ids by (distance, id). */
  def probes(v: ArrayData, cells: Array[Array[Double]], nprobe: Int): ArrayData = {
    val ds = Array.tabulate(cells.length)(c => (quantDist(v, cells(c)), c))
    java.util.Arrays.sort(ds, Ordering.Tuple2[Long, Int])
    new GenericArrayData(ds.take(math.min(nprobe, ds.length)).map(_._2))
  }

  /** SQL twin of [[quantDist]]'s per-term arithmetic for the DuckDB
    * oracle: round(((v)-(c)) * ((v)-(c)) * 1e12) as BIGINT, summed.
    * (The sum itself is written at the call site — it needs the
    * oracle's own grouping.) */
  def sqlQuantTerm(v: String, c: String): String =
    s"CAST(round((($v) - ($c)) * (($v) - ($c)) * 1e12) AS BIGINT)"

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: nearest cell id for a float-vector column. */
  def nearestCell(vec: Column, cells: Array[Array[Double]]): Column =
    Bridge.column(NearestCellExpr(Bridge.expression(vec), cells))

  /** Column API: the nprobe nearest cell ids. */
  def nearestCells(vec: Column, cells: Array[Array[Double]], nprobe: Int): Column =
    Bridge.column(NearestCellsExpr(Bridge.expression(vec), cells, nprobe))
}
