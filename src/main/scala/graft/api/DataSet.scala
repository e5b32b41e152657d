package graft.api

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.{broadcast => bcastHint, col}

/** Reference-parity functional API surface (SURVEY.md §2), Spark-first.
  *
  * Mirrors the reference's `DataSet<T>` second-order-function API
  * ([U] stratosphere-java/.../api/java/DataSet.java): map / flatMap /
  * filter / distinct / union / join / coGroup / cross / groupBy /
  * reduce / reduceGroup / sortGroup / first / partitionByHash /
  * rebalance, plus broadcast sets and rich (open/close) functions.
  *
  * Design: thin delegation onto `Dataset[T]` so Catalyst/Tungsten own
  * optimization and execution. Typed lambda forms are provided for
  * reference parity; for hot paths callers should prefer the Column
  * forms (`selectExpr`, `filterExpr`, `joinOn`) which stay inside
  * whole-stage codegen and get predicate pushdown.
  */
class GDataSet[T](val ds: Dataset[T]) extends Serializable {

  def spark: SparkSession = ds.sparkSession

  // ---- element-wise ([U] MapDriver / FlatMapDriver / FilterOperatorBase)

  def map[U: Encoder](f: T => U): GDataSet[U] = new GDataSet(ds.map(f))

  def flatMap[U: Encoder](f: T => IterableOnce[U]): GDataSet[U] =
    new GDataSet(ds.flatMap(f))

  /** Reference `FlatMapFunction` shape: UDF receives a [[Collector]].
    * [U] stratosphere-core/.../api/common/functions/FlatMapFunction. */
  def flatMapWithCollector[U: Encoder](f: (T, Collector[U]) => Unit): GDataSet[U] =
    new GDataSet(ds.flatMap { t =>
      val c = new Collector[U]; f(t, c); c.buffer
    })

  def filter(p: T => Boolean): GDataSet[T] = new GDataSet(ds.filter(p))

  /** Reference `mapPartition(MapPartitionFunction)`: UDF sees a whole
    * partition's iterator ([U] .../operators/MapPartitionOperator). */
  def mapPartition[U: Encoder](f: Iterator[T] => IterableOnce[U]): GDataSet[U] =
    new GDataSet(ds.mapPartitions(it => f(it).iterator))

  /** Column-expression forms — preferred (codegen + pushdown). */
  def filterExpr(cond: Column): GDataSet[T] = new GDataSet(ds.filter(cond))

  def selectExpr(exprs: String*): DataFrame = ds.selectExpr(exprs: _*)

  /** Reference `project(fields...)` → relational select (type dropped).
    * [U] .../api/java/operators/ProjectOperator.java */
  def project(fields: String*): DataFrame = ds.toDF().select(fields.map(col): _*)

  /** Rich-function map: `open`/`close` per partition with access to
    * broadcast sets, mirroring RichFunction + RuntimeContext.
    * [U] stratosphere-core/.../api/common/functions/AbstractRichFunction */
  def mapRich[U: Encoder](rich: RichMapFunction[T, U]): GDataSet[U] =
    new GDataSet(ds.mapPartitions { it =>
      rich.open()
      val out = it.map(rich.map)
      // close() after the iterator is exhausted:
      new Iterator[U] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) rich.close(); h }
        def next(): U = out.next()
      }
    })

  def flatMapRich[U: Encoder](rich: RichFlatMapFunction[T, U]): GDataSet[U] =
    new GDataSet(ds.mapPartitions { it =>
      rich.open()
      val out = it.flatMap { t =>
        val c = new Collector[U]
        rich.flatMap(t, c)
        c.buffer
      }
      new Iterator[U] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) rich.close(); h }
        def next(): U = out.next()
      }
    })

  def filterRich(rich: RichFilterFunction[T]): GDataSet[T] =
    new GDataSet(ds.mapPartitions { it =>
      rich.open()
      val out = it.filter(rich.filter)
      new Iterator[T] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) rich.close(); h }
        def next(): T = out.next()
      }
    }(ds.encoder))

  // ---- distinct / union ([U] DistinctOperator, UnionOperator) --------

  def distinct(): GDataSet[T] = new GDataSet(ds.distinct())

  /** Bag union = UNION ALL, exactly the reference semantics. */
  def union(other: GDataSet[T]): GDataSet[T] = new GDataSet(ds.union(other.ds))

  // ---- joins ([U] JoinOperator; hints map to Spark join hints) -------

  def join[U](other: GDataSet[U]): JoinBuilder[T, U] =
    new JoinBuilder(this, other, JoinHint.OptimizerChooses)

  /** Join with an explicit strategy hint ([U] JoinOperatorBase.JoinHint
    * → Spark's broadcast/merge/shuffle_hash hints). */
  def joinWithHint[U](other: GDataSet[U], hint: JoinHint): JoinBuilder[T, U] =
    new JoinBuilder(this, other, hint)

  /** `joinWithTiny`: other side is small → broadcast it. */
  def joinWithTiny[U](other: GDataSet[U]): JoinBuilder[T, U] =
    new JoinBuilder(this, other, JoinHint.BroadcastSecond)

  /** `joinWithHuge`: this side is small → broadcast it. */
  def joinWithHuge[U](other: GDataSet[U]): JoinBuilder[T, U] =
    new JoinBuilder(this, other, JoinHint.BroadcastFirst)

  /** Column-condition join (preferred, stays relational). */
  def joinOn[U](other: GDataSet[U], cond: Column): GDataSet[(T, U)] =
    new GDataSet(ds.joinWith(other.ds, cond, "inner"))

  // ---- coGroup ([U] CoGroupOperator → KeyValueGroupedDataset.cogroup)

  def coGroup[U](other: GDataSet[U]): CoGroupBuilder[T, U] =
    new CoGroupBuilder(this, other)

  // ---- cross ([U] CrossOperator → CartesianProduct/BNLJ) -------------

  def cross[U](other: GDataSet[U])(
      implicit e: Encoder[(T, U)]): GDataSet[(T, U)] =
    new GDataSet(ds.joinWith(other.ds, org.apache.spark.sql.functions.lit(true), "inner"))

  def crossWithTiny[U](other: GDataSet[U])(
      implicit e: Encoder[(T, U)]): GDataSet[(T, U)] =
    new GDataSet(ds.joinWith(bcastHint(other.ds), org.apache.spark.sql.functions.lit(true), "inner"))

  def crossWithHuge[U](other: GDataSet[U])(
      implicit e: Encoder[(T, U)]): GDataSet[(T, U)] =
    new GDataSet(bcastHint(ds).joinWith(other.ds, org.apache.spark.sql.functions.lit(true), "inner"))

  // ---- grouping / reduction ([U] Grouping, ReduceDriver, GroupReduceDriver)

  def groupBy[K: Encoder](key: T => K): GGrouping[K, T] =
    new GGrouping(ds.groupByKey(key))

  /** Global reduce ([U] AllReduceDriver): associative pairwise fold. */
  def reduce(f: (T, T) => T): GDataSet[T] = {
    implicit val enc: Encoder[T] = ds.encoder
    new GDataSet(ds.groupByKey(_ => 0)(org.apache.spark.sql.Encoders.scalaInt)
      .reduceGroups(f).map(_._2))
  }

  /** Global group-reduce ([U] AllGroupReduceDriver): whole input as one
    * iterator. WARNING — deliberately a SINGLE task (parallelism-1 by
    * definition, same as the reference's AllGroupReduce): the whole
    * dataset streams through one executor thread. It streams (proven
    * on a 2M-row group in DataSetSpec), but on a 100 TB frame this is
    * the wrong operator — use `groupBy(...).reduceGroup` (keyed, fully
    * parallel) or an associative [[reduce]] (combiner-split) instead.
    * Kept for API parity with bounded inputs. */
  def reduceGroup[U: Encoder](f: Iterator[T] => IterableOnce[U]): GDataSet[U] = {
    implicit val enc: Encoder[T] = ds.encoder
    new GDataSet(ds.repartition(1).mapPartitions(it => f(it).iterator))
  }

  // ---- sorting / first-n ([U] FirstReducer, sink ordering) -----------

  def sortPartition(c: Column*): GDataSet[T] = new GDataSet(ds.sortWithinPartitions(c: _*))

  def first(n: Int): GDataSet[T] = new GDataSet(ds.limit(n))

  def orderBy(c: Column*): GDataSet[T] = new GDataSet(ds.orderBy(c: _*))

  // ---- physical redistribution ([U] PartitionOperator) ---------------

  def partitionByHash(fields: String*): GDataSet[T] =
    new GDataSet(ds.repartition(fields.map(col): _*))

  def rebalance(parallelism: Int): GDataSet[T] = new GDataSet(ds.repartition(parallelism))

  // ---- iterations (SURVEY.md §2.8; bodies in Iterations.scala) -------

  /** Bulk iteration ([U] IterativeDataSet.iterate/closeWith). */
  def iterate(maxIterations: Int)(body: GDataSet[T] => GDataSet[T]): GDataSet[T] =
    new GDataSet(Iterations.bulk(ds, maxIterations)(d => body(new GDataSet(d)).ds))

  /** Delta iteration sugar ([U] DataSet.iterateDelta): this dataset is
    * the initial solution set; `workset` seeds the working set; `step`
    * returns (delta, nextWorkset); solution rows are replaced by key.
    * Drops to DataFrame (keyed updates are relational by nature). */
  def iterateDelta(workset: DataFrame, keys: Seq[String], maxIterations: Int)(
      step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame =
    Iterations.delta(ds.toDF(), workset, keys, maxIterations)(step)

  /** Field-wise aggregation builder ([U] AggregateOperator):
    * `ds.aggregate(SUM, "a").and(MAX, "b").result`. */
  def aggregate(agg: Aggregations.Value, field: String): AggregateBuilder =
    AggregateBuilder(ds.toDF(), Nil, agg, field)

  /** Field-name grouping for the aggregate builder
    * ([U] UnsortedGrouping.aggregate). */
  def groupByFields(fields: String*): GroupedFields =
    new GroupedFields(ds.toDF(), fields)

  // ---- sinks ([U] FileOutputFormat family; part-file model matches) --

  def writeAsCsv(path: String, overwrite: Boolean = true): Unit =
    ds.toDF().write.mode(if (overwrite) "overwrite" else "errorifexists")
      .option("header", "true").csv(path)

  def writeAsText(path: String, overwrite: Boolean = true): Unit =
    ds.toDF().selectExpr("concat_ws(',', *) as value")
      .write.mode(if (overwrite) "overwrite" else "errorifexists").text(path)

  def writeAsParquet(path: String, overwrite: Boolean = true): Unit =
    ds.write.mode(if (overwrite) "overwrite" else "errorifexists").parquet(path)

  /** In-plan metrics ([U] accumulators surfaced via JobExecutionResult;
    * Spark's Observation = the declarative form). */
  def observed(obs: org.apache.spark.sql.Observation, exprs: Column*): GDataSet[T] =
    new GDataSet(ds.observe(obs, exprs.head, exprs.tail: _*))

  /** Partition-wise pipe through an external command ([U]
    * ExternalProcessInputFormat's transform-shaped sibling; Spark's
    * RDD.pipe handles process lifecycle + bidirectional streaming).
    * Rows enter the process as comma-joined lines on stdin; stdout
    * lines come back as records. One process per partition — at scale
    * the command's cost rides the existing partitioning. */
  def pipe(cmd: Seq[String]): GDataSet[String] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val piped = ds.toDF().selectExpr("concat_ws(',', *) AS value")
      .as[String].rdd.pipe(cmd)
    new GDataSet(spark.createDataset(piped))
  }

  def print(): Unit = ds.show(false)

  def collectSeq(): Seq[T] = ds.collect().toSeq

  def count(): Long = ds.count()
}

/** Reference `Histogram` accumulator ([U] stratosphere-core/.../api/
  * common/accumulators/Histogram.java): integer-bucket counts,
  * merged additively across tasks (AccumulatorV2 form). */
final class HistogramAccumulator
    extends org.apache.spark.util.AccumulatorV2[Int, Map[Int, Long]] {
  private val counts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
  override def isZero: Boolean = counts.isEmpty
  override def copy(): HistogramAccumulator = {
    val c = new HistogramAccumulator
    counts.forEach((k, v) => c.counts.put(k, v))
    c
  }
  override def reset(): Unit = counts.clear()
  override def add(v: Int): Unit = counts.merge(v, 1L, (a, b) => a + b)
  override def merge(other: org.apache.spark.util.AccumulatorV2[Int, Map[Int, Long]]): Unit =
    other.value.foreach { case (k, v) => counts.merge(k, v, (a, b) => a + b) }
  override def value: Map[Int, Long] = {
    val b = Map.newBuilder[Int, Long]
    counts.forEach((k, v) => b += (k.intValue -> v.longValue))
    b.result()
  }
}

/** Reference `Collector<T>` ([U] stratosphere-core/.../util/Collector.java). */
final class Collector[U] extends Serializable {
  private[api] val buffer = new ArrayBuffer[U]
  def collect(u: U): Unit = buffer += u
}

/** Rich function base: open/close lifecycle + broadcast-set access
  * ([U] AbstractRichFunction / RuntimeContext). Broadcast sets are
  * captured as Spark broadcasts at definition time. */
abstract class RichFunction extends Serializable {
  private var bsets: Map[String, Broadcast[Seq[Any]]] = Map.empty
  private[api] def withBroadcastSets(m: Map[String, Broadcast[Seq[Any]]]): this.type = {
    bsets = m; this
  }
  def getBroadcastVariable[B](name: String): Seq[B] =
    bsets(name).value.asInstanceOf[Seq[B]]
  def open(): Unit = {}
  def close(): Unit = {}
}

/** [U] RichMapFunction. */
abstract class RichMapFunction[T, U] extends RichFunction {
  def map(t: T): U
}

/** [U] RichFlatMapFunction (Collector-style 1→N). */
abstract class RichFlatMapFunction[T, U] extends RichFunction {
  def flatMap(t: T, out: Collector[U]): Unit
}

/** [U] RichFilterFunction. */
abstract class RichFilterFunction[T] extends RichFunction {
  def filter(t: T): Boolean
}

object RichMapFunction {
  /** Hard cap on rows a broadcast set may materialize on the driver
    * (override with `spark.graft.broadcastSet.maxRows`). Broadcast
    * sets are the reference's SMALL-side channel; an unbounded
    * `collect()` of a big frame would OOM the driver silently at
    * cluster scale, so oversize sets fail fast with an actionable
    * error instead. */
  val DefaultBroadcastSetMaxRows: Long = 10000000L

  /** Reference `withBroadcastSet(set, name)`: materialize a (small)
    * dataset and attach it to a rich function as a named broadcast.
    * Works for every [[RichFunction]] kind.
    *
    * The set must stay under `spark.graft.broadcastSet.maxRows`
    * (default [[DefaultBroadcastSetMaxRows]]): the guard counts
    * `limit(max+1)` — one cheap early-stopping job, never a full
    * materialization — and throws before collecting anything when the
    * set is over budget. */
  def withBroadcastSet[R <: RichFunction, B](rich: R,
      set: GDataSet[B], name: String): R = {
    val maxRows = set.spark.conf
      .getOption("spark.graft.broadcastSet.maxRows")
      .map(_.toLong).getOrElse(DefaultBroadcastSetMaxRows)
    val probeLimit =
      if (maxRows >= Int.MaxValue - 1) Int.MaxValue else maxRows.toInt + 1
    // ONE job: the limit(max+1) both enforces the cap (early-stopping —
    // never materializes more than max+1 rows) and IS the collect, so an
    // expensive upstream plan (join/agg-derived set) runs once, not twice
    val rows = set.ds.limit(probeLimit).collect()
    require(rows.length <= maxRows,
      s"broadcast set '$name' exceeds spark.graft.broadcastSet.maxRows=" +
        s"$maxRows rows; broadcast sets are driver-materialized and must " +
        "stay small — join against the big frame instead, or raise the cap")
    val b = set.spark.sparkContext
      .broadcast(rows.toSeq.asInstanceOf[Seq[Any]])
    rich.withBroadcastSets(Map(name -> b))
  }
}

/** Field-wise built-in aggregations ([U] .../api/java/aggregation/
  * Aggregations.java + AggregateOperator): `aggregate(SUM, "a")
  * .and(MAX, "b")` builder over a (grouped) dataset. */
object Aggregations extends Enumeration {
  val SUM, MIN, MAX = Value
}

final class AggregateBuilder(df: DataFrame, groupCols: Seq[String]) {
  private var aggs: Vector[(Aggregations.Value, String)] = Vector.empty

  def and(agg: Aggregations.Value, field: String): AggregateBuilder = {
    aggs :+= (agg, field); this
  }

  def result: DataFrame = {
    import org.apache.spark.sql.functions.{max => fmax, min => fmin, sum => fsum}
    val exprs = aggs.map {
      case (Aggregations.SUM, f) => fsum(col(f)).as(s"sum_$f")
      case (Aggregations.MIN, f) => fmin(col(f)).as(s"min_$f")
      case (Aggregations.MAX, f) => fmax(col(f)).as(s"max_$f")
    }
    if (groupCols.isEmpty) df.agg(exprs.head, exprs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }
}

object AggregateBuilder {
  def apply(df: DataFrame, groupCols: Seq[String],
      agg: Aggregations.Value, field: String): AggregateBuilder = {
    val b = new AggregateBuilder(df, groupCols)
    b.and(agg, field)
  }
}

final class GroupedFields(df: DataFrame, fields: Seq[String]) {
  def aggregate(agg: Aggregations.Value, field: String): AggregateBuilder =
    AggregateBuilder(df, fields, agg, field)
}

sealed trait JoinHint
object JoinHint {
  case object OptimizerChooses extends JoinHint
  case object BroadcastFirst extends JoinHint
  case object BroadcastSecond extends JoinHint
  /** REPARTITION_SORT_MERGE ([U] JoinOperatorBase.JoinHint). */
  case object SortMerge extends JoinHint
  /** REPARTITION_HASH_FIRST/SECOND. */
  case object ShuffleHash extends JoinHint
}

/** `ds1.join(ds2).where(k1).equalTo(k2)` builder ([U] JoinOperator). */
final class JoinBuilder[T, U](left: GDataSet[T], right: GDataSet[U], hint: JoinHint) {
  def where[K: Encoder](k: T => K): JoinWhere[T, U, K] = new JoinWhere(left, right, hint, k)
}

final class JoinWhere[T, U, K: Encoder](left: GDataSet[T], right: GDataSet[U],
    hint: JoinHint, lk: T => K) {
  def equalTo(rk: U => K): JoinPredicate[T, U, K] =
    new JoinPredicate(left, right, hint, lk, rk)
}

final class JoinPredicate[T, U, K: Encoder](left: GDataSet[T], right: GDataSet[U],
    hint: JoinHint, lk: T => K, rk: U => K) {

  private def paired(implicit lt: Encoder[(K, T)], rt: Encoder[(K, U)]) = {
    val (lkf, rkf) = (lk, rk) // local copies: don't capture `this` in closures
    val l0 = left.ds.map(t => (lkf(t), t))
    val r0 = right.ds.map(u => (rkf(u), u))
    val l = hint match {
      case JoinHint.BroadcastFirst => bcastHint(l0)
      case JoinHint.SortMerge => l0.hint("merge")
      case JoinHint.ShuffleHash => l0.hint("shuffle_hash")
      case _ => l0
    }
    val r = if (hint == JoinHint.BroadcastSecond) bcastHint(r0) else r0
    l.joinWith(r, l("_1") === r("_1"), "inner")
  }

  /** Default join result = pair of matching elements. */
  def build(implicit lt: Encoder[(K, T)], rt: Encoder[(K, U)],
      out: Encoder[(T, U)]): GDataSet[(T, U)] =
    new GDataSet(paired.map(p => (p._1._2, p._2._2)))

  /** `JoinFunction` form. */
  def apply[O: Encoder](f: (T, U) => O)(
      implicit lt: Encoder[(K, T)], rt: Encoder[(K, U)]): GDataSet[O] = {
    val g = f // local copy: don't capture `this`
    new GDataSet(paired.map(p => g(p._1._2, p._2._2)))
  }
}

/** `ds1.coGroup(ds2).where(k1).equalTo(k2).apply(f)` ([U] CoGroupOperator):
  * per-key pair of iterators — superset of join / outer join / except. */
final class CoGroupBuilder[T, U](left: GDataSet[T], right: GDataSet[U]) {
  def where[K: Encoder](k: T => K): CoGroupWhere[T, U, K] =
    new CoGroupWhere(left, right, k)
}

final class CoGroupWhere[T, U, K: Encoder](left: GDataSet[T], right: GDataSet[U], lk: T => K) {
  def equalTo(rk: U => K): CoGroupPredicate[T, U, K] =
    new CoGroupPredicate(left, right, lk, rk)
}

final class CoGroupPredicate[T, U, K: Encoder](left: GDataSet[T], right: GDataSet[U],
    lk: T => K, rk: U => K, lSort: Seq[Column] = Nil, rSort: Seq[Column] = Nil) {

  /** [U] CoGroupOperator.sortFirstGroup: the LEFT group iterator
    * arrives ordered by these value columns, named as in the
    * UNDERLYING dataset's schema (`col("_2")` on a fromCollection
    * tuple dataset, `col("l_quantity")` after a select from a table —
    * Spark resolves cogroup sort exprs against the input's data
    * attributes, not the encoder's flattened names). Sort columns
    * accumulate across calls like the reference's repeated
    * sortFirstGroup(field, Order) chain. */
  def sortFirstGroup(cols: Column*): CoGroupPredicate[T, U, K] =
    new CoGroupPredicate(left, right, lk, rk, lSort ++ cols, rSort)

  /** [U] CoGroupOperator.sortSecondGroup: same for the RIGHT side. */
  def sortSecondGroup(cols: Column*): CoGroupPredicate[T, U, K] =
    new CoGroupPredicate(left, right, lk, rk, lSort, rSort ++ cols)

  def apply[O: Encoder](f: (K, Iterator[T], Iterator[U]) => IterableOnce[O]): GDataSet[O] = {
    implicit val lenc: Encoder[T] = left.ds.encoder
    implicit val renc: Encoder[U] = right.ds.encoder
    val l = left.ds.groupByKey(lk)
    val r = right.ds.groupByKey(rk)
    // sorted variant rides Spark's sort-merge cogroup (the secondary
    // sort folds into the existing per-partition sort, no extra
    // shuffle — same machinery as flatMapSortedGroups)
    if (lSort.isEmpty && rSort.isEmpty)
      new GDataSet(l.cogroup(r)((k, li, ri) => f(k, li, ri).iterator))
    else
      new GDataSet(l.cogroupSorted(r)(lSort: _*)(rSort: _*)(
        (k, li, ri) => f(k, li, ri).iterator))
  }
}

/** Grouped operations ([U] UnsortedGrouping / SortedGrouping). */
final class GGrouping[K, T](val kv: org.apache.spark.sql.KeyValueGroupedDataset[K, T]) {

  /** Per-key pairwise reduce ([U] ReduceDriver; combiner automatic —
    * Catalyst splits typed reduceGroups into partial + final). */
  def reduce(f: (T, T) => T)(implicit e: Encoder[(K, T)]): GDataSet[(K, T)] =
    new GDataSet(kv.reduceGroups(f))

  /** Per-key iterator reduce ([U] GroupReduceDriver / flatMapGroups). */
  def reduceGroup[U: Encoder](f: (K, Iterator[T]) => IterableOnce[U]): GDataSet[U] =
    new GDataSet(kv.flatMapGroups((k, it) => f(k, it).iterator))

  /** Secondary sort + group reduce ([U] SortedGrouping.sortGroup →
    * sort-based local strategy): the group iterator arrives in
    * `sortCols` order (Spark's flatMapSortedGroups = sort-merge group). */
  def sortGroupReduce[U: Encoder](sortCols: Column*)(
      f: (K, Iterator[T]) => IterableOnce[U]): GDataSet[U] =
    new GDataSet(kv.flatMapSortedGroups(sortCols: _*)((k, it) => f(k, it).iterator))

  /** First-n per group ([U] FirstReducer). */
  def first(n: Int)(implicit e: Encoder[T]): GDataSet[T] =
    new GDataSet(kv.flatMapGroups((_, it) => it.take(n)))

  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): GDataSet[U] =
    new GDataSet(kv.mapGroups(f))

  /** Combinable group-reduce as a typed Aggregator ([U]
    * GroupCombineFunction / @Combinable): Catalyst splits the
    * aggregator into partial (combine) + final phases — exactly the
    * reference's combiner-before-shuffle contract. */
  def aggWith[U](agg: org.apache.spark.sql.expressions.Aggregator[T, _, U])(
      implicit e: Encoder[(K, U)]): GDataSet[(K, U)] =
    new GDataSet(kv.agg(agg.toColumn))
}

/** Reference-style combinable aggregators (SURVEY.md §2.10). */
object Aggregators {

  /** Top-k smallest by an extracted key — the classic combinable
    * group-reduce that a naive full-group iterator would do without a
    * combiner. Buffer is bounded at k, so partial aggregation ships
    * O(k) per partition instead of the whole group. */
  def topK[T: Encoder](k: Int, key: T => Double)(
      implicit e: Encoder[Seq[T]]): org.apache.spark.sql.expressions.Aggregator[T, Seq[T], Seq[T]] =
    new org.apache.spark.sql.expressions.Aggregator[T, Seq[T], Seq[T]] {
      def zero: Seq[T] = Seq.empty
      def reduce(b: Seq[T], a: T): Seq[T] = (b :+ a).sortBy(key).take(k)
      def merge(b1: Seq[T], b2: Seq[T]): Seq[T] = (b1 ++ b2).sortBy(key).take(k)
      def finish(r: Seq[T]): Seq[T] = r
      def bufferEncoder: Encoder[Seq[T]] = implicitly[Encoder[Seq[T]]]
      def outputEncoder: Encoder[Seq[T]] = implicitly[Encoder[Seq[T]]]
    }
}

/** Reference `ExecutionEnvironment` ([U] .../api/java/ExecutionEnvironment.java). */
class GraftEnvironment(val spark: SparkSession) {

  def fromCollection[T: Encoder](data: Seq[T]): GDataSet[T] =
    new GDataSet(spark.createDataset(data))

  def fromElements[T: Encoder](data: T*): GDataSet[T] = fromCollection(data)

  /** [U] TextInputFormat: one string per line. */
  def readTextFile(path: String): GDataSet[String] = {
    import spark.implicits._
    new GDataSet(spark.read.textFile(path))
  }

  /** [U] CsvInputFormat: delimited with declared field types and the
    * reference's `includeFields` positional mask. */
  def readCsvFile(path: String, delimiter: String = ",",
      header: Boolean = false, schema: Option[String] = None,
      includedFields: Seq[Int] = Nil): GDataSet[org.apache.spark.sql.Row] = {
    var r = spark.read.option("delimiter", delimiter).option("header", header.toString)
    r = schema.map(r.schema).getOrElse(r.option("inferSchema", "true"))
    val df = r.csv(path)
    val out = if (includedFields.isEmpty) df
    else df.select(includedFields.map(i => col(df.columns(i))): _*)
    new GDataSet(out)
  }

  def readParquet(path: String): GDataSet[org.apache.spark.sql.Row] =
    new GDataSet(spark.read.parquet(path))

  /** [U] ExternalProcessInputFormat: one spawned process per split,
    * stdout lines become records. The split index reaches the command
    * as $GRAFT_SPLIT (the reference passes split metadata to the
    * process the same way). Stdout streams through the iterator — a
    * split's output never buffers wholesale, so a process emitting
    * millions of lines is fine; a non-zero exit fails the task (and
    * Spark's retry machinery re-runs the split). */
  def readExternalProcess(cmd: Seq[String], splits: Int = 1): GDataSet[String] = {
    import spark.implicits._
    require(splits >= 1, s"splits must be >= 1, got $splits")
    val command = cmd // don't capture `this` in the task closure
    val rdd = spark.sparkContext.parallelize(0 until splits, splits)
      .mapPartitionsWithIndex { (idx, _) =>
        val pb = new ProcessBuilder(command: _*)
        pb.environment().put("GRAFT_SPLIT", idx.toString)
        val p = pb.start()
        p.getOutputStream.close() // source contract: no stdin
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
        new Iterator[String] {
          private var nextLine = reader.readLine()
          override def hasNext: Boolean = {
            if (nextLine == null) {
              reader.close()
              val rc = p.waitFor()
              if (rc != 0) throw new RuntimeException(
                s"external process exited $rc: ${command.mkString(" ")}")
            }
            nextLine != null
          }
          override def next(): String = {
            val l = nextLine; nextLine = reader.readLine(); l
          }
        }
      }
    new GDataSet(spark.createDataset(rdd))
  }

  /** Accumulator parity ([U] IntCounter/LongCounter). */
  def longCounter(name: String): org.apache.spark.util.LongAccumulator =
    spark.sparkContext.longAccumulator(name)

  def doubleCounter(name: String): org.apache.spark.util.DoubleAccumulator =
    spark.sparkContext.doubleAccumulator(name)

  /** Histogram accumulator ([U] .../api/common/accumulators/
    * Histogram.java): per-bucket counts merged across tasks. */
  def histogram(name: String): HistogramAccumulator = {
    val acc = new HistogramAccumulator
    spark.sparkContext.register(acc, name)
    acc
  }

  /** DistributedCache parity ([U] .../api/common/cache/
    * DistributedCache.java): ship a file to every executor; tasks
    * resolve it with [[getCachedFile]]. */
  def registerCachedFile(path: String): Unit =
    spark.sparkContext.addFile(path)

  def getCachedFile(name: String): String =
    org.apache.spark.SparkFiles.get(name)
}
