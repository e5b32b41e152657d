package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}

/** Analysis-time input-type enforcement for the graft expressions.
  *
  * `ExpectsInputTypes` is unusable outside `org.apache.spark.sql`
  * (`AbstractDataType` is private[sql] in Spark 4), but
  * `Expression.checkInputDataTypes` only needs the public
  * `TypeCheckResult`, so each expression overrides that instead.
  * Without this, an `array<double>` (or any non-float array) child
  * would be read via `ArrayData.getFloat` and yield silent garbage
  * distances/signs instead of an analysis error (ADVICE r3 #1).
  */
private[functions] object TypeChecks {

  /** Success iff `dt` is array<float> (nullable elements allowed —
    * the expressions are null-safe per element via numElements). */
  def requireFloatArray(exprName: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$exprName requires an array<float> input, got ${other.catalogString}")
    }

  def requireFloatArrays(exprName: String, dts: Seq[DataType]): TypeCheckResult =
    dts.map(requireFloatArray(exprName, _)).find(_.isFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  def requireLongArray(exprName: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$exprName requires an array<bigint> input, got ${other.catalogString}")
    }

  def requireString(exprName: String, dt: DataType): TypeCheckResult =
    dt match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$exprName requires a string input, got ${other.catalogString}")
    }
}
