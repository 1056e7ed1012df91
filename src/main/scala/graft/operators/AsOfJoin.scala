package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime, per key.
  *
  * Formulated as union + window instead of a range join: tag both
  * sides, union, then `last(payload, ignoreNulls) OVER (PARTITION BY
  * key ORDER BY time, side ROWS UNBOUNDED PRECEDING)` carries the
  * latest right payload forward onto every left row. ONE shuffle on
  * the key, no per-row range probing, no broadcast requirement on
  * either side — the shape that survives both sides being large.
  * (Composition tier (a) of SURVEY §7.3 — no custom SparkPlan
  * needed.) Ties (equal times) resolve right-before-left.
  */
object AsOfJoin {

  /** Output: all left columns + `asof_<c>` for each payload column of
    * the latest right row at or before the left row's time (null when
    * none exists yet). */
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftOther = left.columns.toSeq.filterNot(_ == keyCol)

    // ONE nullable struct per right row, not per-column carries: with
    // per-column last(ignoreNulls) a null payload VALUE in the latest
    // right row would be skipped and back-filled from an older row,
    // stitching together columns of different rows.
    val payloadStruct = struct(payloadCols.map(col): _*)
    val lU = left.select(
      col(keyCol) +: col(leftTimeCol).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("_p") +:
        leftOther.map(col): _*)
    val rU = right.select(
      col(keyCol) +: col(rightTimeCol).as("_t") +: lit(0).as("_side") +:
        payloadStruct.as("_p") +:
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keyCol).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lU.unionByName(rU)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((keyCol +: leftOther).map(col) ++
        payloadCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
