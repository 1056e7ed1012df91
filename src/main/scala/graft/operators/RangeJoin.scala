package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketized) RANGE JOIN: rows with equal `key` whose times
  * differ by at most `windowUs`, expressed as an EQUI-join.
  *
  * A raw `|t_r − t_l| <= w` predicate has no equality Catalyst can
  * hash on, so Spark plans it as BroadcastNestedLoopJoin or a
  * cartesian product — O(n·m) per key and a scale-killer the moment
  * either side grows. The banding trick restores an equi-join:
  * bucket = t div w, and any in-window pair sits in the same or an
  * adjacent bucket, so the left side joins on its own bucket while
  * the right side is expanded to (b−1, b, b+1) — a bounded ×3 map —
  * and the exact |Δt| <= w filter runs after the hash join. Each
  * candidate pair meets exactly once (one left bucket vs three
  * distinct right buckets), so no dedup pass is needed.
  *
  * This is the two-sided sibling of [[AsOfJoin]] (carry-forward
  * union) and the batch analog of Structured Streaming's
  * watermark-bounded interval join. Time columns are µs-since-epoch
  * longs; callers rename away collisions before joining.
  */
object RangeJoin {

  /** bucket = t div w as COLUMN arithmetic (not a string-interpolated
    * expr, which breaks on column names needing backticks): decimal
    * division + long cast truncates toward zero exactly like Spark's
    * `div`, and every bucket interval is >= w wide (the zero-straddling
    * bucket is 2w−1), so |Δt| <= w still lands same-or-adjacent. */
  private def bucketOf(t: org.apache.spark.sql.Column, windowUs: Long) =
    (t.cast("decimal(25,0)") / windowUs).cast("long")

  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    // __bucket is an internal plumbing column; silently overwriting a
    // caller's column of that name would corrupt their data
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "inputs must not already carry a __bucket column")
    val l = left.withColumn("__bucket", bucketOf(col(leftTime), windowUs))
    val r = right
      .withColumn("__delta", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", bucketOf(col(rightTime), windowUs) + col("__delta"))
      .drop("__delta")
    l.join(r, Seq(key, "__bucket"))
      .filter(abs(col(rightTime) - col(leftTime)) <= windowUs)
      .drop("__bucket")
  }
}
