package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates — the
  * don't-rescan-the-lake lever: a standing rollup is kept as a PARTIAL
  * table (count / sum / min / max per group, all mergeable monoids),
  * and each arriving batch contributes its own partial; the served
  * view is the MERGE of partials, never a recompute over history.
  *
  * Algebra: partial(a ∪ b) == merge(partial(a), partial(b)) because
  * count and sum add, min and max combine, and avg is DERIVED
  * (sum/count) at finalize time — the classic reason avg must never be
  * stored in the partial. At 100 TB the standing partial has
  * |groups| rows (here days × types), so merging a day's delta costs
  * O(|delta| + |groups|) instead of O(|history|): the delta is scanned
  * once, partial-aggregated map-side, and one |groups|-sized shuffle
  * folds it in. Non-distributive measures (exact distinct, medians)
  * need a sketch partial instead — the HLL registers in
  * [[graft.apps.RelationalQueries]] ev_hll are the same pattern with
  * max-of-registers as the monoid.
  */
object IncrementalAgg {

  /** The mergeable partial: per (day, event_type) count, cent-exact
    * sum, min, max. Integer cents throughout — merging must be
    * bit-exact no matter how many times the partial was folded.
    */
  def partial(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    events
      .select(to_date(graft.Tables.eventTime(events)).as("day"),
        col("event_type"), cents.as("cents"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
  }

  /** Fold any number of partials into one — each measure by its monoid. */
  def merge(partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy("day", "event_type")
      .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"),
        min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))

  /** The served view: merged partial + derived measures. */
  def finalizeView(merged: DataFrame): DataFrame =
    merged.withColumn("avg_cents", expr("sum_cents div n"))
}
