package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram sketch — the QUANTILE partial that
  * completes the incremental-maintenance trio: counts/sums merge by
  * addition ([[IncrementalAgg]]), distincts by register max
  * ([[HllSketch]]), and quantiles by BIN-COUNT addition here. Exact
  * percentiles need the full value multiset (ev_percentiles walks a
  * distributed CDF); the histogram keeps a FIXED `Bins` rows per
  * group, so 1000 executors sketch locally and vector-add, daily
  * partials roll up to monthly, and a quantile serve reads
  * |groups| × 256 rows however large history grows. Error is bounded
  * by the bin width: a served quantile is its bin's lower cent edge
  * (audited in basis points by ev_hist_err).
  *
  * Everything is exact integer arithmetic on both engines: bin =
  * (v - lo) * Bins div (hi - lo + 1) over the data-driven [lo, hi]
  * cent range (one 1-row aggregate — the replaySalted range-probe
  * pattern; at 100 TB the range comes from the standing table's
  * stats), merge is sum, and the served quantile is the standard
  * smallest-bin-whose-cumulative-share-reaches-q rule. No doubles
  * anywhere.
  */
object HistogramSketch {
  val Bins = 256

  /** Cent-range probe: one bounded 1-row aggregate. */
  def centsRange(cents: DataFrame): (Long, Long) = {
    val r = cents.agg(min("cents"), max("cents")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The mergeable partial: per (group, bin) row counts over the
    * FIXED [lo, hi] range every partial must share. Input needs a
    * `cents` column next to `groupCol`. Values outside [lo, hi]
    * SATURATE into the edge bins (greatest/least clamp) instead of
    * producing out-of-range bins that would silently corrupt the
    * cumulative shares when a later delta drifts past the standing
    * range — saturation keeps every share correct and costs only
    * edge-bin precision, the documented price of a fixed range. */
  def partial(df: DataFrame, groupCol: String, lo: Long, hi: Long): DataFrame =
    df.select(col(groupCol),
        expr(s"greatest(0, least(${Bins - 1}, (cents - $lo) * ${Bins} div ${hi - lo + 1}))").as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("n"))

  /** Fold partials: vector addition on (group, bin). */
  def merge(groupCol: String, partials: Seq[DataFrame]): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy(groupCol, "bin").agg(sum("n").as("n"))

  /** Serve p50/p90/p99 from a merged histogram: per group, the lower
    * cent edge of the smallest bin whose cumulative count reaches the
    * quantile share — one window pass over |groups| × Bins rows. */
  def quantiles(hist: DataFrame, groupCol: String, lo: Long, hi: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("bin")
    val width = hi - lo + 1
    val cum = hist
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    def pick(q: Int) =
      min(when(col("cum") * 100 >= col("total") * q,
        expr(s"$lo + (bin * $width) div ${Bins}"))).as(s"p$q")
    cum.groupBy(groupCol).agg(pick(50), pick(90), pick(99))
  }
}
