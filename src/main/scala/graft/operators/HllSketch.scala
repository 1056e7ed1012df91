package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) with the
  * linear-counting small-range correction — built from portable md5
  * arithmetic so the register table is BIT-EXACT on any engine.
  *
  * Why this is the 100 TB count-distinct: exact COUNT(DISTINCT key)
  * shuffles every distinct key; the HLL register table is a FIXED
  * 2^p rows per group (p=8 here -> 256), built by one
  * partial-aggregating shuffle (max is a monoid, so map-side combine
  * collapses each input partition to <=256 rows per group before any
  * network), and registers MERGE by element-wise max — the property
  * that lets 1000 executors sketch locally and fold, lets daily
  * sketches roll up to monthly, and slots a sketch column into the
  * [[IncrementalAgg]] partial. Standard error ~1.04/sqrt(256) ~ 6.5%.
  *
  * Determinism: the hash is the repo's portable 48-bit md5 slice
  * (conv(substring(md5(k),1,12),16,10) — exact in BIGINT on both
  * engines); bucket = top 8 bits, rank = leading-zero count of the
  * remaining 40 bits + 1 via `41 - bitlength(w)` where bitlength is
  * length(ltrim(bin(w),'0')) — integer-exact, order-independent. The
  * estimate is IEEE double arithmetic over two already-exact integers
  * (S = sum 2^(50-reg), V = zero-register count) written in the same
  * association order on both engines, quantized round(.,6) before the
  * floor to absorb libm ln() last-ulp differences.
  */
object HllSketch {
  val P = 8
  val M: Int = 1 << P // 256 registers
  private val W = 40 // rank bits below the bucket prefix
  private val Shift = 50 // 2^(50-reg): reg <= 41 so terms stay integral; 256*2^50 < 2^63

  private def h48(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-row (groupCol, bucket, rank) — the codegen'd hash/split/rank
    * arithmetic, exposed separately so the streaming register state
    * can fold the same rows the batch aggregate does. */
  def hashed(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.select(col(groupCol), h48(col(keyCol)).as("h"))
      .select(col(groupCol),
        expr(s"h div ${1L << W}").as("bucket"),
        (col("h") % (1L << W)).as("w"))
      .select(col(groupCol), col("bucket"),
        expr(s"cast(${W + 1} - length(trim(LEADING '0' FROM bin(w))) as bigint)").as("rank"))

  /** Dense per-group register table: (groupCol, bucket 0..M-1, reg),
    * untouched buckets zero-filled so merges and estimates never
    * special-case absence. Output is |groups| x 256 rows.
    */
  def registers(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val hit = hashed(df, groupCol, keyCol)
      .groupBy(groupCol, "bucket").agg(max("rank").as("reg"))
    val grid = df.select(col(groupCol)).distinct()
      .crossJoin(broadcast(df.sparkSession.range(M).select(col("id").as("bucket"))))
    grid.join(hit, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), col("bucket"),
        coalesce(col("reg"), lit(0L)).as("reg"))
  }

  /** Append the bias-corrected `n_est` to any frame carrying the two
    * exact-integer sketch summaries (v_zero, s_scaled) — shared by the
    * batch estimate and the streaming register-state drain, so the
    * double arithmetic exists in exactly ONE association order. */
  def estimateFromCounts(counts: DataFrame): DataFrame = {
    val alphaM2TwoK = // alpha_256 * m^2 * 2^50, association order mirrored in the oracle
      lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) * lit(1125899906842624.0)
    counts
      .withColumn("est_raw", alphaM2TwoK / col("s_scaled"))
      .withColumn("n_est",
        floor(round(
          when(col("est_raw") <= lit(2.5 * M) && col("v_zero") > 0,
            lit(256.0) * log(lit(256.0) / col("v_zero")))
            .otherwise(col("est_raw")), 6)).cast("long"))
      .drop("est_raw")
  }

  /** Per-register contribution to s_scaled — the same 2^(50-reg) the
    * SQL side shifts; exposed for the streaming state fold. */
  def sTerm(reg: Int): Long = 1L << (Shift - reg)

  /** Estimate per group from a dense register table: v_zero and
    * s_scaled are the exact-integer gate columns; n_est applies the
    * standard bias-corrected formula with linear counting below
    * 2.5m when empty registers remain.
    */
  def estimate(regs: DataFrame, groupCol: String): DataFrame =
    estimateFromCounts(
      regs.groupBy(groupCol)
        .agg(
          sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_zero"),
          sum(expr(s"shiftleft(cast(1 as bigint), cast($Shift - reg as int))")).as("s_scaled")))
      .select(col(groupCol), col("v_zero"), col("s_scaled"), col("n_est"))
}
