package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-codec integration row (mm_features_real): ONE media table
  * assembled from all three committed fixture sets — PNG (image),
  * WAV (audio), Y4M (video) — pushed through the PRODUCTION seam,
  * [[Multimodal.extractFeatures]], in a single pass: one
  * mapPartitions, per-partition codec init, the kind dispatch and the
  * stub fallback wiring all under the gate at once (the per-codec
  * rows mm_decode / mm_audio / mm_video each exercise one branch
  * through their own query paths; this row proves the DISPATCH).
  *
  * Oracle: the union of the three fixture sets' ANALYTIC goldens
  * (id-offset per kind so the domains can't collide). The stub
  * fallback cannot silently pass — a stub byte-histogram of an
  * encoded container differs from the analytic pixel/sample/luma
  * histograms in every fixture. */
object MediaFixtures {

  /** (kind, fixture dir, glob suffix, id offset). Offsets keep the
    * three 1..4 id spaces disjoint in the combined table. */
  private val sets = Seq(
    ("image", () => PngFixtures.fixtureDir, "png", 100L),
    ("audio", () => WavFixtures.fixtureDir, "wav", 200L),
    ("video", () => Y4mFixtures.fixtureDir, "y4m", 300L))

  /** The combined media table: every committed fixture as a Media row
    * (width/height/n_bytes from the payload — the decoders never read
    * the metadata columns, which is itself part of the contract). */
  def mediaTable(spark: SparkSession): org.apache.spark.sql.Dataset[Multimodal.Media] = {
    import spark.implicits._
    sets.map { case (kind, dir, ext, off) =>
      spark.read.format("binaryFile")
        .load(dir() + s"/*.$ext")
        .select(
          (regexp_extract(col("path"), s"(\\d+)_[a-z]+\\.$ext$$", 1).cast("long") + off)
            .as("media_id"),
          lit(kind).as("kind"),
          col("content").as("payload"),
          lit(0).as("width"), lit(0).as("height"),
          octet_length(col("content")).cast("long").as("n_bytes"))
    }.reduce(_ unionByName _).as[Multimodal.Media]
  }

  /** The mm_features_real query: the combined table through
    * extractFeatures, exploded to scalar rows. */
  def featuresQuery(spark: SparkSession): DataFrame =
    Multimodal.extractFeatures(mediaTable(spark)).toDF()
      .select(col("media_id"), col("kind"),
        posexplode(col("features")).as(Seq("feature_pos", "feature_val")))
      .select(col("media_id"), col("kind"),
        col("feature_pos").cast("long").as("feature_pos"),
        round(col("feature_val"), 6).as("feature_val"))

  /** DuckDB oracle: the three analytic goldens, id-offset, as VALUES. */
  def goldenSql: String = {
    val rows =
      PngFixtures.golden.map { case (id, p, v) => (id + 100L, "image", p, v) } ++
      WavFixtures.golden.map { case (id, p, v) => (id + 200L, "audio", p, v) } ++
      Y4mFixtures.golden.map { case (id, p, v) => (id + 300L, "video", p, v) }
    val values = rows.map { case (id, k, p, v) =>
      s"(CAST($id AS BIGINT), '$k', CAST($p AS BIGINT), CAST($v AS DOUBLE))"
    }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $values) AS t(media_id, kind, feature_pos, feature_val)
       |ORDER BY media_id, feature_pos""".stripMargin
  }
}
