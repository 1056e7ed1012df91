package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Committed WAV fixtures + analytic amplitude-histogram goldens: the
  * driver-visible correctness row for the REAL `javax.sound.sampled`
  * decode path (`mm_audio`) — the audio twin of [[PngFixtures]].
  *
  * DuckDB cannot decode WAV, so the oracle is a VALUES table of
  * ANALYTIC expectations: each fixture's sample pattern makes its
  * amplitude histogram derivable on paper (silence -> all weight in
  * the zero bin 8, a full-scale square wave -> half in bin 0 / half in
  * bin 15, a half-scale square -> bins 4 and 12, a 16-step ramp ->
  * uniform 1/16 per bin). Nothing in the golden comes from running the
  * codec — if `decodeAudio` mis-parses the container, flips
  * endianness, bins amplitudes differently, or silently falls back to
  * the stub, the driver's hash compare fails.
  *
  * The WAV bytes are hand-assembled (44-byte canonical PCM RIFF header
  * + little-endian samples) so regeneration is byte-deterministic with
  * no encoder in the loop; MultimodalSpec asserts the committed files
  * byte-match the regeneration AND that the JDK codec round-trips
  * them, so fixture drift is caught in-test.
  */
object WavFixtures {

  /** (media_id, name, 16-bit signed samples). */
  val specs: Seq[(Long, String, Seq[Int])] = Seq(
    // all-zero samples: amplitude 0 -> bin (0+32768)*16/65536 = 8
    (1L, "1_silence", Seq.fill(256)(0)),
    // full-scale square wave: +32767 -> bin 15, -32768 -> bin 0
    (2L, "2_square", (0 until 256).map(i => if (i % 2 == 0) 32767 else -32768)),
    // half-scale square: +16384 -> bin 12, -16384 -> bin 4
    (3L, "3_halfsq", (0 until 256).map(i => if (i % 2 == 0) 16384 else -16384)),
    // 4096-step ramp s = 16i - 32768: bin = i / 256 — exactly 256
    // samples per bin, uniform 1/16
    (4L, "4_ramp", (0 until 4096).map(i => 16 * i - 32768)))

  /** Canonical 44-byte PCM WAV: mono, 16-bit, 8 kHz, little-endian.
    * Hand-assembled so the bytes are a pure function of the samples. */
  def wavBytes(samples: Seq[Int]): Array[Byte] = {
    val dataSize = samples.size * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(16000) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  def writeAll(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    specs.foreach { case (_, name, samples) =>
      java.nio.file.Files.write(dir.resolve(s"$name.wav"), wavBytes(samples))
    }
  }

  /** Analytic expected rows (media_id, feature_pos, feature_val) —
    * derived from the sample patterns, NOT from the codec. */
  val golden: Seq[(Long, Long, Double)] = {
    def hist(m: Map[Int, Double]) =
      (0 until Multimodal.HistBins).map(b => m.getOrElse(b, 0.0))
    val expect = Map(
      1L -> hist(Map(8 -> 1.0)),
      2L -> hist(Map(0 -> 0.5, 15 -> 0.5)),
      3L -> hist(Map(4 -> 0.5, 12 -> 0.5)),
      4L -> hist((0 until 16).map(b => b -> 0.0625).toMap))
    for {
      id <- expect.keys.toSeq.sorted
      (v, pos) <- expect(id).zipWithIndex
    } yield (id, pos.toLong, v)
  }

  /** Locate the committed fixture dir: cwd-relative first (the driver
    * runs from the repo root), then the absolute repo path. */
  def fixtureDir: String = {
    val rel = java.nio.file.Paths.get("fixtures", "wav")
    if (java.nio.file.Files.isDirectory(rel)) rel.toAbsolutePath.toString
    else "/root/repo/fixtures/wav"
  }

  /** The mm_audio query: read the committed WAVs as a binary column
    * and push them through the SAME batched mapPartitions seam
    * mm_features uses — but with NO stub fallback: an undecodable
    * payload yields an empty feature array, which produces zero rows
    * for that media_id and fails the driver's row-count compare. */
  def decodeQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .load(fixtureDir + "/*.wav")
      .select(
        regexp_extract(col("path"), "(\\d+)_[a-z]+\\.wav$", 1).cast("long").as("media_id"),
        col("content"))
      .as[(Long, Array[Byte])]
    files.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        (id, Multimodal.decodeAudio(bytes).getOrElse(Array.empty[Double]))
      }
    }
      .toDF("media_id", "features")
      .select(col("media_id"), posexplode(col("features")).as(Seq("feature_pos", "feature_val")))
      .select(col("media_id"),
        col("feature_pos").cast("long").as("feature_pos"),
        round(col("feature_val"), 6).as("feature_val"))
  }

  /** DuckDB oracle: the analytic golden as a VALUES table. */
  def goldenSql: String = {
    val rows = golden.map { case (id, pos, v) =>
      s"(CAST($id AS BIGINT), CAST($pos AS BIGINT), CAST($v AS DOUBLE))"
    }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows) AS t(media_id, feature_pos, feature_val)
       |ORDER BY media_id, feature_pos""".stripMargin
  }

  /** Analytic audio-fingerprint goldens ([[Multimodal.audioHash64]] on
    * paper): constant-envelope fixtures — silence, and both square
    * waves whose 4-sample frame means are sum −2 div 4 = 0 — read the
    * all-zero hash (the aHash flat-input degeneracy, audio edition);
    * the 4096-sample ramp's 64 frame means rise strictly (1024f + 504
    * − 32768), so bits 0..62 set = fffffffffffffffe. */
  val aphashGolden: Seq[(Long, String)] = Seq(
    (1L, "0000000000000000"),
    (2L, "0000000000000000"),
    (3L, "0000000000000000"),
    (4L, "fffffffffffffffe"))

  /** The mm_aphash query: committed WAVs → real decode → exact-integer
    * envelope fingerprint. Same no-fallback stance as [[decodeQuery]]. */
  def aphashQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(fixtureDir + "/*.wav")
      .select(
        regexp_extract(col("path"), "(\\d+)_[a-z]+\\.wav$", 1).cast("long").as("media_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          Multimodal.audioHash64(bytes).map(h => (id, h))
        }
      }
      .toDF("media_id", "aphash")
  }

  def aphashGoldenSql: String = {
    val rows = aphashGolden.map { case (id, h) =>
      s"(CAST($id AS BIGINT), '$h')"
    }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows) AS t(media_id, aphash)
       |ORDER BY media_id""".stripMargin
  }
}
