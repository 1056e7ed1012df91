package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Committed Y4M fixtures + analytic luma goldens: the driver-visible
  * correctness rows for the REAL video decode path (`mm_video`,
  * `mm_video_frames`) — the video member of the
  * [[PngFixtures]]/[[WavFixtures]] family, closing the last decode
  * stub (round 12).
  *
  * DuckDB cannot decode Y4M, so the oracles are VALUES tables of
  * ANALYTIC expectations: each fixture's luma pattern makes its
  * pooled histogram and per-frame means derivable on paper —
  * constant gray 128 puts all weight in bin 128·16/256 = 8; the
  * half-black/half-white frame splits bins 0 and 15 evenly; the
  * 16×16 ramp frame hits every luma 0..255 once (uniform 1/16 per
  * bin); the 4-frame fade (Y = 32, 96, 160, 224) pools to bins
  * 2/6/10/14 at ¼ each and its per-frame means ARE those constants.
  * Nothing in the goldens comes from running the parser — a
  * mis-parsed header, a chroma-plane offset slip, a wrong bin edge,
  * or a silent stub fallback fails the driver's hash compare.
  *
  * The Y4M bytes are hand-assembled (ASCII `YUV4MPEG2 W.. H.. ..\n`
  * header + per frame `FRAME\n` and raw planar YUV, chroma constant
  * 128) so regeneration is byte-deterministic with no encoder in the
  * loop; MultimodalSpec asserts the committed files byte-match the
  * regeneration AND that [[Multimodal.decodeY4m]] round-trips them.
  */
object Y4mFixtures {

  /** (media_id, name, width, height, frames as luma(x, y, frameNo)). */
  val specs: Seq[(Long, String, Int, Int, Int, (Int, Int, Int) => Int)] = Seq(
    // 2 frames of constant mid-gray: every pixel luma 128 -> bin 8
    (1L, "1_gray", 8, 8, 2, (_, _, _) => 128),
    // 2 frames half black / half white: bins 0 and 15, 0.5 each
    (2L, "2_bw", 8, 8, 2, (_, y, _) => if (y < 4) 0 else 255),
    // one 16x16 ramp frame: luma = 16*row + col covers 0..255 once
    (3L, "3_ramp", 16, 16, 1, (x, y, _) => 16 * y + x),
    // 4-frame fade: constant 32 + 64*frame = 32, 96, 160, 224
    (4L, "4_fade", 8, 8, 4, (_, _, f) => 32 + 64 * f))

  /** Hand-assembled YUV4MPEG2 bytes: C420jpeg, chroma planes constant
    * 128 (gray — luma features never read them). Pure function of the
    * spec, no encoder involved. */
  def y4mBytes(w: Int, h: Int, nFrames: Int, luma: (Int, Int, Int) => Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dimensions")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val chroma = Array.fill((w / 2) * (h / 2) * 2)(128.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    (0 until nFrames).foreach { f =>
      out.write(frameMark)
      val y = new Array[Byte](w * h)
      var i = 0
      while (i < y.length) { y(i) = luma(i % w, i / w, f).toByte; i += 1 }
      out.write(y)
      out.write(chroma)
    }
    out.toByteArray
  }

  def writeAll(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    specs.foreach { case (_, name, w, h, n, luma) =>
      java.nio.file.Files.write(dir.resolve(s"$name.y4m"), y4mBytes(w, h, n, luma))
    }
  }

  /** Analytic pooled-histogram rows (media_id, feature_pos,
    * feature_val) — from the luma patterns, NOT from the parser. */
  val golden: Seq[(Long, Long, Double)] = {
    def hist(m: Map[Int, Double]) =
      (0 until Multimodal.HistBins).map(b => m.getOrElse(b, 0.0))
    val expect = Map(
      1L -> hist(Map(8 -> 1.0)),
      2L -> hist(Map(0 -> 0.5, 15 -> 0.5)),
      3L -> hist((0 until 16).map(b => b -> 0.0625).toMap),
      // fade: 32->bin 2, 96->6, 160->10, 224->14, each 1 of 4 frames
      4L -> hist(Map(2 -> 0.25, 6 -> 0.25, 10 -> 0.25, 14 -> 0.25)))
    for {
      id <- expect.keys.toSeq.sorted
      (v, pos) <- expect(id).zipWithIndex
    } yield (id, pos.toLong, v)
  }

  /** Analytic per-frame mean-luma rows (media_id, frame_no,
    * mean_luma): constants for the constant frames; the bw frame's
    * integer mean is (32·0 + 32·255) div 64 = 127, the ramp's is
    * 32640 div 256 = 127. */
  val frameGolden: Seq[(Long, Long, Long)] = Seq(
    (1L, 0L, 128L), (1L, 1L, 128L),
    (2L, 0L, 127L), (2L, 1L, 127L),
    (3L, 0L, 127L),
    (4L, 0L, 32L), (4L, 1L, 96L), (4L, 2L, 160L), (4L, 3L, 224L))

  /** Locate the committed fixture dir: cwd-relative first (the driver
    * runs from the repo root), then the absolute repo path. */
  def fixtureDir: String = {
    val rel = java.nio.file.Paths.get("fixtures", "y4m")
    if (java.nio.file.Files.isDirectory(rel)) rel.toAbsolutePath.toString
    else "/root/repo/fixtures/y4m"
  }

  private def fixtureFiles(spark: SparkSession) = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(fixtureDir + "/*.y4m")
      .select(
        regexp_extract(col("path"), "(\\d+)_[a-z]+\\.y4m$", 1).cast("long").as("media_id"),
        col("content"))
      .as[(Long, Array[Byte])]
  }

  /** The mm_video query: committed Y4Ms as a binary column through the
    * SAME batched mapPartitions seam mm_features uses — with NO stub
    * fallback: an unparseable payload yields zero rows for its
    * media_id and fails the driver's row-count compare. */
  def decodeQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtureFiles(spark).mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        (id, Multimodal.decodeVideo(bytes).getOrElse(Array.empty[Double]))
      }
    }
      .toDF("media_id", "features")
      .select(col("media_id"), posexplode(col("features")).as(Seq("feature_pos", "feature_val")))
      .select(col("media_id"),
        col("feature_pos").cast("long").as("feature_pos"),
        round(col("feature_val"), 6).as("feature_val"))
  }

  /** DuckDB oracle: the analytic pooled-histogram golden as VALUES. */
  def goldenSql: String = {
    val rows = golden.map { case (id, pos, v) =>
      s"(CAST($id AS BIGINT), CAST($pos AS BIGINT), CAST($v AS DOUBLE))"
    }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows) AS t(media_id, feature_pos, feature_val)
       |ORDER BY media_id, feature_pos""".stripMargin
  }

  /** The mm_video_frames query: per-frame integer mean luma — the
    * temporal frame-sampling shape (explode per frame) over the real
    * parse. Same no-fallback stance as [[decodeQuery]]. */
  def framesQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtureFiles(spark).mapPartitions { rows =>
      rows.flatMap { case (id, bytes) =>
        Multimodal.videoFrameMeans(bytes).getOrElse(Seq.empty)
          .map { case (f, m) => (id, f.toLong, m) }
      }
    }
      .toDF("media_id", "frame_no", "mean_luma")
  }

  def framesGoldenSql: String = {
    val rows = frameGolden.map { case (id, f, m) =>
      s"(CAST($id AS BIGINT), CAST($f AS BIGINT), CAST($m AS BIGINT))"
    }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows) AS t(media_id, frame_no, mean_luma)
       |ORDER BY media_id, frame_no""".stripMargin
  }
}
