package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Committed PNG fixtures + analytic luma-histogram goldens: the
  * driver-visible correctness row for the REAL `javax.imageio` decode
  * path (`mm_decode`).
  *
  * The synthetic `mm_features` payloads are text bytes, so every row
  * falls back to the deterministic stub — the real codec had no
  * driver-visible signal. DuckDB cannot decode PNG, so the oracle here
  * is a VALUES table of ANALYTIC expectations: each fixture pattern is
  * simple enough that its luminance histogram is derivable on paper
  * (black -> bin 0, white -> bin 15, checkerboard -> half/half, a
  * 17-step gray ramp -> uniform 1/16 per bin). Nothing in the golden
  * comes from running the codec — if `decodeImage` mis-decodes, rounds
  * luma differently, or silently falls back to the stub, the driver's
  * hash compare fails.
  *
  * The four PNGs under `fixtures/png/` are committed bytes; the
  * generator ([[writeAll]], driven by `graft.tools.GenPngFixtures`)
  * regenerates them deterministically and MultimodalSpec asserts the
  * committed files byte-match the regeneration, so fixture drift is
  * caught in-test.
  */
object PngFixtures {

  /** (media_id, name, width, height, rgb(x, y)). */
  val specs: Seq[(Long, String, Int, Int, (Int, Int) => Int)] = Seq(
    (1L, "1_black", 8, 8, (_, _) => 0x000000),
    (2L, "2_white", 8, 8, (_, _) => 0xFFFFFF),
    (3L, "3_checker", 8, 8, (x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000),
    // column x is gray 17x (0x111111 * x): luma = 17x exactly, so the
    // histogram bin is 17x*16/256 = x — one column per bin
    (4L, "4_ramp", 16, 4, (x, _) => 0x010101 * (17 * x))
  )

  def pngBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { bi.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  def writeAll(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    specs.foreach { case (_, name, w, h, rgb) =>
      java.nio.file.Files.write(dir.resolve(s"$name.png"), pngBytes(w, h, rgb))
    }
  }

  /** Analytic expected rows (media_id, feature_pos, feature_val) —
    * derived from the patterns, NOT from the codec. */
  val golden: Seq[(Long, Long, Double)] = {
    def hist(m: Map[Int, Double]) =
      (0 until Multimodal.HistBins).map(b => m.getOrElse(b, 0.0))
    val expect = Map(
      1L -> hist(Map(0 -> 1.0)),
      2L -> hist(Map(15 -> 1.0)),
      3L -> hist(Map(0 -> 0.5, 15 -> 0.5)),
      4L -> hist((0 until 16).map(b => b -> 0.0625).toMap))
    for {
      id <- expect.keys.toSeq.sorted
      (v, pos) <- expect(id).zipWithIndex
    } yield (id, pos.toLong, v)
  }

  /** Locate the committed fixture dir: cwd-relative first (the driver
    * runs from the repo root), then the absolute repo path. */
  def fixtureDir: String = {
    val rel = java.nio.file.Paths.get("fixtures", "png")
    if (java.nio.file.Files.isDirectory(rel)) rel.toAbsolutePath.toString
    else "/root/repo/fixtures/png"
  }

  /** The mm_decode query: read the committed PNGs as a binary column
    * and push them through the SAME batched mapPartitions seam
    * mm_features uses — but with NO stub fallback: an undecodable
    * payload yields an empty feature array, which produces zero rows
    * for that media_id and fails the driver's row-count compare. */
  def decodeQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .load(fixtureDir + "/*.png")
      .select(
        regexp_extract(col("path"), "(\\d+)_[a-z]+\\.png$", 1).cast("long").as("media_id"),
        col("content"))
      .as[(Long, Array[Byte])]
    files.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) =>
        (id, Multimodal.decodeImage(bytes).getOrElse(Array.empty[Double]))
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

  /** Analytic aHash goldens, derived from the patterns on paper (see
    * [[Multimodal.aHash64]] — every step is integer arithmetic):
    *  - black / white: flat image → every block equals the mean →
    *    strict `>` gives the all-zero hash (the documented aHash
    *    degeneracy on flat inputs);
    *  - checker: mean = (32·255) div 64 = 127; white cells (x+y even)
    *    exceed it → rows alternate 10101010 / 01010101 = aa / 55;
    *  - ramp 16×4 → 8×8: block (tx, ·) averages luma 17·(2tx) and
    *    17·(2tx+1) → 34·tx + 8; mean = 8128 div 64 = 127; only
    *    tx >= 4 exceeds it → each row 00001111 = 0f. */
  val phashGolden: Seq[(Long, String)] = Seq(
    (1L, "0000000000000000"),
    (2L, "0000000000000000"),
    (3L, "aa55aa55aa55aa55"),
    (4L, "0f0f0f0f0f0f0f0f"))

  /** The mm_phash query: committed PNGs → real decode → exact-integer
    * aHash. Same batched seam and no-fallback stance as
    * [[decodeQuery]] — an undecodable payload drops its row and fails
    * the driver's row-count compare. */
  def phashQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(fixtureDir + "/*.png")
      .select(
        regexp_extract(col("path"), "(\\d+)_[a-z]+\\.png$", 1).cast("long").as("media_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          Multimodal.aHash64(bytes).map(h => (id, h))
        }
      }
      .toDF("media_id", "phash")
  }

  def phashGoldenSql: String = {
    val rows = phashGolden.map { case (id, h) =>
      s"(CAST($id AS BIGINT), '$h')"
    }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows) AS t(media_id, phash)
       |ORDER BY media_id""".stripMargin
  }
}
