package graft

import graft.pipeline.Multimodal

/** Real-codec coverage for the multimodal seam: PNGs generated
  * in-test decode to actual pixels through the SAME batched
  * mapPartitions path the stubbed kinds use — proving the seam
  * against a real codec, not just the stand-in (the JDK ships
  * javax.imageio, so kind=image needs no external dependency).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  test("decodeImage reads real PNG pixels into an exact luminance histogram") {
    // all-black: luma 0 -> all weight in bin 0
    val black = Multimodal.decodeImage(png(4, 4)((_, _) => 0x000000)).get
    assert(black(0) == 1.0 && black.drop(1).forall(_ == 0.0))
    // all-white: luma 255 -> last bin
    val white = Multimodal.decodeImage(png(4, 4)((_, _) => 0xFFFFFF)).get
    assert(white(Multimodal.HistBins - 1) == 1.0)
    // half black, half mid-gray 0x808080: integer luma 128 -> bin 8
    val mixed = Multimodal.decodeImage(png(4, 2)((x, _) => if (x < 2) 0x000000 else 0x808080)).get
    assert(mixed(0) == 0.5 && mixed(8) == 0.5)
    // bytes with no image header: no reader accepts them
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("committed PNG fixtures byte-match regeneration and decode to the analytic golden") {
    import graft.pipeline.PngFixtures
    val dir = java.nio.file.Paths.get(PngFixtures.fixtureDir)
    // drift guard: the committed bytes are exactly what the generator
    // writes (same JDK encoder) — a stale or corrupted fixture fails
    // here before it fails the driver gate
    PngFixtures.specs.foreach { case (_, name, w, h, rgb) =>
      val committed = java.nio.file.Files.readAllBytes(dir.resolve(s"$name.png"))
      assert(committed.sameElements(PngFixtures.pngBytes(w, h, rgb)),
        s"$name.png on disk differs from its deterministic regeneration")
    }
    // the mm_decode query output equals the on-paper golden: this is
    // the same compare the driver runs (but in-test, against the same
    // constants the oracle VALUES table carries)
    val got = PngFixtures.decodeQuery(spark)
      .orderBy("media_id", "feature_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == PngFixtures.golden,
      s"decode output diverged from the analytic golden: $got")
  }

  test("extractFeatures decodes real PNGs through the batched seam; non-images keep the stub") {
    val checker = png(8, 8)((x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val textBytes = "just some document text".getBytes("UTF-8")
    val media = Seq(
      Multimodal.Media(1L, "image", checker, 8, 8, checker.length.toLong),
      // an image-kind row whose payload is NOT decodable (the synthetic
      // mm_features table is all such rows): falls back to the stub
      Multimodal.Media(2L, "image", textBytes, 8, 8, textBytes.length.toLong),
      // audio has no JDK codec: stays on the stub even for PNG bytes
      Multimodal.Media(3L, "audio", checker, 8, 8, checker.length.toLong)
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    // checkerboard: half white (last bin), half black (bin 0)
    assert(feats(1L).features(0) == 0.5)
    assert(feats(1L).features(Multimodal.HistBins - 1) == 0.5)
    assert(feats(2L).features.toSeq == Multimodal.decodeStub(textBytes).toSeq)
    assert(feats(3L).features.toSeq == Multimodal.decodeStub(checker).toSeq)
    assert(feats.values.forall(_.features.length == Multimodal.HistBins))
  }
}
