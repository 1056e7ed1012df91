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
    val wav = graft.pipeline.WavFixtures.wavBytes(Seq.fill(64)(0))
    val media = Seq(
      Multimodal.Media(1L, "image", checker, 8, 8, checker.length.toLong),
      // an image-kind row whose payload is NOT decodable (the synthetic
      // mm_features table is all such rows): falls back to the stub
      Multimodal.Media(2L, "image", textBytes, 8, 8, textBytes.length.toLong),
      // audio-kind with PNG bytes: not a parseable audio container ->
      // honest stub fallback
      Multimodal.Media(3L, "audio", checker, 8, 8, checker.length.toLong),
      // audio-kind with real WAV bytes: the JDK codec decodes it —
      // silence puts all weight in the zero-amplitude bin
      Multimodal.Media(4L, "audio", wav, 0, 0, wav.length.toLong)
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    // checkerboard: half white (last bin), half black (bin 0)
    assert(feats(1L).features(0) == 0.5)
    assert(feats(1L).features(Multimodal.HistBins - 1) == 0.5)
    assert(feats(2L).features.toSeq == Multimodal.decodeStub(textBytes).toSeq)
    assert(feats(3L).features.toSeq == Multimodal.decodeStub(checker).toSeq)
    assert(feats(4L).features(8) == 1.0)
    assert(feats.values.forall(_.features.length == Multimodal.HistBins))
  }

  test("decodeAudio reads real WAV samples into an exact amplitude histogram") {
    import graft.pipeline.WavFixtures
    // full-scale square: half +32767 (bin 15), half -32768 (bin 0)
    val sq = Multimodal.decodeAudio(
      WavFixtures.wavBytes((0 until 100).map(i => if (i % 2 == 0) 32767 else -32768))).get
    assert(sq(0) == 0.5 && sq(15) == 0.5 && sq.sum == 1.0)
    // mid-amplitude constants land in interior bins: +16384 -> 12
    val mid = Multimodal.decodeAudio(WavFixtures.wavBytes(Seq.fill(10)(16384))).get
    assert(mid(12) == 1.0)
    // bytes with no audio container: None (stub fallback upstream)
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    // a truncated header: None, not a crash
    assert(Multimodal.decodeAudio(WavFixtures.wavBytes(Seq(0, 0)).take(20)).isEmpty)
  }

  test("decodeAudio handles big-endian containers: AIFF of the same samples matches the WAV histogram") {
    import graft.pipeline.WavFixtures
    val samples = (0 until 100).map(i => if (i % 2 == 0) 16384 else -16384)
    // encode the same PCM through the JDK's AIFF writer (big-endian)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val bytes = new Array[Byte](samples.size * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s >> 8).toByte; bytes(2 * i + 1) = s.toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.size.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val aiff = Multimodal.decodeAudio(bos.toByteArray).get
    val wav = Multimodal.decodeAudio(WavFixtures.wavBytes(samples)).get
    assert(aiff.toSeq == wav.toSeq)
    assert(aiff(4) == 0.5 && aiff(12) == 0.5)
  }

  test("committed WAV fixtures byte-match regeneration and decode to the analytic golden") {
    import graft.pipeline.WavFixtures
    val dir = java.nio.file.Paths.get(WavFixtures.fixtureDir)
    // drift guard: the committed bytes are exactly what the generator
    // writes (hand-assembled RIFF, no encoder in the loop)
    WavFixtures.specs.foreach { case (_, name, samples) =>
      val committed = java.nio.file.Files.readAllBytes(dir.resolve(s"$name.wav"))
      assert(committed.sameElements(WavFixtures.wavBytes(samples)),
        s"$name.wav on disk differs from its deterministic regeneration")
    }
    // the mm_audio query output equals the on-paper golden — the same
    // compare the driver runs against the oracle VALUES table
    val got = WavFixtures.decodeQuery(spark)
      .orderBy("media_id", "feature_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == WavFixtures.golden,
      s"audio decode output diverged from the analytic golden: $got")
  }

  test("audioHash64 matches the on-paper goldens; gain changes move no bits") {
    import graft.pipeline.{Multimodal, WavFixtures}
    WavFixtures.specs.foreach { case (id, _, samples) =>
      val got = Multimodal.audioHash64(WavFixtures.wavBytes(samples)).get
      val want = WavFixtures.aphashGolden.find(_._1 == id).get._2
      assert(got == want, s"fixture $id: got $got, expected $want")
    }
    // envelope robustness: halving the gain scales every frame mean
    // together, so the sign-of-derivative hash is identical — while a
    // time-reversed ramp flips every bit of the envelope
    def hash(samples: Seq[Int]): Long =
      java.lang.Long.parseUnsignedLong(
        Multimodal.audioHash64(WavFixtures.wavBytes(samples)).get, 16)
    val wob = (0 until 1024).map(i => (math.sin(i / 40.0) * 20000).toInt)
    // integer truncation can flip a +-1 frame delta at an envelope
    // peak, so "identical" is asserted up to a couple of bits
    assert(java.lang.Long.bitCount(hash(wob) ^ hash(wob.map(_ / 2))) <= 2,
      "gain change must move at most truncation-tie bits")
    val ramp = (0 until 4096).map(i => 16 * i - 32768)
    val rev = ramp.reverse
    assert(java.lang.Long.bitCount(hash(ramp) ^ hash(rev)) == 63,
      "time reversal must flip the whole envelope")
  }

  test("aHash matches the on-paper goldens; one flipped pixel moves few bits") {
    import graft.pipeline.{Multimodal, PngFixtures}
    // committed fixtures decode to exactly the analytic hashes
    val byId = PngFixtures.phashQuery(spark)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    PngFixtures.phashGolden.foreach { case (id, h) =>
      assert(byId(id) == h, s"fixture $id: got ${byId(id)}, expected $h")
    }
    // near-dup robustness: flipping ONE checker pixel changes at most
    // a couple of hash bits (the property banding relies on), while
    // checker vs ramp stay far apart
    def hashOf(w: Int, h: Int, rgb: (Int, Int) => Int): Long =
      java.lang.Long.parseUnsignedLong(
        Multimodal.aHash64(PngFixtures.pngBytes(w, h, rgb)).get, 16)
    val checker = hashOf(8, 8, (x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val flipped = hashOf(8, 8, (x, y) =>
      if ((x, y) == ((3, 3)) ) 0x000000
      else if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val ramp = hashOf(16, 4, (x, _) => 0x010101 * (17 * x))
    assert(java.lang.Long.bitCount(checker ^ flipped) <= 2,
      f"near-dup moved too many bits: ${checker ^ flipped}%016x")
    assert(java.lang.Long.bitCount(checker ^ ramp) >= 16,
      f"unrelated images too close: ${checker ^ ramp}%016x")
  }

  test("decodeY4m parses hand-assembled YUV4MPEG2 frames exactly; malformed bytes are None") {
    import graft.pipeline.Y4mFixtures
    // round-trip: every fixture parses back to its spec's dimensions,
    // frame count, and EXACT luma bytes
    Y4mFixtures.specs.foreach { case (_, name, w, h, n, luma) =>
      val (pw, ph, frames) = Multimodal.decodeY4m(Y4mFixtures.y4mBytes(w, h, n, luma)).get
      assert((pw, ph, frames.length) == ((w, h, n)), s"$name: wrong geometry")
      frames.zipWithIndex.foreach { case (f, fn) =>
        (0 until w * h).foreach { i =>
          assert((f(i) & 0xff) == luma(i % w, i / w, fn),
            s"$name frame $fn pixel $i mismatch")
        }
      }
    }
    // colorspace plane arithmetic: C444 and Cmono of the same luma
    // parse to the same Y planes (chroma skipped by size)
    val base = Y4mFixtures.y4mBytes(8, 8, 2, (_, y, _) => 3 * y)
    def reheader(cs: String, chromaPerPixel: Int): Array[Byte] = {
      val hdr = s"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C$cs\n".getBytes("US-ASCII")
      val out = new java.io.ByteArrayOutputStream()
      out.write(hdr)
      val (_, _, frames) = Multimodal.decodeY4m(base).get
      frames.foreach { f =>
        out.write("FRAME\n".getBytes("US-ASCII"))
        out.write(f)
        out.write(Array.fill(64 * chromaPerPixel)(128.toByte))
      }
      out.toByteArray
    }
    val wantY = Multimodal.decodeY4m(base).get._3.map(_.toSeq)
    assert(Multimodal.decodeY4m(reheader("444", 2)).get._3.map(_.toSeq) == wantY)
    assert(Multimodal.decodeY4m(reheader("mono", 0)).get._3.map(_.toSeq) == wantY)
    // malformed: wrong magic, truncated frame, odd dims under 420
    assert(Multimodal.decodeY4m("not video".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeY4m(base.dropRight(5)).isEmpty, "truncated frame must fail")
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W7 H8 C420jpeg\nFRAME\n".getBytes("US-ASCII")).isEmpty,
      "odd width under 420 must fail")
    // hostile headers must return None, never throw or mis-decode
    // (the contract extractFeatures' stub fallback relies on):
    // >Long digits, >Int dimension, and the Int-overflow pair whose
    // w*h wraps to 0 (a wrap would 'parse' a stream of empty frames)
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W99999999999999999999 H8\nFRAME\n".getBytes("US-ASCII")).isEmpty,
      "20-digit width must be rejected, not thrown on")
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W9999999999 H8\nFRAME\n".getBytes("US-ASCII")).isEmpty,
      ">Int width must be rejected, not thrown on")
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W65536 H65536 Cmono\nFRAME\n".getBytes("US-ASCII")).isEmpty,
      "w*h Int overflow must be rejected, not wrapped to empty frames")
  }

  test("committed Y4M fixtures byte-match regeneration and decode to the analytic goldens") {
    import graft.pipeline.Y4mFixtures
    val dir = java.nio.file.Paths.get(Y4mFixtures.fixtureDir)
    Y4mFixtures.specs.foreach { case (_, name, w, h, n, luma) =>
      val committed = java.nio.file.Files.readAllBytes(dir.resolve(s"$name.y4m"))
      assert(committed.sameElements(Y4mFixtures.y4mBytes(w, h, n, luma)),
        s"$name.y4m on disk differs from its deterministic regeneration")
    }
    // the mm_video query output equals the on-paper golden — the same
    // compare the driver runs, in-test
    val got = Y4mFixtures.decodeQuery(spark)
      .orderBy("media_id", "feature_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Y4mFixtures.golden.map { case (id, p, v) =>
      (id, p, math.rint(v * 1e6) / 1e6) })
    // per-frame means too
    val frames = Y4mFixtures.framesQuery(spark)
      .orderBy("media_id", "frame_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(frames.toSeq == Y4mFixtures.frameGolden)
    // extractFeatures routes a REAL Y4M payload through decodeVideo
    // (not the stub): the gray fixture's features put all weight in
    // bin 8 — the stub's byte histogram of the same payload would not
    import spark.implicits._
    val m = Multimodal.Media(99L, "video",
      Y4mFixtures.y4mBytes(8, 8, 2, (_, _, _) => 128), 8, 8, 0L)
    val feats = Multimodal.extractFeatures(Seq(m).toDS()).collect().head.features
    assert(feats(8) == 1.0 && feats.zipWithIndex.filter(_._2 != 8).forall(_._1 == 0.0))
  }
}
