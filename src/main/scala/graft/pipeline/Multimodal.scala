package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata, plus decode / feature-extraction / frame-sampling
  * plumbing.
  *
  * `kind=image` decodes for REAL through the JDK's `javax.imageio`
  * ([[decodeImage]] — PNG/JPEG/GIF/BMP pixels to a luminance
  * histogram, no extra dependencies), `kind=audio` through the JDK's
  * `javax.sound.sampled` ([[decodeAudio]] — WAV/AIFF/AU 16-bit PCM
  * samples to an amplitude histogram), and `kind=video` through a
  * hand-written Y4M container parse ([[decodeY4m]] — uncompressed
  * YUV4MPEG2, raw planar frames, luma histogram + per-frame means;
  * round 12, closing the last stub). COMPRESSED video (H.264 etc.)
  * has no in-JDK codec and stays on [[decodeStub]], a clearly-marked
  * deterministic stand-in (byte histogram) behind the SAME seam:
  * binary column schema, per-partition batched processing (the JVM
  * shape of `mapInPandas`), fixed-width feature output, and
  * partition-preserving plans. Swapping a codec never changes the
  * plan.
  */
object Multimodal {

  /** Media record: payload is opaque bytes; metadata is typed. */
  case class Media(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_bytes: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Double])

  val HistBins = 16

  /** Synthesize a media table from documents: text bytes stand in for
    * encoded image/audio payloads; width/height derived
    * deterministically. At 100 TB this would be a parquet/iceberg table
    * with a real binary column — the schema is the same. */
  def mediaTable(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("n_chars") % 48 + 12).cast("int").as("height"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[Media]
  }

  /** STUB DECODER — deterministic fake in place of a real image/audio
    * decode (no codecs in this container). Produces a normalized
    * HistBins-bin byte histogram; a real implementation would decode
    * pixels/samples here with the same signature. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](HistBins)
    payload.foreach { b => hist((b & 0xff) * HistBins / 256) += 1.0 }
    val n = math.max(payload.length, 1)
    hist.map(h => h / n)
  }

  /** REAL image decode for `kind=image` via the JDK's `javax.imageio`
    * (zero extra dependencies): decodes PNG/JPEG/GIF/BMP payloads to
    * pixels and emits a normalized HistBins-bin LUMINANCE histogram
    * (integer luma = (299r + 587g + 114b)/1000, the BT.601 weights in
    * exact integer arithmetic, so the features are deterministic).
    * Returns None when no registered reader accepts the bytes — the
    * caller falls back to [[decodeStub]], which keeps non-media
    * payloads (and audio/video, where the JDK has no codec) on the
    * honest stand-in path. */
  def decodeImage(payload: Array[Byte]): Option[Array[Double]] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }
    img.map { bi =>
      val hist = new Array[Double](HistBins)
      var y = 0
      while (y < bi.getHeight) {
        var x = 0
        while (x < bi.getWidth) {
          val rgb = bi.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          hist(luma * HistBins / 256) += 1.0
          x += 1
        }
        y += 1
      }
      val n = math.max(bi.getWidth * bi.getHeight, 1)
      hist.map(_ / n)
    }
  }

  /** Average-hash (aHash) perceptual fingerprint of an image: REAL
    * `javax.imageio` decode → integer luma grid (the [[decodeImage]]
    * 299/587/114 weights) → EXACT 8×8 block-mean resample (per target
    * cell, the source rect [t·d div 8, (t+1)·d div 8) — collapsed to
    * the nearest pixel when upscaling — averaged by integer division)
    * → strict mean threshold → 64 bits, MSB-first row-major, as a
    * 16-hex-char string. Every step is integer arithmetic, so the
    * fixture goldens are derivable on paper (and flat images
    * degenerate to the all-zero hash — the documented aHash
    * limitation; simhash-style banding over these fingerprints is the
    * image twin of [[Dedup.simhashNearPairs]]). */
  def aHash64(payload: Array[Byte]): Option[String] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }
    img.map { bi =>
      val (w, h) = (bi.getWidth, bi.getHeight)
      def luma(x: Int, y: Int): Long = {
        val rgb = bi.getRGB(x, y)
        (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 1000L
      }
      val v = Array.tabulate(8, 8) { (ty, tx) =>
        val x0 = tx * w / 8; val x1 = math.max((tx + 1) * w / 8, x0 + 1)
        val y0 = ty * h / 8; val y1 = math.max((ty + 1) * h / 8, y0 + 1)
        var s = 0L
        var y = y0
        while (y < y1) { var x = x0; while (x < x1) { s += luma(x, y); x += 1 }; y += 1 }
        s / ((x1 - x0).toLong * (y1 - y0))
      }
      val mean = v.flatten.sum / 64
      val hash = v.flatten.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
        if (p > mean) acc | (1L << (63 - i)) else acc
      }
      f"$hash%016x"
    }
  }

  /** Raw 16-bit signed PCM samples via `javax.sound.sampled` —
    * WAV/AIFF/AU containers, endianness per format. The shared decode
    * seam under [[decodeAudio]] and [[audioHash64]]. */
  def decodePcm(payload: Array[Byte]): Option[Array[Int]] = {
    val in =
      try Some(javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    in.flatMap { ais =>
      try {
        val fmt = ais.getFormat
        val pcm = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        if (!pcm) None
        else {
          val bytes = ais.readAllBytes()
          val out = new Array[Int](bytes.length / 2)
          var i = 0
          while (i + 1 < bytes.length) {
            // 16-bit signed sample; WAV is little-endian, AIFF/AU big
            out(i / 2) =
              if (fmt.isBigEndian) (bytes(i).toInt << 8) | (bytes(i + 1) & 0xff)
              else (bytes(i + 1).toInt << 8) | (bytes(i) & 0xff)
            i += 2
          }
          if (out.isEmpty) None else Some(out)
        }
      } finally ais.close()
    }
  }

  /** REAL audio decode for `kind=audio` via the JDK's
    * `javax.sound.sampled` (zero extra dependencies — the same
    * in-JDK-codec stance as [[decodeImage]]): parses WAV/AIFF/AU
    * containers, accepts 16-bit signed PCM, and emits a normalized
    * HistBins-bin AMPLITUDE histogram — bin = (sample + 32768) *
    * HistBins / 65536, exact integer arithmetic over the full 16-bit
    * range, all channels pooled. Returns None when the bytes are not
    * a parseable audio container (or not 16-bit PCM) — the caller
    * falls back to [[decodeStub]], keeping non-media payloads on the
    * honest stand-in path. Video remains stub-only (no in-JDK codec
    * exists). */
  def decodeAudio(payload: Array[Byte]): Option[Array[Double]] =
    decodePcm(payload).map { samples =>
      val hist = new Array[Double](HistBins)
      samples.foreach(s => hist(((s + 32768) * HistBins) / 65536) += 1.0)
      hist.map(_ / samples.length)
    }

  /** Audio perceptual fingerprint — the [[aHash64]] stance on the
    * audio plane: REAL decode → 64 integer block-mean frames (sum of
    * samples div count; nearest frame when fewer than 64 samples) →
    * bit i (i = 0..62, MSB-first) set iff frame i+1 > frame i (the
    * sign-of-derivative envelope, robust to gain changes that scale
    * all frames together), bit 63 reserved 0 — 16 hex chars. Every
    * step is integer arithmetic, so the fixture goldens are on-paper
    * derivable: constant-envelope signals (silence, symmetric
    * squares) degenerate to the all-zero hash; the ramp's strictly
    * rising means read fffffffffffffffe. */
  def audioHash64(payload: Array[Byte]): Option[String] =
    decodePcm(payload).map { s =>
      val n = s.length
      val frames = Array.tabulate(64) { f =>
        val i0 = f * n / 64
        val i1 = math.max((f + 1) * n / 64, i0 + 1)
        var sum = 0L
        var i = i0
        while (i < i1) { sum += s(math.min(i, n - 1)); i += 1 }
        sum / (i1 - i0)
      }
      val hash = (0 until 63).foldLeft(0L) { (acc, i) =>
        if (frames(i + 1) > frames(i)) acc | (1L << (63 - i)) else acc
      }
      f"$hash%016x"
    }

  /** Y4M (YUV4MPEG2) container parse — the round-12 closure of the
    * video stub: Y4M is the UNCOMPRESSED interchange container
    * (mjpegtools/ffmpeg lingua franca) — an ASCII header line
    * (`YUV4MPEG2 W<w> H<h> ... C<colorspace>\n`), then per frame an
    * ASCII `FRAME...\n` marker followed by raw planar YUV bytes. No
    * codec exists in the JDK for COMPRESSED video (that stance is
    * unchanged), but none is needed to decode this container — the
    * same no-encoder-in-the-loop trick as [[WavFixtures]]' RIFF
    * bytes. Returns (width, height, Y planes) — luma only, which is
    * what every feature here consumes; chroma planes are skipped by
    * size. Supported colorspaces: C420* (any suffix — jpeg/mpeg2/
    * paldv differ only in chroma SITING, which luma extraction never
    * touches), C422, C444, Cmono; absent C defaults to 420 per the
    * spec. None on any malformed header, bad dimensions, or
    * truncated frame — callers fall back or drop, never mis-decode. */
  def decodeY4m(payload: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    if (payload.length < magic.length ||
      !payload.take(magic.length).sameElements(magic)) return None
    val headerEnd = payload.indexOf('\n'.toByte)
    if (headerEnd < 0) return None
    val header = new String(payload, 0, headerEnd, "US-ASCII")
    val params = header.split(' ').drop(1)
    // toLong + an explicit pixel-count cap: the contract is None on ANY
    // malformed header — a 10+-digit dimension must not throw
    // NumberFormatException out of the seam, and w*h must not overflow
    // Int (2^31 pixels/frame is far beyond any sane uncompressed frame)
    def num(tag: Char): Option[Long] =
      params.collectFirst { case p if p.nonEmpty && p.head == tag =>
        p.tail.takeWhile(_.isDigit) }
        .filter(s => s.nonEmpty && s.length <= 18).map(_.toLong)
    val cs = params.collectFirst { case p if p.startsWith("C") => p.tail }
      .getOrElse("420jpeg")
    (num('W'), num('H')) match {
      // /4 headroom keeps every plane-size sum (444 = 3x ySize) and
      // the per-frame offset arithmetic inside Int
      case (Some(wL), Some(hL)) if wL > 0 && hL > 0 && wL * hL <= Int.MaxValue / 4 =>
        val (w, h) = (wL.toInt, hL.toInt)
        val ySize = w * h
        val chromaSize =
          if (cs.startsWith("420")) {
            if (w % 2 != 0 || h % 2 != 0) return None
            (w / 2) * (h / 2) * 2
          } else if (cs.startsWith("422")) {
            if (w % 2 != 0) return None
            (w / 2) * h * 2
          } else if (cs.startsWith("444")) ySize * 2
          else if (cs == "mono") 0
          else return None
        val frames = Vector.newBuilder[Array[Byte]]
        var pos = headerEnd + 1
        while (pos < payload.length) {
          // FRAME marker line (may carry parameters up to its \n)
          val frameMagic = "FRAME".getBytes("US-ASCII")
          if (pos + frameMagic.length > payload.length ||
            !payload.slice(pos, pos + frameMagic.length).sameElements(frameMagic))
            return None
          val nl = payload.indexOf('\n'.toByte, pos)
          if (nl < 0) return None
          val dataStart = nl + 1
          if (dataStart.toLong + ySize + chromaSize > payload.length) return None
          frames += payload.slice(dataStart, dataStart + ySize)
          pos = dataStart + ySize + chromaSize
        }
        val fs = frames.result()
        if (fs.isEmpty) None else Some((w, h, fs))
      case _ => None
    }
  }

  /** REAL video decode for Y4M payloads: pooled luma histogram over
    * ALL frames — bin = y * HistBins / 256 over every pixel of every
    * frame, normalized by total pixel count. The video member of the
    * [[decodeImage]]/[[decodeAudio]] family; None for non-Y4M bytes
    * (compressed containers stay out of scope — no in-JDK codec). */
  def decodeVideo(payload: Array[Byte]): Option[Array[Double]] =
    decodeY4m(payload).map { case (w, h, frames) =>
      val hist = new Array[Double](HistBins)
      frames.foreach(_.foreach(b => hist((b & 0xff) * HistBins / 256) += 1.0))
      val n = math.max(frames.length * w * h, 1)
      hist.map(_ / n)
    }

  /** Per-frame integer mean luma (sum div count) — the temporal
    * feature a frame sampler feeds downstream (scene cuts, fades):
    * (frame_no, mean_luma) per frame, exact integer arithmetic so
    * fixture goldens are on-paper derivable. */
  def videoFrameMeans(payload: Array[Byte]): Option[Seq[(Int, Long)]] =
    decodeY4m(payload).map { case (w, h, frames) =>
      frames.zipWithIndex.map { case (f, i) =>
        var s = 0L
        var j = 0
        while (j < f.length) { s += (f(j) & 0xff); j += 1 }
        (i, s / (w.toLong * h))
      }
    }

  /** Batched per-partition feature extraction — the JVM analogue of
    * `mapInPandas`: one iterator per partition, codec state is
    * initialized once per partition, rows stream through. No shuffle;
    * partitioning is preserved. `kind=image` payloads go through the
    * REAL [[decodeImage]] codec, `kind=audio` through the REAL
    * [[decodeAudio]] codec, and `kind=video` through the REAL
    * [[decodeVideo]] Y4M parse; undecodable bytes fall back to
    * [[decodeStub]]. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init: ImageIO scans its reader registry
      // once here, not per row
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val features = m.kind match {
          case "image" => decodeImage(m.payload).getOrElse(decodeStub(m.payload))
          case "audio" => decodeAudio(m.payload).getOrElse(decodeStub(m.payload))
          case "video" => decodeVideo(m.payload).getOrElse(decodeStub(m.payload))
          case _ => decodeStub(m.payload)
        }
        MediaFeatures(m.media_id, m.kind, m.n_bytes, features)
      }
    }
  }

  /** Scalar view of [[extractFeatures]]: one row per feature component
    * (media_id, kind, n_bytes, feature_pos, feature_val). Downstream
    * sinks (and the hash-based oracle compare) get plain columns; the
    * array shape is one collect_list away. feature_val is rounded so
    * the double is a deterministic function of exact integer counts. */
  def featureRows(media: Dataset[Media]): DataFrame =
    extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        posexplode(col("features")).as(Seq("feature_pos", "feature_val")))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("feature_pos").cast("long").as("feature_pos"),
        round(col("feature_val"), 6).as("feature_val"))

  /** Frame sampling: every `stride`-th byte-window of the payload as a
    * "frame" (decode stand-in for the synthesized media table, whose
    * video payloads are opaque bytes). Output is (media_id, frame_no,
    * frame: binary) — the explode shape a real frame sampler has; the
    * REAL frame path for actual containers is [[decodeY4m]] /
    * [[videoFrameMeans]] (gated by mm_video_frames). */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(_.kind == "video")
      .flatMap { m =>
        val nFrames = math.max(m.payload.length / (frameBytes * stride), 0)
        (0 until nFrames).map { f =>
          (m.media_id, f, m.payload.slice(f * frameBytes * stride, f * frameBytes * stride + frameBytes))
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }

  /** Resize: nearest-neighbor over the payload viewed as a
    * width x height byte grid (decode stand-in — a real image resize
    * swaps the kernel and keeps everything else). Batched
    * per-partition map, no shuffle, partitioning preserved; output
    * rows carry the new payload and dimensions so downstream stages
    * (feature extraction, sinks) are unchanged. */
  def resize(media: Dataset[Media], targetW: Int, targetH: Int): Dataset[Media] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val w = math.max(m.width, 1)
        val h = math.max(m.height, 1)
        val out = Array.tabulate(targetW * targetH) { i =>
          val x = i % targetW
          val y = i / targetW
          val src = (y * h / targetH) * w + (x * w / targetW)
          if (src < m.payload.length) m.payload(src) else 0.toByte
        }
        m.copy(payload = out, width = targetW, height = targetH, n_bytes = out.length.toLong)
      }
    }
  }

  /** Metadata rollup per media kind (oracle-checkable: arithmetic on
    * metadata only). */
  def kindStats(docs: DataFrame): DataFrame =
    mediaTable(docs).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(sum("width").cast("double") / count(lit(1)), 4).as("avg_width"),
        round(sum("height").cast("double") / count(lit(1)), 4).as("avg_height"))
}
