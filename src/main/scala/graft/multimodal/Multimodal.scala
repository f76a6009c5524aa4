package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: opaque binary payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real (schemas, partition-preserving
  * mapPartitions batch transforms, explode-based frame sampling). The
  * codec layer is REAL for P6 PPM + PNG + baseline JPEG images
  * (PpmCodec, PngCodec — PNG incl. DEFLATE, chunk CRCs, and all five
  * scanline filters; JpegCodec — Huffman + DCT, subsampling, restart
  * markers, spec-validated against the JDK's independent decoder),
  * PCM16 WAV audio (WavCodec), and YUV4MPEG2 video (Y4mCodec, C444 +
  * BT.601 conversion), and COMPRESSED MJPEG/AVI video (AviMjpegCodec —
  * RIFF container + per-frame JPEG) — all pure JVM, zero dependencies:
  * synthesize emits actual PPMs / PNGs / JPEGs / WAVs / Y4Ms / AVIs,
  * and decode / feature-extract / resize / resample / frame-sample
  * operate on true pixels, samples, and frames. Only patent-encumbered
  * codecs that genuinely need licensed externals (H.264-class) stay
  * behind `decodeBytesStub`, a deterministic byte-level fake — at
  * production scale that stub body is the only thing that changes (swap
  * in a JNI/codec call; everything around it is the distributed shape).
  *
  * At 100 TB: payloads live in parquet binary columns, read lazily; decode
  * runs partition-local with zero shuffle; per-item fan-out (frames)
  * explodes to rows co-partitioned with the parent item.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             sampleRate: Int, durationMs: Int, mime: String)
  final case class MediaItem(mediaId: Long, kind: String,
                             payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(mediaId: Long, kind: String, nBytes: Int,
                                 meanByte: Double, entropyMilli: Long,
                                 histogram: Array[Long])

  /** STUB — deterministic fake decode for the one format family without
    * a pure-JVM codec here (H.264-class video). A real build replaces
    * this body with a codec call; signature and batch shape stay. */
  private[multimodal] def decodeBytesStub(payload: Array[Byte]): Array[Int] =
    payload.map(b => (b & 0xff)) // "pixels" = raw bytes

  /** Real image decode for any supported format → (w, h, rgb). */
  private[multimodal] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (PpmCodec.isPpm(payload)) PpmCodec.decode(payload)
    else if (PngCodec.isPng(payload)) PngCodec.decode(payload)
    else if (JpegCodec.isJpeg(payload)) JpegCodec.decode(payload)
    else if (GifCodec.isGif(payload)) GifCodec.decode(payload)
    else None

  /** Dispatching decode: REAL pixels for PPM/PNG/JPEG/GIF payloads, REAL
    * per-frame luma for Y4M video, REAL per-frame RGB for MJPEG/AVI
    * compressed video, stub otherwise. */
  private[multimodal] def decodePixels(payload: Array[Byte]): Array[Int] =
    decodeImage(payload) match {
      case Some((_, _, rgb)) => rgb.map(_ & 0xff)
      case None => Y4mCodec.decode(payload) match {
        case Some(v) =>
          val n = v.width * v.height
          v.frames.flatMap(f => f.take(n).map(_ & 0xff)) // Y planes
        case None => AviMjpegCodec.decode(payload) match {
          case Some(v) => v.frames.flatMap(_.map(_ & 0xff)).toArray
          case None => decodeBytesStub(payload)
        }
      }
    }

  /** Feature extraction: partition-local batch transform, no shuffle.
    * (The mapInPandas analogue — one JVM call per batch of rows.) */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition reusable buffers — the "batch" shape that matters
      val hist = new Array[Long](16)
      it.map { m =>
        java.util.Arrays.fill(hist, 0L)
        val px = decodePixels(m.payload)
        var s = 0L
        px.foreach { v => s += v; hist(v >> 4) += 1 }
        val n = math.max(px.length, 1)
        var ent = 0.0
        hist.foreach { c =>
          if (c > 0) { val p = c.toDouble / n; ent -= p * math.log(p) / math.log(2) }
        }
        MediaFeatures(m.mediaId, m.kind, px.length, s.toDouble / n,
          math.round(ent * 1000), hist.clone())
      }
    }
  }

  final case class AudioFeatures(mediaId: Long, sampleRate: Int, nSamples: Int,
                                 rmsMilli: Long, zeroCrossings: Long,
                                 peakAbs: Int)

  /** Audio feature extraction over REAL decoded WAV samples: RMS level
    * (relative to full scale, in milli-units), zero-crossing count, and
    * peak amplitude. Partition-local batch transform, no shuffle — the
    * same shape as [[extractFeatures]]; non-WAV payloads are dropped. */
  def extractAudioFeatures(items: Dataset[MediaItem]): Dataset[AudioFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.flatMap { m =>
        WavCodec.decode(m.payload).map { case (rate, s) =>
          var sumSq = 0.0
          var zc = 0L
          var peak = 0
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            sumSq += v.toDouble * v
            if (i > 0 && ((s(i - 1) < 0 && v >= 0) || (s(i - 1) >= 0 && v < 0))) zc += 1
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          val rms = math.sqrt(sumSq / math.max(s.length, 1)) / 32768.0
          AudioFeatures(m.mediaId, rate, s.length,
            math.round(rms * 1000), zc, peak)
        }
      }
    }
  }

  /** Spectral analysis frame: 40 ms at the 16 kHz synth rate. Fixed so
    * every probe frequency is EXACTLY bin-aligned (bin spacing =
    * rate/frame), which kills rectangular-window leakage ambiguity — a
    * pure tone's nearest probe always dominates every sidelobe. */
  val GoertzelFrame = 640

  /** Probe spacing in Hz at 16 kHz / [[GoertzelFrame]] samples. */
  val ProbeHz = 25

  /** Number of probes: 25 Hz .. just under Nyquist/2 (4 kHz). */
  val NumProbes = 159

  /** Band rollup width for the energy vector (10 probes per band). */
  val BandProbes = 10

  final case class SpectralFeatures(mediaId: Long, sampleRate: Int,
                                    nSamples: Int, peakHz: Int,
                                    centroidHz: Int,
                                    bandEnergyMilli: Array[Long])

  /** REAL frequency-domain audio features via the Goertzel algorithm —
    * the classic O(N) single-bin DFT (Goertzel 1958; the standard
    * embedded/DSP device for probing known frequencies, e.g. DTMF
    * detection). For each WAV payload: probe [[NumProbes]] bin-aligned
    * frequencies over the first [[GoertzelFrame]] samples, emit the peak
    * probe (dominant tone), an energy-weighted centroid, and a
    * [[BandProbes]]-wide band-energy vector normalized to milli-units —
    * the audio analogue of the image histogram in [[extractFeatures]],
    * and the feature row an audio-corpus curation pipeline would key
    * dedup/quality decisions on.
    *
    * Scale shape: partition-local mapPartitions with per-partition
    * reusable buffers, zero shuffle, O(frame × probes) integer/double
    * scalar work per item — embarrassingly parallel at any corpus size.
    * Spec-gated ([[MultimodalOpsSpec]]): the synthesized tone's known
    * frequency must be recovered to within one probe width. */
  def extractSpectralFeatures(items: Dataset[MediaItem]): Dataset[SpectralFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      val power = new Array[Double](NumProbes)
      it.flatMap { m =>
        WavCodec.decode(m.payload).map { case (rate, s) =>
          val n = math.min(GoertzelFrame, s.length)
          var k = 0
          while (k < NumProbes) {
            // bin (k+1) of an n-point DFT at this rate
            val w = 2.0 * math.Pi * (k + 1) * ProbeHz / rate
            val coeff = 2.0 * math.cos(w)
            var s1 = 0.0; var s2 = 0.0
            var i = 0
            while (i < n) {
              val s0 = s(i).toDouble / 32768.0 + coeff * s1 - s2
              s2 = s1; s1 = s0
              i += 1
            }
            power(k) = s1 * s1 + s2 * s2 - coeff * s1 * s2
            k += 1
          }
          var peak = 0; var total = 0.0; var wsum = 0.0
          k = 0
          while (k < NumProbes) {
            if (power(k) > power(peak)) peak = k
            total += power(k)
            wsum += power(k) * (k + 1) * ProbeHz
            k += 1
          }
          val nBands = NumProbes / BandProbes + 1
          val bands = new Array[Long](nBands)
          k = 0
          while (k < NumProbes) {
            bands(k / BandProbes) +=
              math.round(1000.0 * power(k) / math.max(total, 1e-12))
            k += 1
          }
          SpectralFeatures(m.mediaId, rate, s.length, (peak + 1) * ProbeHz,
            math.round(wsum / math.max(total, 1e-12)).toInt, bands)
        }
      }
    }
  }

  /** Bilinear resize + optional center-crop: decode, fixed-point bilinear
    * resample ([[PpmCodec.resizeBilinear]] — deterministic across JVMs),
    * re-encode in the source format. The quality twin of the
    * nearest-neighbor [[resize]]; same partition-local zero-shuffle
    * shape. Non-decodable payloads pass through unchanged (a training
    * pipeline quarantines them via [[extractFeatures]]' stub path). */
  def resizeBilinear(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.map { m =>
      decodeImage(m.payload) match {
        case Some((sw, sh, rgb)) =>
          val resized = PpmCodec.resizeBilinear(sw, sh, rgb, w, h)
          val out = if (PngCodec.isPng(m.payload)) PngCodec.encode(w, h, resized)
                    else if (JpegCodec.isJpeg(m.payload)) JpegCodec.encode(w, h, resized)
                    else PpmCodec.encode(w, h, resized)
          m.copy(payload = out, meta = m.meta.copy(width = w, height = h, channels = 3))
        case None => m
      }
    }
  }

  /** Resample audio items to a new rate (REAL linear interpolation for
    * WAV payloads; others pass through). Partition-local, no shuffle. */
  def resampleAudio(items: Dataset[MediaItem], dstRate: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.map { m =>
      WavCodec.decode(m.payload) match {
        case Some((rate, s)) =>
          val out = WavCodec.encode(dstRate, WavCodec.resampleLinear(s, rate, dstRate))
          m.copy(payload = out, meta = m.meta.copy(sampleRate = dstRate))
        case None => m
      }
    }
  }

  /** Resize: REAL nearest-neighbor resample for PPM/PNG payloads (decode
    * → resample → re-encode in the source format); deterministic
    * truncate/pad fake for stub formats. Partition-local, no shuffle
    * either way. */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.map { m =>
      decodeImage(m.payload) match {
        case Some((sw, sh, rgb)) =>
          val resized = PpmCodec.resizeNearest(sw, sh, rgb, w, h)
          val out = if (PngCodec.isPng(m.payload)) PngCodec.encode(w, h, resized)
                    else if (JpegCodec.isJpeg(m.payload)) JpegCodec.encode(w, h, resized)
                    else PpmCodec.encode(w, h, resized)
          m.copy(payload = out, meta = m.meta.copy(width = w, height = h, channels = 3))
        case None =>
          val want = w * h * math.max(m.meta.channels, 1)
          val p = java.util.Arrays.copyOf(m.payload, want)
          m.copy(payload = p, meta = m.meta.copy(width = w, height = h))
      }
    }
  }

  /** Frame sampling for video-kind items: one row per sampled frame
    * (explode-based fan-out; frames stay co-partitioned with the item). */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.filter(_.kind == "video").toDF()
      .withColumn("frame_ms", explode(expr(
        s"sequence(0, meta.durationMs - 1, $everyMs)")))
      .select(col("mediaId"), col("frame_ms"),
        // STUB frame fingerprint: hash of payload + offset
        xxhash64(col("payload"), col("frame_ms")).as("frame_hash"))
  }

  final case class FrameStats(mediaId: Long, frameIdx: Int, frameMs: Int,
                              meanLuma: Double, lumaHash: Long)

  /** REAL frame sampling over video payloads (Y4M and MJPEG/AVI):
    * decode, pick every `everyMs`-th frame by the stream's own frame
    * rate, and emit true per-frame statistics (mean luma + a luma-plane
    * fingerprint; AVI frames derive luma from RGB via BT.601).
    * Partition-local flatMap — the per-item fan-out happens inside the
    * task, so frames never shuffle away from their parent item.
    * Non-video payloads are dropped (the column-level [[sampleFrames]]
    * covers stub formats). */
  def sampleFramesDecoded(items: Dataset[MediaItem], everyMs: Int): Dataset[FrameStats] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      // (width, height, fpsNum, fpsDen, luma planes)
      val decoded: Option[(Int, Int, Int, Int, Seq[Array[Byte]])] =
        Y4mCodec.decode(m.payload) match {
          case Some(v) =>
            val n = v.width * v.height
            Some((v.width, v.height, v.fpsNum, v.fpsDen,
              v.frames.toSeq.map(_.take(n))))
          case None => AviMjpegCodec.decode(m.payload).map { v =>
            val lumas = v.frames.map { rgb =>
              val n = v.width * v.height
              val y = new Array[Byte](n)
              var i = 0
              while (i < n) {
                y(i) = math.round(
                  0.299 * (rgb(i * 3) & 0xff) + 0.587 * (rgb(i * 3 + 1) & 0xff) +
                    0.114 * (rgb(i * 3 + 2) & 0xff)).toByte
                i += 1
              }
              y
            }
            (v.width, v.height, v.fpsNum, v.fpsDen, lumas)
          }
        }
      decoded.toSeq.flatMap { case (w, h0, fpsNum, fpsDen, lumas) =>
        val n = w * h0
        val msPerFrame = if (fpsNum == 0) 0.0 else 1000.0 * fpsDen / fpsNum
        val stepFrames = math.max(1,
          if (msPerFrame == 0.0) 1 else math.round(everyMs / msPerFrame).toInt)
        Iterator.range(0, lumas.length, stepFrames).map { fi =>
          val y = lumas(fi)
          var s = 0L
          var h = 1125899906842597L // FNV-ish rolling seed
          var i = 0
          while (i < n) {
            val px = y(i) & 0xff
            s += px
            h = h * 31 + px
            i += 1
          }
          FrameStats(m.mediaId, fi, math.round(fi * msPerFrame).toInt,
            s.toDouble / n, h)
        }
      }
    }
  }

  /** Deterministic synthetic media over the documents table. Image-kind
    * items carry REAL P6 PPM payloads (a gradient seeded by the text's
    * md5 — decodable by any image tool); audio/video kinds carry the
    * fake byte plane the stub decodes. */
  def synthesize(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"),
        unhex(md5(col("text"))).as("payload"))
      .map { r =>
        val docId = r.getLong(0)
        val nChars = r.getLong(2).toInt
        val digest = r.getAs[Array[Byte]]("payload")
        val reps = 1 + (nChars % 8)
        val kind = docId % 3 match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        if (kind == "image") {
          val w = 8; val h = 6
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val d = digest(i % digest.length) & 0xff
            rgb(i * 3) = ((d + i) & 0xff).toByte
            rgb(i * 3 + 1) = ((d ^ (i * 7)) & 0xff).toByte
            rgb(i * 3 + 2) = ((255 - d + i / w) & 0xff).toByte
            i += 1
          }
          // rotate formats so all three real image codecs are exercised
          val (payload, mime) = (docId / 3) % 3 match {
            case 0 => (PngCodec.encode(w, h, rgb), "image/png")
            case 1 => (PpmCodec.encode(w, h, rgb), "image/x-portable-pixmap")
            case _ => (JpegCodec.encode(w, h, rgb, quality = 92), "image/jpeg")
          }
          MediaItem(docId, kind, payload,
            MediaMeta(width = w, height = h, channels = 3,
              sampleRate = 0, durationMs = 0, mime = mime))
        } else if (kind == "audio") {
          // REAL WAV: a digest-seeded tone + per-sample dither, PCM16 mono
          val rate = 16000
          val durMs = 40 * reps
          val n = rate * durMs / 1000
          val freq = 200.0 + (digest(0) & 0xff) * 8.0
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            val t = i.toDouble / rate
            val dither = ((digest(i % digest.length) & 0xff) - 128) / 128.0
            val v = 0.6 * math.sin(2 * math.Pi * freq * t) + 0.05 * dither
            samples(i) = math.round(v * 32767.0 * 0.9).toShort
            i += 1
          }
          MediaItem(docId, kind, WavCodec.encode(rate, samples),
            MediaMeta(width = 0, height = 0, channels = 1,
              sampleRate = rate, durationMs = durMs, mime = "audio/wav"))
        } else {
          // REAL video: `reps` frames of a digest-seeded gradient that
          // shifts per frame — alternating raw YUV4MPEG2 and COMPRESSED
          // MJPEG/AVI so both real video codecs are exercised
          val w = 8; val h = 6
          val rgbFrames = Array.tabulate(1 + reps) { fr =>
            val rgb = new Array[Byte](w * h * 3)
            var i = 0
            while (i < w * h) {
              val d = digest((i + fr) % digest.length) & 0xff
              rgb(i * 3) = ((d + i + fr * 3) & 0xff).toByte
              rgb(i * 3 + 1) = ((d ^ (i * 5 + fr)) & 0xff).toByte
              rgb(i * 3 + 2) = ((255 - d + fr) & 0xff).toByte
              i += 1
            }
            rgb
          }
          if ((docId / 3) % 2 == 0) {
            val vid = Y4mCodec.Video(w, h, 25, 1,
              rgbFrames.map(Y4mCodec.rgbToFrame(w, h, _)))
            MediaItem(docId, kind, Y4mCodec.encode(vid),
              MediaMeta(width = w, height = h, channels = 3,
                sampleRate = 0, durationMs = vid.durationMs,
                mime = "video/x-yuv4mpeg2"))
          } else {
            val avi = AviMjpegCodec.encode(w, h, 25, rgbFrames.toSeq, quality = 92)
            val durMs = rgbFrames.length * 1000 / 25
            MediaItem(docId, kind, avi,
              MediaMeta(width = w, height = h, channels = 3,
                sampleRate = 0, durationMs = durMs,
                mime = "video/x-msvideo"))
          }
        }
      }
  }

  /** Oracle-able plumbing query: per-source payload byte stats computed
    * from the same md5 derivation in pure column space. */
  def payloadStats(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.documents(spark, dir)
      .select(col("source"),
        length(unhex(md5(col("text")))).as("n_bytes"),
        expr("CAST(conv(substring(md5(text), 1, 2), 16, 10) AS BIGINT)").as("first_byte"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_items"),
           sum(col("n_bytes")).as("total_bytes"),
           sum(col("first_byte")).as("sum_first_byte"),
           countDistinct(col("first_byte")).as("n_distinct_first"))
      .orderBy("source")
  }

  val payloadStatsSql: String =
    """SELECT source, count(*) AS n_items,
      |  CAST(sum(octet_length(unhex(md5(text)))) AS BIGINT) AS total_bytes,
      |  CAST(sum(CAST(('0x' || substring(md5(text), 1, 2)) AS BIGINT)) AS BIGINT) AS sum_first_byte,
      |  count(DISTINCT CAST(('0x' || substring(md5(text), 1, 2)) AS BIGINT)) AS n_distinct_first
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
