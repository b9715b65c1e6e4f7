package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns plus typed
  * metadata, with decode / feature-extract / resize / frame-sample stages
  * shaped for scale (north star ops).
  *
  * The Spark-side contract is real and tested — schemas, partitioning,
  * iterator-based batch processing via typed `mapPartitions` (the Scala
  * analog of `mapInPandas`: per-partition streaming, constant memory, one
  * task per partition). The codec itself is STUBBED with a deterministic
  * fake (`FakeCodec`) because no image/audio libraries exist in this
  * environment; `decodeImage` documents the swap point — replace the codec,
  * keep the plumbing.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the storage contract. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      mean_intensity: Double,
      intensity_histogram: Array[Long])

  final case class FrameSample(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Image decode front door: real PNG/JPEG/GIF/BMP payloads go through the
    * JDK-native `javax.imageio` readers (no external dependency) and are
    * collapsed to a grayscale raster via BT.601 luma; payloads no reader
    * recognizes (the synthetic raw rasters, video frame slices) fall back to
    * [[FakeCodec]]'s row-major interpretation. Returned dimensions are the
    * DECODED ones — for a real image they come from the file header, not the
    * metadata columns.
    */
  object Codec {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Array[Int]] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) FakeCodec.decode(payload, width, height)
      else Array.tabulate(img.getHeight, img.getWidth) { (r, c) =>
        val rgb = img.getRGB(c, r)
        (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
      }
    }
  }

  /** STUB codec: interprets payload bytes as a row-major grayscale raster.
    * Deterministic, dependency-free; the fallback for payloads that aren't a
    * real image container (synthetic fixtures, video frame slices).
    */
  object FakeCodec {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Array[Int]] = {
      // Long math on the declared area: hostile dims like 65537×65537
      // overflow Int (→131073), pass an Int-math payload guard, and then
      // Array.tabulate attempts a multi-GB allocation — an OutOfMemoryError
      // the NonFatal skip contract cannot intercept. A raster can never
      // hold more pixels than its payload has bytes, so comparing the Long
      // area against the payload length both validates and bounds the
      // allocation by bytes actually present (the EDF parser's byte-budget
      // discipline). Non-positive dims are rejected on the same check.
      val area = width.toLong * height
      require(width > 0 && height > 0 && area <= payload.length,
        s"payload ${payload.length} < ${width}x$height")
      Array.tabulate(height, width)((r, c) => payload(r * width + c) & 0xff)
    }

    /** Nearest-neighbor resize on the fake raster. */
    def resize(px: Array[Array[Int]], newW: Int, newH: Int): Array[Array[Int]] = {
      val h = px.length; val w = px(0).length
      Array.tabulate(newH, newW)((r, c) => px(r * h / newH)(c * w / newW))
    }

    def encode(px: Array[Array[Int]]): Array[Byte] =
      px.flatten.map(_.toByte)
  }

  /** Decode + feature-extract images, streaming per partition: real
    * PNG/JPEG payloads decode via `javax.imageio` ([[Codec]]); raw-raster
    * payloads use the fallback. Output width/height are the decoded
    * dimensions. Undecodable rows (truncated container, payload shorter
    * than its declared raster, zero-area metadata) are SKIPPED: a corrupt
    * image carries no pixel evidence, and one bad object must not kill a
    * corpus-scale pass — per-file error accounting is the ingest error
    * channel's job (V8), bulk kernels degrade.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.flatMap { m =>
        decodeOrNone(m).filter(px => px.length > 0 && px(0).length > 0)
          .iterator.map { px =>
            val h = px.length
            val w = px(0).length
            var sum = 0L
            val hist = new Array[Long](16)
            px.foreach(_.foreach { v => sum += v; hist(v / 16) += 1 })
            ImageFeatures(m.media_id, w, h,
              sum.toDouble / (w * h), hist)
          }
      }
    }
  }

  /** [[Codec.decode]] as a total function: None for undecodable rows —
    * the skip contract [[imageFeatures]] and [[imageHashes]] document.
    */
  private def decodeOrNone(m: MediaRow): Option[Array[Array[Int]]] =
    try Some(Codec.decode(m.payload, m.width, m.height))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Resize stage: payload → payload, metadata updated. Undecodable or
    * zero-area image rows are skipped — the [[imageFeatures]] contract.
    */
  def resizeImages(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (m.kind != "image") Iterator.single(m)
      else {
        val px =
          try Some(FakeCodec.decode(m.payload, m.width, m.height))
          catch { case scala.util.control.NonFatal(_) => None }
        px.filter(p => p.length > 0 && p(0).length > 0).iterator.map { p =>
          m.copy(payload = FakeCodec.encode(FakeCodec.resize(p, newW, newH)),
            width = newW, height = newH)
        }
      }
    })
  }

  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_samples: Int,
      rms: Double,
      zero_crossing_rate: Double,
      dominant_freq_hz: Double)

  /** Minimal RIFF/WAVE codec for PCM16 containers — the audio analog of
    * [[Codec]]'s `javax.imageio` front door: a real WAV payload carries
    * its format (channels, sample rate, bit depth) in the container
    * header, so decode takes those from the file and IGNORES the metadata
    * columns. Strict inside [[decode]]: truncated chunks and non-PCM16
    * formats raise catchable errors, and the bulk kernels skip the row
    * (the [[imageFeatures]] contract). [[encode]] writes the canonical
    * 44-byte-header mono layout.
    */
  object WavCodec {
    private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

    def isWav(b: Array[Byte]): Boolean =
      b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E'

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    /** Decode to mono [-1, 1] samples + the CONTAINER's sample rate;
      * multi-channel audio is downmixed by per-frame averaging. Walks the
      * chunk list, so layouts with extra chunks between `fmt ` and `data`
      * (LIST/INFO metadata etc.) decode too — declared sizes are checked
      * against the bytes present before anything is read.
      */
    def decode(b: Array[Byte]): (Array[Double], Int) = {
      require(isWav(b), "not a RIFF/WAVE payload")
      var fmtOff = -1
      var dataOff = -1
      var dataLen = 0
      var o = 12
      while (o + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(b, o, 4, Ascii)
        val size = u32(b, o + 4)
        require(o + 8 + size <= b.length,
          s"truncated WAV chunk '$id' ($size bytes declared, " +
            s"${b.length - o - 8} present)")
        if (id == "fmt ") { require(size >= 16, "short fmt chunk"); fmtOff = o + 8 }
        else if (id == "data") { dataOff = o + 8; dataLen = size.toInt }
        o += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      require(fmtOff >= 0 && dataOff >= 0, "WAV missing fmt/data chunk")
      val fmt = u16(b, fmtOff)
      require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
      val channels = u16(b, fmtOff + 2)
      val rate = u32(b, fmtOff + 4).toInt
      val bits = u16(b, fmtOff + 14)
      require(channels > 0 && rate > 0,
        s"bad WAV fmt: $channels ch @ $rate Hz")
      require(bits == 16, s"unsupported WAV bit depth $bits (PCM16 only)")
      val frames = dataLen / (2 * channels)
      val out = new Array[Double](frames)
      var i = 0
      while (i < frames) {
        var sum = 0.0
        var c = 0
        while (c < channels) {
          val off = dataOff + 2 * (i * channels + c)
          sum += ((b(off) & 0xff) | (b(off + 1).toInt << 8)).toShort / 32768.0
          c += 1
        }
        out(i) = sum / channels
        i += 1
      }
      (out, rate)
    }

    /** Canonical 44-byte-header mono PCM16 WAV. */
    def encode(samples: Array[Double], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(Ascii)).putInt(36 + dataLen)
      buf.put("WAVE".getBytes(Ascii))
      buf.put("fmt ".getBytes(Ascii)).putInt(16)
      buf.putShort(1).putShort(1) // PCM, mono
      buf.putInt(sampleRate).putInt(sampleRate * 2)
      buf.putShort(2).putShort(16) // block align, bits per sample
      buf.put("data".getBytes(Ascii)).putInt(dataLen)
      samples.foreach(v =>
        buf.putShort((math.max(-1.0, math.min(1.0, v)) * 32767).toShort))
      buf.array()
    }
  }

  /** Audio decode front door shared by [[audioFeatures]] and
    * [[audioFingerprints]]: RIFF/WAVE payloads decode through
    * [[WavCodec]] (rate and channel layout from the container, downmixed
    * to mono); anything else is the raw-PCM16-LE interpretation at the
    * metadata sample rate (the synthetic fixtures). None = ineligible
    * (no rate, not one full sample) or malformed (truncated container) —
    * the skip contract the bulk kernels share.
    */
  private def decodeAudioOrNone(m: MediaRow): Option[(Array[Double], Int)] =
    if (WavCodec.isWav(m.payload))
      try Some(WavCodec.decode(m.payload)).filter(_._1.nonEmpty)
      catch { case scala.util.control.NonFatal(_) => None }
    else if (m.sample_rate > 0 && m.payload.length >= 2) {
      val n = m.payload.length / 2
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        val lo = m.payload(2 * i) & 0xff
        val hi = m.payload(2 * i + 1).toInt
        x(i) = (lo | (hi << 8)).toShort / 32768.0
        i += 1
      }
      Some((x, m.sample_rate))
    } else None

  /** Audio decode + feature extraction: RIFF/WAVE payloads decode through
    * [[WavCodec]] (format from the container header); other payloads are
    * raw PCM16 little-endian at the metadata rate (the synthetic
    * fixtures). Features are RMS, zero-crossing rate, and the dominant
    * frequency from the engine's own Welch PSD kernel (graft.signal.Welch
    * — the same code path that powers EEG band extraction). Reported
    * sample_rate/n_samples are the DECODED ones. Ineligible or malformed
    * rows are skipped ([[decodeAudioOrNone]]).
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.flatMap { m =>
      decodeAudioOrNone(m).iterator.map { case (x, sr) =>
        val n = x.length
        var sumSq = 0.0
        var crossings = 0
        var i = 0
        while (i < n) {
          sumSq += x(i) * x(i)
          if (i > 0 && (x(i) >= 0) != (x(i - 1) >= 0)) crossings += 1
          i += 1
        }
        val psd = graft.signal.Welch.psd(x, sr.toDouble)
        val peak = psd.freqs(psd.psd.indices.maxBy(psd.psd))
        AudioFeatures(m.media_id, sr, n,
          math.sqrt(sumSq / math.max(n, 1)),
          crossings.toDouble / math.max(n - 1, 1), peak)
      }
    })
  }

  /** Frame sampling for video-kind rows: every `stride`-th frame becomes its
    * own row (payload sliced per frame of width*height bytes).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      // Long frame size: hostile dims whose product overflows Int would
      // otherwise alias to a small positive frameBytes and slice garbage
      // frames (or pass a frame the decode guard then kills the task on).
      // Non-positive dims are ineligible the same way frameBytes <= 0 is.
      val frameBytes = m.width.toLong * m.height
      // Emit only frames with at least one payload byte: a short payload
      // still yields its short FINAL slice, but declared frame indices
      // entirely past the payload no longer throw from copyOfRange — the
      // malformed-row isolation [[videoFrameHashes]] applies, minus its
      // complete-frames-only restriction (stats tolerate partial slices,
      // hashes don't).
      val nAvail =
        if (m.width <= 0 || m.height <= 0) 0
        else math.min(m.n_frames.toLong,
          (m.payload.length + frameBytes - 1) / frameBytes).toInt
      (0 until nAvail by stride).iterator.map { f =>
        // f < ceil(len/frameBytes) keeps f*frameBytes < len, so both slice
        // bounds fit Int even when frameBytes alone would not.
        FrameSample(m.media_id, f,
          java.util.Arrays.copyOfRange(m.payload, (f * frameBytes).toInt,
            math.min((f + 1) * frameBytes, m.payload.length.toLong).toInt))
      }
    }
  }

  final case class FrameStats(media_id: Long, frame_idx: Int, n_bytes: Int,
      mean_intensity: Double)

  /** Per-sampled-frame byte statistics — the feature-extraction step after
    * [[sampleFrames]]: one linear pass per frame inside the same typed
    * pipeline (no payload leaves the executor). Bytes are unsigned
    * intensities (0–255).
    */
  def frameStats(media: Dataset[MediaRow], stride: Int): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    sampleFrames(media, stride).map { f =>
      val n = f.payload.length
      var s = 0L
      var i = 0
      while (i < n) { s += (f.payload(i) & 0xff); i += 1 }
      FrameStats(f.media_id, f.frame_idx, n,
        if (n == 0) 0.0 else s.toDouble / n)
    }
  }

  /** 64-bit average-hash per image — the perceptual fingerprint behind
    * image dedup: decode (real container or raw raster), shrink to 8×8
    * (nearest-neighbor — scale-invariant detail reduction), threshold each
    * cell against the integer mean. Bit i is cell (i/8, i%8). All-integer
    * arithmetic, so the hash is bit-deterministic across engines and runs;
    * downstream banding/Hamming reuse the [[Dedup]] SimHash machinery —
    * a perceptual hash IS a simhash as far as the candidate join cares.
    * One typed mapPartitions pass: payloads never leave the executor.
    */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.flatMap { m =>
        // Undecodable/zero-area rows carry no perceptual evidence: skip
        // (the imageFeatures contract) instead of killing the hash pass.
        decodeOrNone(m).filter(px => px.length > 0 && px(0).length > 0)
          .iterator.map(px => (m.media_id, ahash64(px)))
      }
    }.toDF("media_id", "ahash")
  }

  /** The 8×8 average-hash kernel shared by [[imageHashes]] and
    * [[videoFrameHashes]]: shrink to 8×8 (nearest-neighbor), threshold each
    * cell against the integer mean; bit i is cell (i/8, i%8). All-integer,
    * bit-deterministic across engines and runs.
    */
  def ahash64(px: Array[Array[Int]]): Long = {
    val small = FakeCodec.resize(px, 8, 8)
    var sum = 0L
    small.foreach(_.foreach(sum += _))
    val mean = sum / 64
    var h = 0L
    var bit = 0
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (small(r)(c) > mean) h |= (1L << bit)
        bit += 1; c += 1
      }
      r += 1
    }
    h
  }

  /** Per-sampled-frame perceptual hash for video rows — m3's frame slicing
    * chained into m5's average-hash: every `stride`-th frame of each video
    * becomes `(media_id, frame_idx, fhash)`, 12 bytes/frame regardless of
    * frame size. One typed mapPartitions pass; payload bytes never leave
    * the executor — the clip-level near-dup downstream (m7) only ever
    * shuffles these hash rows.
    */
  def videoFrameHashes(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { m =>
        // Long frame size with a positive-dims eligibility gate ([[
        // sampleFrames]] doc): an Int-overflowed or negative-dim row must
        // not reach the unwrapped FakeCodec.decode below and kill the task.
        val frameBytes = m.width.toLong * m.height
        // Hash only COMPLETE frames: a malformed row whose payload is
        // shorter than n_frames×frameBytes yields fewer frames, never a
        // task-killing short-slice decode failure or an out-of-range copy.
        val nFrames =
          if (m.width <= 0 || m.height <= 0) 0
          else math.min(m.n_frames.toLong, m.payload.length / frameBytes).toInt
        (0 until nFrames by stride).iterator.map { f =>
          // f*frameBytes <= len - frameBytes < len: Int-safe slice bounds.
          val frame = java.util.Arrays.copyOfRange(m.payload,
            (f * frameBytes).toInt, ((f + 1) * frameBytes).toInt)
          (m.media_id, f, ahash64(FakeCodec.decode(frame, m.width, m.height)))
        }
      }
    }.toDF("media_id", "frame_idx", "fhash")
  }

  /** Synthetic image corpus with PLANTED near-duplicates: each group of 3
    * ids shares a pseudo-random base raster — member 0 is the base, member
    * 1 perturbs five pixels (a re-encode/watermark analog), member 2 is an
    * unrelated raster. The expected detection set is the (3g, 3g+1) pairs;
    * cross-group hashes are ~32 bits apart (random rasters), far above any
    * sane Hamming threshold.
    */
  def syntheticImages(spark: SparkSession, n: Int, width: Int = 32,
      height: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val g = i / 3
      // splitmix64: iid-quality bytes per (seed, pixel), so unrelated
      // rasters land ~32 bits apart in ahash space — a weaker mix left
      // whole bit-plane structure shared across seeds and every image
      // "near-matched" every other.
      def mix(x0: Long): Long = {
        var z = x0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      def raster(seed: Long) = Array.tabulate(width * height)(j =>
        (mix(seed * 1048576L + j) & 0xff).toByte)
      val payload = (i % 3) match {
        case 0 => raster(g)
        case 1 =>
          val p = raster(g)
          var k = 0
          while (k < 5) {
            val idx = ((g * 37 + k * 211) % (width * height)).toInt
            p(idx) = (p(idx) + 96).toByte
            k += 1
          }
          p
        case _ => raster(g + 1000000L)
      }
      MediaRow(i, "image", payload, width, height, 0, 1)
    }
  }

  /** Video corpus with PLANTED near-duplicate groups — the video analog of
    * [[syntheticImages]]: `groups` base clips of `frames` pseudo-random
    * raster frames (splitmix64 per (group, frame, pixel) — iid-quality
    * bytes, so unrelated clips land ~32 bits apart per frame in ahash
    * space), each with `perGroup` members. Member 0 is the base; members
    * 1+ perturb five pixels PER FRAME at member-dependent positions (the
    * re-encode/transcode analog — small, frame-local damage). Within a
    * group, per-frame ahashes differ by at most a few bits; across groups
    * they are unrelated, so clip-level mean Hamming separates cleanly.
    */
  def syntheticVideoVariants(spark: SparkSession, groups: Int, perGroup: Int,
      width: Int = 32, height: Int = 32, frames: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    val frameBytes = width * height
    spark.range(groups.toLong * perGroup).map { i =>
      val g = i / perGroup
      val m = (i % perGroup).toInt
      def mix(x0: Long): Long = {
        var z = x0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val payload = Array.tabulate(frameBytes * frames) { j =>
        (mix(g * 16777216L + j) & 0xff).toByte
      }
      if (m > 0) {
        var f = 0
        while (f < frames) {
          var k = 0
          while (k < 5) {
            val idx = f * frameBytes +
              ((g * 37 + f * 101 + m * 389 + k * 211) % frameBytes).toInt
            payload(idx) = (payload(idx) + 96).toByte
            k += 1
          }
          f += 1
        }
      }
      MediaRow(i, "video", payload, width, height, 0, frames)
    }
  }

  /** Deterministic synthetic media table for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int, width: Int = 32,
      height: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = if (i % 3 == 2) "video" else "image"
      val frames = if (kind == "video") 4 else 1
      val payload = Array.tabulate(width * height * frames)(j =>
        ((i * 131 + j * 17) % 256).toByte)
      MediaRow(i, kind, payload, width, height, 0, frames)
    }
  }

  /** Deterministic synthetic audio table: each row is a pure tone (PCM16
    * little-endian, the [[audioFeatures]] decode contract) whose frequency
    * steps with the row id — so the Welch dominant-frequency estimate has
    * a known per-row answer and downstream rollups group rows by tone.
    */
  def syntheticAudio(spark: SparkSession, n: Int, sampleRate: Int = 4000,
      seconds: Int = 2): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val freq = 50.0 + (i % 20) * 20.0
      val samples = sampleRate * seconds
      val payload = new Array[Byte](samples * 2)
      var j = 0
      while (j < samples) {
        val v = (math.sin(2 * math.Pi * freq * j / sampleRate) * 0.5 * 32767).toInt
        payload(2 * j) = (v & 0xff).toByte
        payload(2 * j + 1) = ((v >> 8) & 0xff).toByte
        j += 1
      }
      MediaRow(i, "audio", payload, 0, 0, sampleRate, 0)
    }
  }

  /** Audio corpus with PLANTED near-duplicate groups — the audio analog of
    * [[syntheticImages]]' perturbed triples: `groups` distinct 8-tone
    * chords (component bands chosen deterministically per group), each with
    * `perGroup` member clips differing only by per-member gain and phase
    * jitter (the re-encode/volume-normalization analog). Members of a group
    * share their spectral support exactly; band sets are assigned by a
    * quadratic probe (first 8 distinct of (3g + j²) mod 62) whose pairwise
    * overlap is ≤ 2 bands for every group pair up to 24 groups — so
    * fingerprint Hamming distance is 0 within a group and ≥ 12 across
    * groups, 4× the m6 verify threshold (a plain linear stride cannot do
    * this: 24 groups × 8 bands in 62 slots forces ≥ 6-band overlaps at
    * some group gap, leaving a 1-bit margin).
    */
  def syntheticAudioVariants(spark: SparkSession, groups: Int, perGroup: Int,
      sampleRate: Int = 4000, seconds: Int = 1): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(groups.toLong * perGroup).map { i =>
      val g = (i / perGroup).toInt
      val m = (i % perGroup).toInt
      val samples = sampleRate * seconds
      val nyquist = sampleRate / 2.0
      val bandHz = nyquist / 64.0
      // 8 component tones at band CENTERS: quadratic-probe band sets with
      // pairwise overlap <= 2 for any two of up to 24 groups (see doc).
      val bandIdx = {
        val s = scala.collection.mutable.ArrayBuffer.empty[Int]
        var j = 0
        while (s.length < 8) {
          val v = (3 * g + j * j) % 62 + 1
          if (!s.contains(v)) s += v
          j += 1
        }
        s.toArray
      }
      val freqs = bandIdx.map(b => b * bandHz + bandHz / 2)
      val amp = 0.1 * (1.0 + 0.02 * m)
      val phase = 0.05 * m
      val payload = new Array[Byte](samples * 2)
      var j = 0
      while (j < samples) {
        var v = 0.0
        var k = 0
        while (k < 8) {
          v += math.sin(2 * math.Pi * freqs(k) * j / sampleRate + phase * k)
          k += 1
        }
        val s16 = (v * amp * 32767).toInt.max(-32768).min(32767)
        payload(2 * j) = (s16 & 0xff).toByte
        payload(2 * j + 1) = ((s16 >> 8) & 0xff).toByte
        j += 1
      }
      MediaRow(i, "audio", payload, 0, 0, sampleRate, 0)
    }
  }

  /** 64-bit spectral fingerprint per clip — the audio sibling of the image
    * average-hash: Welch PSD, 64 equal bands over [0, Nyquist), bit b set
    * when band b's mean power exceeds the whole-spectrum mean. Gain and
    * phase cancel (both scale/shift the spectrum uniformly), so
    * re-encoded/re-leveled copies collide; distinct spectral content
    * lands ≫ any small Hamming threshold apart. Typed mapPartitions kernel
    * — payload bytes never leave the executor; output is 16 bytes/clip.
    */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    // Same decode front door and skip contract as [[audioFeatures]]:
    // WAV containers carry their own rate, raw PCM uses the metadata
    // rate, malformed/empty rows have no spectrum to fingerprint.
    media.filter(_.kind == "audio")
      .mapPartitions(_.flatMap { m =>
        decodeAudioOrNone(m).iterator.map { case (x, sr) =>
          val p = graft.signal.Welch.psd(x, sr.toDouble)
          val nb = p.psd.length
          var total = 0.0
          var i = 0
          while (i < nb) { total += p.psd(i); i += 1 }
          val mean = total / math.max(nb, 1)
          var fp = 0L
          var b = 0
          while (b < 64) {
            val lo = b * nb / 64
            val hi = math.max((b + 1) * nb / 64, lo + 1)
            var s = 0.0
            var j = lo
            while (j < hi && j < nb) { s += p.psd(j); j += 1 }
            if (s / (hi - lo) > mean) fp |= (1L << b)
            b += 1
          }
          (m.media_id, fp)
        }
      }).toDF("doc_id", "simhash")
  }

  /** Clip-level near-dup scores from a `(media_id, frame_idx, fhash)`
    * frame-hash table ([[videoFrameHashes]]' shape) — the single source of
    * truth for the m7 kernel (registry query, planted-fixture spec, and
    * ScaleCheck's `video_fp` leg all call this): per-frame chunk banding
    * (band key = frame index × hash chunk) through the star-capped band
    * join, then a frame-aligned mean-Hamming verify. The mean is taken
    * over frame indices present in BOTH clips, so `minAligned` (default 2)
    * floors the evidence: without it, two unequal-length clips sharing a
    * single colliding sampled frame would pass any mean threshold on one
    * coincidence. Returns `(d1, d2, n_frames_aligned, avg_hamming)` with
    * avg_hamming UNROUNDED — callers round/threshold at their output edge.
    */
  def videoNearDupPairs(fh: DataFrame, minAligned: Int = 2): DataFrame = {
    val banded = fh
      .select(col("media_id").as("doc_id"), col("frame_idx"), col("fhash"),
        explode(sequence(lit(0), lit(3))).as("chunk"))
      .select(col("doc_id"),
        (col("frame_idx") * 4 + col("chunk")).as("band"),
        expr("shiftright(fhash, chunk * 16) & 65535").as("bucket"))
    val f1 = fh.select(col("media_id").as("d1"), col("frame_idx"),
      col("fhash").as("h1"))
    val f2 = fh.select(col("media_id").as("d2"), col("frame_idx"),
      col("fhash").as("h2"))
    Dedup.bandedCandidatePairs(banded)
      .join(f1, "d1").join(f2, Seq("d2", "frame_idx"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_frames_aligned"),
        avg(bit_count(col("h1").bitwiseXOR(col("h2")))).as("avg_hamming"))
      .filter(col("n_frames_aligned") >= minAligned)
  }

  /** Metadata rollup over a media DataFrame — the relational face of the
    * multimodal table (works on any DataFrame with the MediaRow columns).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count(lit(1)).as("n_items"),
      sum(length(col("payload"))).as("total_bytes"),
      avg(length(col("payload"))).as("avg_bytes"),
      max(col("width")).as("max_width"),
      max(col("n_frames")).as("max_frames"))
}
