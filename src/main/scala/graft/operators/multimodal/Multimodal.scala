package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analogue of `mapInPandas`: an iterator→iterator
  * `mapPartitions` so a real decoder could hold one codec per partition,
  * not one per row).
  *
  * IMAGE decode is REAL ([[decodeImages]]): `javax.imageio` ships with
  * the JDK, so PNG/JPEG/BMP/GIF payloads decode to true dimensions,
  * format, mean luminance and a pixel checksum, with undecodable rows
  * routed per-cause instead of dropped (the DocJsonl reject
  * discipline). AUDIO decode is REAL too ([[decodeAudio]]):
  * `javax.sound.sampled` ships with the JDK, so WAV/AIFF/AU payloads
  * decode to header-true rate/channels/bit-depth and streamed integer
  * RMS/peak, with the same per-cause routing. VIDEO decode is REAL for
  * the JDK-feasible subset ([[decodeVideo]]): the RIFF/AVI container is
  * parsed byte-by-byte (the format is public and pure structure), and
  * frames decode when the stream is uncompressed BI_RGB (raw DIB) or
  * MJPEG (each frame is a JPEG — `javax.imageio` again). Inter-frame
  * codecs (H.264 &c.) remain environment-blocked — no JDK codec — and
  * route to `unsupported_codec` with header-true dimensions/fps rather
  * than failing, so a crawl's codec mix is measurable before anyone
  * pays for an external decoder. IMAGE RESIZE is REAL
  * ([[resizeImages]]): `java.awt.Graphics2D` bilinear scaling with an
  * integer-exact output-dimension contract and lossless PNG re-encode.
  * [[decodeMedia]] dispatches a mixed-modality table across the three
  * real decoders onto one feature schema; [[resizeStub]] remains as
  * the kind-agnostic binary downsampler.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Unified per-kind REAL decode: route each row by `kind` to
    * [[decodeImages]] / [[decodeAudio]] / [[decodeVideo]] and project
    * the three outcomes onto ONE narrow feature schema — the entry
    * point a mixed-modality crawl table feeds. Columns a modality does
    * not produce are null (`sample_rate`/`rms` are audio-only,
    * `width`/`height`/`mean_rgb_milli` are raster-only); `format`
    * carries the image format name, the audio encoding, or the video
    * codec; `n_frames` is 1 for a decoded still, the PCM frame count
    * for audio, and the container frame count for video. Rows whose
    * kind is none of the three route to `unknown_kind` — the per-cause
    * discipline of the underlying decoders, preserved at the dispatch
    * layer (nothing is silently dropped).
    *
    * The union of three filters is the 100 TB shape on purpose: a
    * media table partitioned by `kind` prunes each branch's scan to
    * its own partitions, and each branch keeps its decoder's
    * iterator→iterator batch contract and bomb guards.
    */
  def decodeMedia(media: Dataset[MediaRow]): DataFrame = {
    val nullInt = lit(null).cast("int")
    val nullLong = lit(null).cast("long")
    val img = decodeImages(media.filter(col("kind") === "image"))
      .select(col("media_id"), lit("image").as("kind"), col("cause"),
        col("format"), col("width"), col("height"),
        when(col("cause") === "ok", lit(1L)).as("n_frames"),
        nullInt.as("sample_rate"), nullLong.as("rms"),
        col("mean_rgb_milli"))
    val aud = decodeAudio(media.filter(col("kind") === "audio"))
      .select(col("media_id"), lit("audio").as("kind"), col("cause"),
        col("format"), nullInt.as("width"), nullInt.as("height"),
        col("n_frames"), col("sample_rate"), col("rms"),
        nullLong.as("mean_rgb_milli"))
    val vid = decodeVideo(media.filter(col("kind") === "video"))
      .select(col("media_id"), lit("video").as("kind"), col("cause"),
        col("codec").as("format"), col("width"), col("height"),
        col("n_frames"), nullInt.as("sample_rate"), nullLong.as("rms"),
        col("mean_rgb_milli"))
    val other = media
      // NULL kind must route here too: `!isin(...)` evaluates to null
      // (falsy) for null kinds, which would drop the row from every
      // branch — violating the nothing-silently-dropped contract
      .filter(col("kind").isNull ||
        !col("kind").isin("image", "audio", "video"))
      .select(col("media_id"), col("kind"),
        lit("unknown_kind").as("cause"),
        lit(null).cast("string").as("format"), nullInt.as("width"),
        nullInt.as("height"), nullLong.as("n_frames"),
        nullInt.as("sample_rate"), nullLong.as("rms"),
        nullLong.as("mean_rgb_milli"))
    img.unionByName(aud).unionByName(vid).unionByName(other)
  }

  /** One image payload's decode outcome. `cause` routes every row:
    * `ok` rows carry the real decoded features; `empty` (no payload),
    * `no_reader` (no registered codec claims the bytes — not an image),
    * and `decode_failed` (a codec claimed it but the bytes are broken —
    * truncation, corruption) carry nulls. Nothing is silently dropped.
    */
  final case class ImageDecode(
      media_id: Long,
      cause: String,
      format: Option[String],
      width: Option[Int],
      height: Option[Int],
      /** mean of (R+G+B) over all pixels, ×1000/3 (integer ‰ of the
        * 0–255 channel range) — for a solid-color image this is exactly
        * (r+g+b)·1000 div 3, which is what makes it oracle-predictable
        */
      mean_rgb_milli: Option[Long],
      /** CRC32 over the row-major ARGB pixel stream — a content
        * fingerprint that survives re-encoding containers byte-for-byte
        * only when the PIXELS match (unlike a payload md5)
        */
      pixel_crc: Option[Long])

  /** REAL image decode via `javax.imageio` — iterator→iterator per
    * partition (one reader lookup per row, stream-backed, no disk
    * cache), constant memory, executor-side. The 100 TB shape: payloads
    * stay columnar binary until this map, features come back as a
    * narrow typed row, and failures become routed rows (count them per
    * cause like the flow decode plane) rather than task failures.
    *
    * `maxPixels` is the decompression-bomb guard: dimensions come from
    * the format HEADER (no pixel decode), and an image whose w·h
    * exceeds the cap routes to `too_large` instead of allocating its
    * raster — one crafted 64k×64k PNG in a crawl must cost a header
    * read, not a 16 GB executor OOM.
    */
  def decodeImages(media: Dataset[MediaRow],
      maxPixels: Long = 64L * 1024 * 1024): Dataset[ImageDecode] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // in-memory ImageInputStreams only: the default ImageIO disk cache
      // would write a temp file per row on the executor
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val none = ImageDecode(r.media_id, "", None, None, None, None, None)
        if (r.payload == null || r.payload.isEmpty) none.copy(cause = "empty")
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) none.copy(cause = "no_reader")
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis, true, true)
                // header-only dimension probe BEFORE any raster decode
                val (hw, hh) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
                if (hw * hh > maxPixels)
                  none.copy(cause = "too_large",
                    format = Some(reader.getFormatName.toLowerCase),
                    width = Some(hw.toInt), height = Some(hh.toInt))
                else {
                val img = reader.read(0)
                val (w, h) = (img.getWidth, img.getHeight)
                var sum = 0L
                val crc = new java.util.zip.CRC32()
                val buf = new Array[Byte](4)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val p = img.getRGB(x, y)
                    sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                    buf(0) = (p >>> 24).toByte; buf(1) = (p >>> 16).toByte
                    buf(2) = (p >>> 8).toByte; buf(3) = p.toByte
                    crc.update(buf)
                    x += 1
                  }
                  y += 1
                }
                ImageDecode(r.media_id, "ok",
                  Some(reader.getFormatName.toLowerCase), Some(w), Some(h),
                  Some(sum * 1000L / (3L * w * h)), Some(crc.getValue))
                }
              } catch {
                case scala.util.control.NonFatal(_) =>
                  none.copy(cause = "decode_failed")
              } finally reader.dispose()
            }
          } finally iis.close()
        }
      }
    }
  }

  /** One audio payload's decode outcome. `cause` routes every row:
    * `ok` rows carry real decoded features; `empty` (no payload),
    * `no_reader` (no registered provider claims the bytes — not audio),
    * `truncated` (the container header declares more frames than the
    * payload carries — crawl-corrupt data) and `decode_failed` (a
    * provider claimed it but reading broke) carry nulls. Nothing is
    * silently dropped — the [[decodeImages]] routing discipline.
    */
  final case class AudioDecode(
      media_id: Long,
      cause: String,
      format: Option[String],
      sample_rate: Option[Int],
      channels: Option[Int],
      bits: Option[Int],
      /** frames actually decodable from the payload (= header-declared
        * frames for intact files — the `ok` contract)
        */
      n_frames: Option[Long],
      /** ⌊√(Σ s²/n)⌋ over all samples (16-bit signed PCM scale) — for a
        * constant-amplitude fixture this is exactly the amplitude, which
        * is what makes it oracle-predictable
        */
      rms: Option[Long],
      /** max |sample| across channels (16-bit signed PCM scale) */
      peak: Option[Long])

  /** REAL audio decode via `javax.sound.sampled` (ships with the JDK —
    * the [[decodeImages]] story for WAV/AIFF/AU): header-true sample
    * rate, channel count and bit depth, then a streaming pass over the
    * PCM frames for integer RMS and peak amplitude. Iterator→iterator
    * per partition, constant memory (frames stream through a reusable
    * buffer — a 4 GB WAV costs a 8 KB buffer, not an executor OOM).
    *
    * `maxFrames` is the [[decodeImages]] `maxPixels` twin: the frame
    * count comes from the HEADER, and a payload declaring more than the
    * cap routes to `too_large` before any sample is read. A reader that
    * reports UNKNOWN length (`AudioSystem.NOT_SPECIFIED`, e.g. an AU
    * stream with the 0xffffffff data-size sentinel) cannot be pre-gated,
    * so the sample pass itself stops and routes to `too_large` the
    * moment it crosses the cap — the cap bounds work in both cases.
    */
  def decodeAudio(media: Dataset[MediaRow],
      maxFrames: Long = 1L << 32): Dataset[AudioDecode] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val none = AudioDecode(r.media_id, "", None, None, None, None,
          None, None, None)
        if (r.payload == null || r.payload.isEmpty) none.copy(cause = "empty")
        else wav16Fast(r.payload) match {
          case Some(w) => decodeAudioFast(none, r.payload, w, maxFrames)
          case None =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              val fmt = in.getFormat
              val fname = fmt.getEncoding.toString.toLowerCase
              val (rate, ch, bits) =
                (fmt.getSampleRate.toInt, fmt.getChannels,
                  fmt.getSampleSizeInBits)
              val declared = in.getFrameLength
              val base = none.copy(format = Some(fname),
                sample_rate = Some(rate), channels = Some(ch),
                bits = Some(bits))
              if (declared >= 0 && declared > maxFrames)
                base.copy(cause = "too_large")
              else if (bits != 16)
                // only 16-bit signed PCM gets the sample pass (the
                // fixture/crawl norm); other depths still report header
                // facts with a routed cause rather than wrong amplitudes
                base.copy(cause = "unsupported_depth",
                  n_frames = if (declared >= 0) Some(declared) else None)
              else {
                val frameBytes = fmt.getFrameSize
                val big = fmt.isBigEndian
                val buf = new Array[Byte](8192 - 8192 % frameBytes)
                // unknown-length streams (declared < 0) bypass the
                // header gate above, so the pass itself enforces the
                // cap: crossing maxFrames·ch samples aborts to too_large
                val capSamples =
                  if (maxFrames >= Long.MaxValue / ch) Long.MaxValue
                  else maxFrames * ch
                var over = false
                var sumSq = 0.0
                var peak = 0L
                var nSamples = 0L
                var read = in.read(buf)
                while (read > 0 && !over) {
                  var i = 0
                  while (i + 1 < read && !over) {
                    val s =
                      if (big) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                      else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                    sumSq += s.toDouble * s.toDouble
                    val a = math.abs(s.toLong)
                    if (a > peak) peak = a
                    nSamples += 1
                    if (nSamples > capSamples) over = true
                    i += 2
                  }
                  if (!over) read = in.read(buf)
                }
                val frames = nSamples / ch
                if (over) base.copy(cause = "too_large")
                else if (frames < declared)
                  // the header promised more than the payload carries
                  base.copy(cause = "truncated", n_frames = Some(frames))
                else
                  base.copy(cause = "ok", n_frames = Some(frames),
                    rms = Some(
                      if (nSamples == 0) 0L
                      else math.sqrt(sumSq / nSamples).toLong),
                    peak = Some(peak))
              }
            } finally in.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              none.copy(cause = "no_reader")
            case scala.util.control.NonFatal(_) =>
              none.copy(cause = "decode_failed")
          }
        }
      }
    }
  }

  /** The canonical 16-bit PCM WAV shape, located by a direct RIFF chunk
    * walk ([[wav16Fast]]).
    */
  private[graft] final case class Wav16(rate: Int, ch: Int, dataOff: Int,
      /** whole-frame bytes actually present (min of the data chunk's
        * declared size and the payload remainder, frame-aligned)
        */
      dataBytes: Int,
      /** frames the data chunk header declares */
      declaredFrames: Long)

  /** Fast-path probe: chunk-walk the RIFF/WAVE container directly and
    * return the PCM layout when — and only when — the file is the
    * strict canonical shape (RIFF/WAVE, `fmt ` audioFormat 1, 16-bit,
    * little-endian, a `data` chunk after `fmt `). Everything else
    * returns None and falls back to `javax.sound`, so causes and
    * features stay identical across paths; what the fast path buys is
    * skipping the AudioSystem stream factory (~170 µs per payload —
    * it DOMINATES small-clip corpora, measured at ×100 in the avdup
    * rehearsal) and reading samples straight from the payload array.
    */
  private[graft] def wav16Fast(p: Array[Byte]): Option[Wav16] = {
    def u32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def tag(o: Int, s: String): Boolean =
      p(o) == s(0).toByte && p(o + 1) == s(1).toByte &&
        p(o + 2) == s(2).toByte && p(o + 3) == s(3).toByte
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var rate = -1L
    var ch = -1
    var fmtOk = false
    while (pos + 8 <= p.length) {
      val sz = u32(pos + 4)
      // a declared chunk size beyond the payload cannot be walked past
      // (and sz.toInt would wrap NEGATIVE for lying >=2^31 sizes,
      // moving pos backwards — an infinite loop on a hostile payload;
      // the AVI walk has the same guard). The data chunk is exempt:
      // it is handled before the advance, clamped to what's present
      if (!tag(pos, "data") && sz > p.length.toLong - pos - 8) return None
      val off = pos + 8
      if (tag(pos, "fmt ")) {
        if (sz < 16 || off + 16 > p.length) return None
        val afmt = u16(off)
        ch = u16(off + 2)
        rate = u32(off + 4)
        val bits = u16(off + 14)
        fmtOk = afmt == 1 && bits == 16 && ch >= 1 &&
          rate > 0 && rate <= Int.MaxValue
        if (!fmtOk) return None // exotic encoding → javax.sound decides
      } else if (tag(pos, "data")) {
        if (!fmtOk) return None // data before fmt → not canonical
        val frameBytes = 2L * ch
        val avail = math.min(sz, math.max(0L, p.length.toLong - off))
        return Some(Wav16(rate.toInt, ch, off,
          (avail - avail % frameBytes).toInt, sz / frameBytes))
      }
      pos = off + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  // array-direct twin of decodeAudio's streaming pass — identical
  // arithmetic (little-endian 16-bit samples, Σs², peak, frame count,
  // truncated-vs-ok routing), no stream machinery
  private def decodeAudioFast(none: AudioDecode, p: Array[Byte],
      w: Wav16, maxFrames: Long): AudioDecode = {
    val base = none.copy(format = Some("pcm_signed"),
      sample_rate = Some(w.rate), channels = Some(w.ch), bits = Some(16))
    if (w.declaredFrames > maxFrames) base.copy(cause = "too_large")
    else {
      var sumSq = 0.0
      var peak = 0L
      var n = 0L
      var i = w.dataOff
      val end = w.dataOff + w.dataBytes
      while (i + 2 <= end) {
        val s = ((p(i + 1) << 8) | (p(i) & 0xff)).toShort
        sumSq += s.toDouble * s.toDouble
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        n += 1
        i += 2
      }
      val frames = n / w.ch
      if (frames < w.declaredFrames)
        base.copy(cause = "truncated", n_frames = Some(frames))
      else base.copy(cause = "ok", n_frames = Some(frames),
        rms = Some(
          if (n == 0) 0L else math.sqrt(sumSq / n).toLong),
        peak = Some(peak))
    }
  }

  /** WAV-encode a constant-amplitude 16-bit mono PCM clip (the
    * deterministic fixture builder: WAV is lossless PCM, so decode
    * returns exactly (rate, 1 channel, 16 bits, n frames, rms =
    * |amplitude|, peak = |amplitude|) — every decoded feature is pure
    * arithmetic of the parameters). Executor-safe: pure function.
    */
  def encodeConstWav(rate: Int, nFrames: Int, amplitude: Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      pcm(2 * i) = (amplitude & 0xff).toByte
      pcm(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 1
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One audio payload's perceptual-hash outcome ([[audioDHash]]);
    * `cause` routes as [[AudioDecode]] plus `too_short` (fewer frames
    * than one per comparison window — no meaningful envelope exists).
    */
  final case class AudioHash(
      media_id: Long,
      cause: String,
      sample_rate: Option[Int],
      channels: Option[Int],
      n_frames: Option[Long],
      /** frames per energy window actually used (⌊n/(bits+1)⌋) */
      window_frames: Option[Long],
      /** bit i set iff energy(window i) > energy(window i+1) — the
        * difference hash over the clip's energy envelope
        */
      dhash: Option[Long])

  /** REAL audio perceptual hashing for clip near-dup detection: decode
    * PCM via `javax.sound.sampled` (the [[decodeAudio]] plumbing —
    * per-cause routing, 16-bit gate, `maxFrames` guard), split the
    * frame stream into `bits + 1` equal energy windows (sum of |sample|
    * across channels; the remainder tail is ignored), and emit the
    * difference hash — bit i set iff window i's energy exceeds window
    * i+1's. The audio twin of [[imageDHash]]: comparisons survive
    * uniform GAIN (scaling every sample scales every window sum),
    * lossless re-encode and container conversion, while a payload md5
    * breaks on any byte change. Pair generation is
    * [[graft.operators.dedup.Dedup.hammingPairs]] over `dhash` —
    * banded 16-bit blocking, never all-pairs; silence/constant-tone
    * clips hash to 0 and collapse buckets, so exclude them the way
    * shingle-less documents are (the standard skew contract).
    *
    * Streaming passes through a reusable buffer (constant memory); a
    * reader that reports UNKNOWN frame length pays one extra counting
    * pass over the in-memory payload before the windowed pass.
    */
  def audioDHash(media: Dataset[MediaRow], bits: Int = 64,
      maxFrames: Long = 1L << 32): Dataset[AudioHash] = {
    require(bits >= 1 && bits <= 64, "dhash bits must fit one long")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => audioDHashOne(r, bits, maxFrames))
    }
  }

  /** One payload's envelope hash — the shared core under [[audioDHash]]
    * and [[graft.streaming.StreamImageDedup]]'s audio path.
    */
  private[graft] def audioDHashOne(r: MediaRow, bits: Int,
      maxFrames: Long): AudioHash = {
    val none = AudioHash(r.media_id, "", None, None, None, None, None)
    if (r.payload == null || r.payload.isEmpty) none.copy(cause = "empty")
    else wav16Fast(r.payload) match {
      case Some(w) => audioDHashFast(none, r.payload, w, bits, maxFrames)
      case None =>
          try {
            val probe = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val fmt = probe.getFormat
            val (rate, ch, depth) = (fmt.getSampleRate.toInt,
              fmt.getChannels, fmt.getSampleSizeInBits)
            val declared = probe.getFrameLength
            val base = none.copy(sample_rate = Some(rate),
              channels = Some(ch))
            if (declared >= 0 && declared > maxFrames) {
              probe.close(); base.copy(cause = "too_large")
            } else if (depth != 16) {
              probe.close()
              base.copy(cause = "unsupported_depth",
                n_frames = if (declared >= 0) Some(declared) else None)
            } else {
              // window sizing needs the frame count up front: trust the
              // header when it speaks (verified during the windowed
              // pass), pay one counting pass when it does not
              val n =
                if (declared >= 0) { probe.close(); declared }
                else {
                  // overflow-safe byte cap (a huge maxFrames must mean
                  // "unbounded", not a wrapped-negative instant stop)
                  val capBytes =
                    if (maxFrames >= Long.MaxValue / (2L * ch))
                      Long.MaxValue
                    else maxFrames * 2L * ch
                  var c = 0L
                  val buf = new Array[Byte](8192)
                  var read = probe.read(buf)
                  while (read > 0 && c <= capBytes) {
                    c += read; read = probe.read(buf)
                  }
                  probe.close()
                  c / (2L * ch)
                }
              if (n > maxFrames) base.copy(cause = "too_large")
              else {
                val win = n / (bits + 1)
                if (win == 0L)
                  base.copy(cause = "too_short", n_frames = Some(n))
                else {
                  val in = javax.sound.sampled.AudioSystem
                    .getAudioInputStream(
                      new java.io.ByteArrayInputStream(r.payload))
                  try {
                    val sums = new Array[Long](bits + 1)
                    val hashedFrames = win * (bits + 1)
                    val frameBytes = in.getFormat.getFrameSize
                    val big = in.getFormat.isBigEndian
                    val buf = new Array[Byte](8192 - 8192 % frameBytes)
                    var nSamples = 0L
                    var read = in.read(buf)
                    while (read > 0) {
                      var i = 0
                      while (i + 1 < read) {
                        val s =
                          if (big)
                            ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                          else
                            ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                        val frame = nSamples / ch
                        if (frame < hashedFrames)
                          sums((frame / win).toInt) += math.abs(s.toLong)
                        nSamples += 1
                        i += 2
                      }
                      read = in.read(buf)
                    }
                    val frames = nSamples / ch
                    if (frames < n)
                      base.copy(cause = "truncated", n_frames = Some(frames))
                    else {
                      var h = 0L
                      var b = 0
                      while (b < bits) {
                        if (sums(b) > sums(b + 1)) h |= 1L << b
                        b += 1
                      }
                      base.copy(cause = "ok", n_frames = Some(frames),
                        window_frames = Some(win), dhash = Some(h))
                    }
                  } finally in.close()
                }
              }
            }
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              none.copy(cause = "no_reader")
            case scala.util.control.NonFatal(_) =>
              none.copy(cause = "decode_failed")
          }
    }
  }

  // array-direct twin of audioDHashOne's streaming passes: declared
  // frames size the windows (verified by the count), one pass, same
  // envelope arithmetic
  private def audioDHashFast(none: AudioHash, p: Array[Byte], w: Wav16,
      bits: Int, maxFrames: Long): AudioHash = {
    val base = none.copy(sample_rate = Some(w.rate),
      channels = Some(w.ch))
    if (w.declaredFrames > maxFrames) base.copy(cause = "too_large")
    else {
      val n = w.declaredFrames
      val win = n / (bits + 1)
      if (win == 0L) base.copy(cause = "too_short", n_frames = Some(n))
      else {
        val sums = new Array[Long](bits + 1)
        val hashedFrames = win * (bits + 1)
        var nSamples = 0L
        var i = w.dataOff
        val end = w.dataOff + w.dataBytes
        while (i + 2 <= end) {
          val s = ((p(i + 1) << 8) | (p(i) & 0xff)).toShort
          val frame = nSamples / w.ch
          if (frame < hashedFrames)
            sums((frame / win).toInt) += math.abs(s.toLong)
          nSamples += 1
          i += 2
        }
        val frames = nSamples / w.ch
        if (frames < n)
          base.copy(cause = "truncated", n_frames = Some(frames))
        else {
          var h = 0L
          var b = 0
          while (b < bits) {
            if (sums(b) > sums(b + 1)) h |= 1L << b
            b += 1
          }
          base.copy(cause = "ok", n_frames = Some(frames),
            window_frames = Some(win), dhash = Some(h))
        }
      }
    }
  }

  /** One fixed-length audio segment's fingerprint ([[audioSegments]]);
    * non-`ok` payloads yield a single routing row with `seg_idx = -1`.
    */
  final case class AudioSegment(
      media_id: Long,
      cause: String,
      seg_idx: Int,
      dhash: Option[Long])

  /** Fixed-length segment fingerprints for audio ALIGNMENT: the PCM
    * stream splits into consecutive `segFrames`-frame segments, each
    * hashed independently by the [[audioDHash]] envelope construction
    * (bits+1 windows of `segFrames div (bits+1)` frames; the per-
    * segment remainder is ignored). One row per COMPLETE segment —
    * feeding [[clipAlignment]] as (`id`, `seg_idx` → frame_idx, `sh`)
    * finds sub-recordings at their offset exactly as video frames do,
    * and each segment hash inherits the envelope hash's gain
    * invariance. A payload CUT mid-segment still yields every complete
    * segment it carries (the partial tail cannot produce a stable
    * fingerprint and is dropped — the movi-clamp philosophy: truncation
    * must not hide intact content); a payload with no complete segment
    * routes to `too_short`. Single streaming pass, constant memory
    * (bits+2 longs of state); `maxFrames` guards as in [[audioDHash]].
    */
  def audioSegments(media: Dataset[MediaRow], segFrames: Long,
      bits: Int = 64,
      maxFrames: Long = 1L << 32): Dataset[AudioSegment] = {
    require(bits >= 1 && bits <= 64, "dhash bits must fit one long")
    require(segFrames >= bits + 1, "a segment needs one frame per window")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => audioSegmentsOne(r, segFrames, bits, maxFrames))
    }
  }

  private[graft] def audioSegmentsOne(r: MediaRow, segFrames: Long,
      bits: Int, maxFrames: Long): Seq[AudioSegment] = {
    def one(cause: String) =
      Seq(AudioSegment(r.media_id, cause, -1, None))
    if (r.payload == null || r.payload.isEmpty) one("empty")
    else wav16Fast(r.payload) match {
      case Some(w) =>
        audioSegmentsFast(r.media_id, r.payload, w, segFrames, bits,
          maxFrames)
      case None =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val fmt = in.getFormat
          val ch = fmt.getChannels
          val declared = in.getFrameLength
          if (declared >= 0 && declared > maxFrames) one("too_large")
          else if (fmt.getSampleSizeInBits != 16) one("unsupported_depth")
          else {
            val winFrames = segFrames / (bits + 1)
            val hashedFrames = winFrames * (bits + 1)
            val capSamples =
              if (maxFrames >= Long.MaxValue / ch) Long.MaxValue
              else maxFrames * ch
            val frameBytes = fmt.getFrameSize
            val big = fmt.isBigEndian
            val buf = new Array[Byte](8192 - 8192 % frameBytes)
            val sums = new Array[Long](bits + 1)
            val segs = scala.collection.mutable.ArrayBuffer
              .empty[AudioSegment]
            def emit(segIdx: Long): Unit = {
              var h = 0L
              var b = 0
              while (b < bits) {
                if (sums(b) > sums(b + 1)) h |= 1L << b
                b += 1
              }
              segs += AudioSegment(r.media_id, "ok", segIdx.toInt, Some(h))
              java.util.Arrays.fill(sums, 0L)
            }
            var curSeg = 0L
            var nSamples = 0L
            var over = false
            var read = in.read(buf)
            while (read > 0 && !over) {
              var i = 0
              while (i + 1 < read && !over) {
                val s =
                  if (big) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                  else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                val f = nSamples / ch
                val seg = f / segFrames
                if (seg != curSeg) { emit(curSeg); curSeg = seg }
                val fs = f - seg * segFrames
                if (fs < hashedFrames) sums((fs / winFrames).toInt) +=
                  math.abs(s.toLong)
                nSamples += 1
                if (nSamples > capSamples) over = true
                i += 2
              }
              if (!over) read = in.read(buf)
            }
            if (over) one("too_large")
            else {
              // the final segment is complete only if the stream reached
              // its last frame
              if (nSamples / ch >= (curSeg + 1) * segFrames) emit(curSeg)
              if (segs.isEmpty) one("too_short") else segs.toSeq
            }
          }
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          one("no_reader")
        case scala.util.control.NonFatal(_) => one("decode_failed")
      }
    }
  }

  // array-direct twin of audioSegmentsOne's streaming pass: same
  // segment/window assignment, same complete-segments-only contract
  private def audioSegmentsFast(mediaId: Long, p: Array[Byte], w: Wav16,
      segFrames: Long, bits: Int, maxFrames: Long): Seq[AudioSegment] = {
    def one(cause: String) = Seq(AudioSegment(mediaId, cause, -1, None))
    if (w.declaredFrames > maxFrames) one("too_large")
    else {
      val winFrames = segFrames / (bits + 1)
      val hashedFrames = winFrames * (bits + 1)
      val sums = new Array[Long](bits + 1)
      val segs = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
      def emit(segIdx: Long): Unit = {
        var h = 0L
        var b = 0
        while (b < bits) {
          if (sums(b) > sums(b + 1)) h |= 1L << b
          b += 1
        }
        segs += AudioSegment(mediaId, "ok", segIdx.toInt, Some(h))
        java.util.Arrays.fill(sums, 0L)
      }
      var curSeg = 0L
      var nSamples = 0L
      var i = w.dataOff
      val end = w.dataOff + w.dataBytes
      while (i + 2 <= end) {
        val s = ((p(i + 1) << 8) | (p(i) & 0xff)).toShort
        val f = nSamples / w.ch
        val seg = f / segFrames
        if (seg != curSeg) { emit(curSeg); curSeg = seg }
        val fs = f - seg * segFrames
        if (fs < hashedFrames)
          sums((fs / winFrames).toInt) += math.abs(s.toLong)
        nSamples += 1
        i += 2
      }
      if (nSamples / w.ch >= (curSeg + 1) * segFrames) emit(curSeg)
      if (segs.isEmpty) one("too_short") else segs.toSeq
    }
  }

  /** [[encodeStepWav]] segments concatenated back-to-back — segment i's
    * [[audioSegments]] fingerprint (at `segFrames = framesPerWindow ·
    * (bits + 1)`) is exactly `keys(i)`: the amplitude walk resets to
    * `base` at each segment start, so segments hash independently.
    * Executor-safe: pure function.
    */
  def encodeSegmentsWav(keys: Seq[Long], framesPerWindow: Int = 4,
      rate: Int = 8000, bits: Int = 64, base: Int = 2000,
      step: Int = 16): Array[Byte] = {
    require(framesPerWindow >= 1 && bits >= 1 && bits <= 64 && step > 0)
    require(base - bits * step > 0 && base + bits * step <= 32767,
      "amplitude walk must stay inside (0, 32767]")
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val segFrames = framesPerWindow * (bits + 1)
    val pcm = stepPcm(keys, framesPerWindow, bits, base, step)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      (keys.length * segFrames).toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The raw little-endian PCM of [[encodeSegmentsWav]]'s amplitude
    * walk, one segment per key — for fixtures that carry the pattern
    * inside another container (the AVI audio stream).
    */
  def stepPcm(keys: Seq[Long], framesPerWindow: Int = 4, bits: Int = 64,
      base: Int = 2000, step: Int = 16): Array[Byte] = {
    val segFrames = framesPerWindow * (bits + 1)
    val pcm = new Array[Byte](keys.length * segFrames * 2)
    var i = 0
    keys.foreach { key =>
      var a = base
      var w = 0
      while (w <= bits) {
        var f = 0
        while (f < framesPerWindow) {
          pcm(2 * i) = (a & 0xff).toByte
          pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
          f += 1
          i += 1
        }
        if (w < bits)
          a += (if (((key >>> w) & 1L) == 1L) -step else step)
        w += 1
      }
    }
    pcm
  }

  /** WAV-encode a stepped-amplitude 16-bit mono PCM clip: `bits + 1`
    * windows of `framesPerWindow` constant-amplitude frames, the
    * amplitude starting at `base` and stepping −`step` where the
    * corresponding key bit is set (making window i's energy exceed
    * window i+1's) and +`step` where clear — [[encodePathPng]]'s
    * construction on the energy envelope, `base ± bits·step` staying
    * strictly inside (0, 32767] so no step clips or crosses zero.
    * [[audioDHash]] of the result is exactly `key` by pure arithmetic,
    * for ANY (base, step) — which is the gain-invariance witness:
    * doubling both is a uniform 2× gain. Executor-safe: pure function.
    */
  def encodeStepWav(key: Long, framesPerWindow: Int = 4,
      rate: Int = 8000, bits: Int = 64, base: Int = 2000,
      step: Int = 16): Array[Byte] = {
    require(framesPerWindow >= 1 && bits >= 1 && bits <= 64 && step > 0)
    require(base - bits * step > 0 && base + bits * step <= 32767,
      "amplitude walk must stay inside (0, 32767]")
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val n = framesPerWindow * (bits + 1)
    val pcm = new Array[Byte](n * 2)
    var a = base
    var w = 0
    var i = 0
    while (w <= bits) {
      var f = 0
      while (f < framesPerWindow) {
        pcm(2 * i) = (a & 0xff).toByte
        pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
        f += 1
        i += 1
      }
      if (w < bits)
        a += (if (((key >>> w) & 1L) == 1L) -step else step)
      w += 1
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One video payload's decode outcome. `cause` routes every row (the
    * [[decodeImages]] discipline — nothing silently dropped): `ok`,
    * `empty`, `no_reader` (not a RIFF/AVI container), `no_video_stream`
    * (a well-formed AVI with no `vids` stream), `unsupported_codec`
    * (an inter-frame codec the JDK cannot decode — header facts are
    * still reported so a crawl's codec mix is measurable),
    * `unsupported_depth` (BI_RGB at a biBitCount other than the 24bpp
    * BGR / 32bpp BGRX layouts the raster pass reads — 8bpp paletted or
    * 16bpp bitfields would otherwise decode to confidently-wrong
    * features; header facts intact),
    * `too_large` (header dimensions exceed the pixel guard),
    * `truncated` (a frame chunk or chunk header runs past the payload,
    * or the container closes with fewer frame chunks than the stream
    * header declares) and `decode_failed` (a claimed frame's bytes are
    * broken).
    */
  final case class VideoDecode(
      media_id: Long,
      cause: String,
      /** `raw` (BI_RGB DIB), `mjpeg`, or the stream's fourcc for
        * unsupported codecs
        */
      codec: Option[String],
      width: Option[Int],
      height: Option[Int],
      /** frame chunks actually present in the container */
      n_frames: Option[Long],
      /** frames the `vids` stream header declares */
      declared_frames: Option[Long],
      /** stream frame rate ×1000 (strh dwRate·1000/dwScale) */
      fps_milli: Option[Long],
      /** declared_frames × µs-per-frame (avih) / 1000 */
      duration_ms: Option[Long],
      /** frames actually pixel-decoded (stride/cap sampling) */
      sampled_frames: Option[Int],
      /** mean of (R+G+B)·1000/3 over all sampled frames' pixels — the
        * [[ImageDecode]] luminance on the sampled frame set
        */
      mean_rgb_milli: Option[Long],
      /** CRC32 over the sampled frames' row-major ARGB pixel streams,
        * frames in sample order — the content fingerprint
        */
      pixel_crc: Option[Long])

  /** REAL video decode for the JDK-feasible subset: the RIFF/AVI
    * container parsed byte-by-byte (header-true dimensions, frame rate,
    * declared length), frames pixel-decoded when the stream is
    * uncompressed BI_RGB (raw bottom-up DIB rows — decoded natively) or
    * MJPEG (every frame chunk is a standalone JPEG — `javax.imageio`,
    * the [[decodeImages]] path per frame). Iterator→iterator per
    * partition, constant memory: the container is walked positionally
    * (no allocation per chunk), and only SAMPLED frames materialize a
    * raster.
    *
    * Sampling is the scale guard for the frame pass: every `stride`-th
    * frame chunk decodes, up to `maxSampledFrames` — a 10k-frame clip
    * costs `maxSampledFrames` raster decodes, never 10k. `maxPixels` is
    * the [[decodeImages]] decompression-bomb guard on the HEADER
    * dimensions (checked before any frame decode). Inter-frame codecs
    * route to `unsupported_codec` with header facts intact — the JDK
    * ships no such codec (environment-blocked the way Kafka runtime
    * is), and a pipeline wants the codec census anyway before paying
    * for an external decoder.
    */
  def decodeVideo(media: Dataset[MediaRow],
      maxPixels: Long = 64L * 1024 * 1024,
      stride: Int = 1,
      maxSampledFrames: Int = 32): Dataset[VideoDecode] = {
    require(stride >= 1 && maxSampledFrames >= 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(r => decodeOneVideo(r, maxPixels, stride, maxSampledFrames))
    }
  }

  // single-payload AVI feature decode: the shared walk with a streaming
  // mean/crc sink — executor-side, one sampled raster live at a time
  private def decodeOneVideo(r: MediaRow, maxPixels: Long, stride: Int,
      maxSampledFrames: Int): VideoDecode = {
    var sum = 0L
    var pixels = 0L
    val crc = new java.util.zip.CRC32()
    val crcBuf = new Array[Byte](4)
    val vd = walkOneVideo(r, maxPixels, stride, maxSampledFrames) { img =>
      val fw = img.getWidth; val fh = img.getHeight
      var y = 0
      while (y < fh) {
        var x = 0
        while (x < fw) {
          val px = img.getRGB(x, y)
          sum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
          crcBuf(0) = (px >>> 24).toByte
          crcBuf(1) = (px >>> 16).toByte
          crcBuf(2) = (px >>> 8).toByte
          crcBuf(3) = px.toByte
          crc.update(crcBuf)
          x += 1
        }
        y += 1
      }
      pixels += fw.toLong * fh
    }
    if (vd.cause == "ok" && pixels > 0)
      vd.copy(mean_rgb_milli = Some(sum * 1000L / (3L * pixels)),
        pixel_crc = Some(crc.getValue))
    else vd
  }

  /** The shared RIFF/AVI walk under [[decodeVideo]] and [[videoDHash]]:
    * parse the container (header facts, per-cause routing, frame
    * counting) and hand each SAMPLED frame to `sink` as a decoded
    * raster in VISUAL orientation (bottom-up/top-down DIB rows
    * normalized; MJPEG chunks via `javax.imageio`). Returns the
    * header/count facts with the raster-derived feature fields left
    * empty — callers derive those from the rasters they saw. One
    * sampled raster is live at a time, bounded by `maxPixels` — the
    * [[decodeImages]] memory posture.
    */
  private def walkOneVideo(r: MediaRow, maxPixels: Long, stride: Int,
      maxSampledFrames: Int)(
      sink: java.awt.image.BufferedImage => Unit): VideoDecode = {
    val none = VideoDecode(r.media_id, "", None, None, None, None, None,
      None, None, None, None, None)
    val p = r.payload
    if (p == null || p.isEmpty) return none.copy(cause = "empty")
    def u32(off: Int): Long =
      if (off + 4 > p.length) -1L
      else ((p(off) & 0xffL)) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      if (off + 4 > p.length) ""
      else new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return none.copy(cause = "no_reader")

    // header walk: avih (global header) + the first vids strh/strf pair.
    // Streams are NUMBERED by their strl's position among all strl
    // LISTs (frame chunks are "NNdc"/"NNdb"), so the walk counts strh
    // chunks to learn WHICH stream the vids one is — an AVI muxed with
    // audio first carries its video frames as "01dc", not "00dc"
    var usecPerFrame = -1L
    var avihW = -1L; var avihH = -1L
    var rate = -1L; var scale = -1L; var declared = -1L
    var compression = -1L // vids strf biCompression
    var bitCount = -1L    // vids strf biBitCount (raw depth gate)
    var topDown = false   // vids strf biHeight < 0 (row order)
    var streamIdx = -1    // position of the vids strh among all strh
    var strhSeen = 0
    var moviStart = -1; var moviEnd = -1L
    var truncated = false
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var pos = start
      var lastStrhVids = false
      while (pos + 8 <= end && !truncated) {
        val fc = fourcc(pos)
        val sz = u32(pos + 4)
        val dataOff = pos + 8
        // a movi LIST whose declared size overruns the payload still
        // yields its complete frames — the frame pass clamps and flags;
        // any OTHER overrun is a cut header and fails the walk here
        if (sz >= 0 && fc == "LIST" && fourcc(dataOff) == "movi") {
          moviStart = dataOff + 4; moviEnd = dataOff.toLong + sz
          pos = (dataOff.toLong + sz + (sz & 1)).min(Int.MaxValue.toLong).toInt
        } else if (sz < 0 || pos + 8 + sz > end) { truncated = true }
        else {
          fc match {
            case "LIST" =>
              if (depth < 4) walk(dataOff + 4, dataOff + sz.toInt, depth + 1)
            case "avih" if sz >= 40 =>
              usecPerFrame = u32(dataOff)
              avihW = u32(dataOff + 32); avihH = u32(dataOff + 36)
            case "strh" =>
              // EVERY strh advances the stream number — frame chunks
              // are "NNdc" where NN is the strl's position among ALL
              // streams, so skipping a nonstandard-short strh (sz < 36)
              // would desync the numbering and miss every video frame
              // of the streams after it. Only a full-size vids strh can
              // CLAIM the video stream (its rate/scale/length fields
              // must exist to be read).
              lastStrhVids = sz >= 4 && fourcc(dataOff) == "vids"
              if (lastStrhVids && rate < 0 && sz >= 36) {
                streamIdx = strhSeen
                scale = u32(dataOff + 20); rate = u32(dataOff + 24)
                declared = u32(dataOff + 32)
              }
              strhSeen += 1
            case "strf" if sz >= 40 =>
              if (lastStrhVids && compression < 0) {
                compression = u32(dataOff + 16)
                bitCount = u32(dataOff + 14) & 0xffffL // 16-bit biBitCount
                val bh = u32(dataOff + 8).toInt // signed biHeight
                topDown = bh < 0
                // BITMAPINFOHEADER dims beat avih's when present
                if (avihW <= 0) avihW = u32(dataOff + 4)
                if (avihH <= 0) avihH = math.abs(bh).toLong
              }
            case _ => ()
          }
          pos = dataOff + sz.toInt + (sz.toInt & 1)
        }
      }
    }
    walk(12, p.length, 0)
    if (rate < 0 && usecPerFrame < 0)
      return none.copy(cause = if (truncated) "truncated" else "no_video_stream")
    if (rate < 0) return none.copy(cause = "no_video_stream")

    val codecName =
      if (compression == 0L) "raw"
      else {
        val s = new String(Array[Byte](
          (compression & 0xff).toByte, ((compression >> 8) & 0xff).toByte,
          ((compression >> 16) & 0xff).toByte,
          ((compression >> 24) & 0xff).toByte),
          java.nio.charset.StandardCharsets.US_ASCII)
        if (s.equalsIgnoreCase("MJPG")) "mjpeg" else s.trim.toLowerCase
      }
    val w = avihW.toInt; val h = avihH.toInt
    val fpsMilli = if (scale > 0) Some(rate * 1000L / scale) else None
    val durationMs =
      if (usecPerFrame > 0 && declared >= 0)
        Some(declared * usecPerFrame / 1000L)
      else None
    val base = none.copy(codec = Some(codecName), width = Some(w),
      height = Some(h), declared_frames = Some(declared),
      fps_milli = fpsMilli, duration_ms = durationMs)
    if (w <= 0 || h <= 0) return base.copy(cause = "decode_failed")
    if (w.toLong * h > maxPixels) return base.copy(cause = "too_large")
    if (codecName != "raw" && codecName != "mjpeg")
      return base.copy(cause = "unsupported_codec")
    // the raw raster pass below reads BGR(X) pixels at 24 or 32bpp (the
    // two uncompressed layouts in the wild); any other BI_RGB depth
    // (8bpp paletted, 16bpp bitfields) would decode to confidently-
    // wrong features — route it with header facts intact
    if (codecName == "raw" && bitCount != 24 && bitCount != 32)
      return base.copy(cause = "unsupported_depth")
    if (moviStart < 0)
      return base.copy(cause = if (truncated) "truncated" else "no_video_stream")

    // frame pass over the movi list: count every frame chunk of the
    // VIDS stream (its index learned in the header walk — "NNdc"/"NNdb"
    // where NN is the stream number), raster-decode the sampled subset
    val framePrefix = f"$streamIdx%02d"
    val bpp = if (bitCount == 32) 4 else 3 // raw layouts: BGR / BGRX
    val rowBytes = (w * bpp + 3) & ~3
    var nFrames = 0L
    var sampled = 0
    var decodeFailed = false
    var pos = moviStart
    // clamp: a movi list declaring more bytes than the payload carries
    // still yields its complete frames, then flags truncation below.
    // The frame pass keeps its OWN cut flag: a header-walk truncation
    // (e.g. a trailing idx1 index cut after movi) must not veto frame
    // counting — every frame chunk inside movi is still intact
    var frameCut = false
    val end = math.min(moviEnd, p.length.toLong).toInt
    val moviCut = moviEnd > p.length
    while (pos + 8 <= end && !frameCut && !decodeFailed) {
      val fc = fourcc(pos)
      val sz = u32(pos + 4)
      if (sz < 0 || pos + 8 + sz > end) frameCut = true
      else {
        val dataOff = pos + 8
        val isFrame = fc.length == 4 && fc.startsWith(framePrefix) &&
          (fc.endsWith("dc") || fc.endsWith("db"))
        if (isFrame) {
          val takeIt = nFrames % stride == 0 && sampled < maxSampledFrames
          nFrames += 1
          if (takeIt) {
            if (codecName == "raw") {
              if (sz < rowBytes.toLong * h) decodeFailed = true
              else {
                // BGR rows stored bottom-up (positive biHeight) or
                // top-down (negative); materialize in VISUAL top-down
                // order either way so sinks see the image, not the
                // storage layout
                val img = new java.awt.image.BufferedImage(w, h,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                var yv = 0
                while (yv < h) {
                  val row =
                    dataOff + (if (topDown) yv else h - 1 - yv) * rowBytes
                  var x = 0
                  while (x < w) {
                    val b = p(row + bpp * x) & 0xff
                    val g = p(row + bpp * x + 1) & 0xff
                    val red = p(row + bpp * x + 2) & 0xff
                    img.setRGB(x, yv, (red << 16) | (g << 8) | b)
                    x += 1
                  }
                  yv += 1
                }
                sink(img)
                sampled += 1
              }
            } else { // mjpeg: the chunk is a standalone JPEG
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(p, dataOff, sz.toInt))
                if (img == null) decodeFailed = true
                else {
                  sink(img)
                  sampled += 1
                }
              } catch {
                case scala.util.control.NonFatal(_) => decodeFailed = true
              }
            }
          }
        }
        pos = dataOff + sz.toInt + (sz.toInt & 1)
      }
    }
    if (decodeFailed) base.copy(cause = "decode_failed",
      n_frames = Some(nFrames))
    else if (truncated || frameCut || moviCut ||
        (declared >= 0 && nFrames < declared))
      base.copy(cause = "truncated", n_frames = Some(nFrames))
    else base.copy(cause = "ok", n_frames = Some(nFrames),
      sampled_frames = Some(sampled))
  }

  /** One clip's perceptual-hash outcome ([[videoDHash]]); `cause`,
    * header facts and frame counts route exactly as [[VideoDecode]].
    */
  final case class VideoHash(
      media_id: Long,
      cause: String,
      codec: Option[String],
      width: Option[Int],
      height: Option[Int],
      n_frames: Option[Long],
      sampled_frames: Option[Int],
      /** per-sampled-frame difference hash ([[imageDHash]] bit layout),
        * in sample order — the sequence fingerprint for alignment-aware
        * matching
        */
      frame_dhash: Option[Seq[Long]],
      /** strict-majority vote per bit over `frame_dhash` — the single
        * 64-bit clip fingerprint
        * [[graft.operators.dedup.Dedup.hammingPairs]] pairs on. Majority
        * voting is what makes the fingerprint robust to a minority of
        * divergent frames (an inserted intro/outro card, a re-encode
        * artifact burst): as long as more than half the sampled frames
        * agree on a bit, the clip hash keeps it
        */
      clip_dhash: Option[Long])

  /** REAL video perceptual hashing for clip near-dup detection: the
    * [[decodeVideo]] container walk (same per-cause routing, sampling
    * and bomb guards), each sampled frame reduced to its 64-bit
    * difference hash via the [[imageDHash]] core, and the clip
    * fingerprinted by a strict per-bit majority over the sampled
    * frames. Pair generation is [[graft.operators.dedup.Dedup
    * .hammingPairs]] over `clip_dhash` — banded 16-bit blocking, never
    * all-pairs, the image/SimHash discipline; a clip that survives
    * re-encode, container rewrap or uniform brightness shift fingerprints
    * identically because each FRAME's dHash does. At 100 TB the hash
    * pass is a stateless per-partition map (scales with executors) and
    * the pair stage an equi-join on 16-bit buckets, with the usual skew
    * contract (solid/black clips collapse buckets — exclude them the
    * way shingle-less documents are excluded).
    */
  def videoDHash(media: Dataset[MediaRow], hashW: Int = 8, hashH: Int = 8,
      stride: Int = 1, maxSampledFrames: Int = 32,
      maxPixels: Long = 64L * 1024 * 1024): Dataset[VideoHash] = {
    require(hashW >= 1 && hashW <= 8 && hashH >= 1 && hashH <= 8,
      "dhash bits must fit one long")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(r => clipDHashOne(r, hashW, hashH, stride,
        maxSampledFrames, maxPixels))
    }
  }

  /** Alignment-aware clip containment over per-frame hash sequences —
    * the sub-clip detector the majority fingerprint cannot be: a short
    * clip cut out of a longer one (or re-posted with an intro) matches
    * frame-for-frame at one OFFSET, and that diagonal structure is what
    * this measures. Input: one row per sampled frame (`id`, `frame_idx`,
    * `sh` — [[videoDHash]]'s `frame_dhash` exploded; ids non-negative
    * with `id · maxFrames` fitting a long — the (clip, frame) packing
    * the shared join primitive rides on — and `frame_idx < maxFrames`). Output, per ORDERED pair of distinct
    * clips with ≥1 frame match: `id_a, id_b, frames_a, aligned, offset,
    * containment_pm` where `aligned` is the largest number of a's
    * frames matching b's at one common offset (ties → smallest offset)
    * and `containment_pm = aligned·1000 div frames_a` — 1000‰ means
    * every frame of a appears in b in order at that offset.
    *
    * Frame matching at `maxHamming = 0` IS an exact equi-join on the
    * hash — no banding (whose chunk buckets a constant-zero bit range,
    * e.g. the high 16 bits of a 48-bit portable hash, would degenerate
    * to one all-rows bucket and an n² join); fuzzy matching goes
    * through the shared banded primitive
    * ([[graft.operators.dedup.Dedup.hammingJoin]] on (clip, frame)
    * packed keys — never all-pairs; pick `chunks` to fit the hash
    * width exactly as [[graft.operators.dedup.Dedup.hammingPairs]]
    * callers do). Aggregation cost tracks the MATCH volume: one
    * groupBy on (a, b, offset), one per-pair window over the distinct
    * diagonals — at 100 TB both are bounded by true frame-level
    * duplication, not corpus size². The input frame table is consumed
    * three times (both join sides + the per-clip frame count) — persist
    * it when its lineage is expensive (a real decode), exactly as
    * [[graft.operators.dedup.Dedup.simhashPairs]] hoists its sketches.
    */
  def clipAlignment(frames: DataFrame, maxHamming: Int = 0,
      chunks: Int = 4, maxFrames: Int = 4096): DataFrame = {
    require(maxFrames >= 1)
    val packed = frames.select(
      (col("id") * maxFrames + col("frame_idx")).as("id"), col("sh"))
    val m =
      if (maxHamming == 0)
        packed.as("a").join(packed.as("b"), col("a.sh") === col("b.sh"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      else graft.operators.dedup.Dedup.hammingJoin(
          packed, packed, maxHamming, chunks)
        .select(col("id_a"), col("id_b"))
    val na = frames.groupBy(col("id"))
      .agg(count(lit(1)).as("frames_a"))
    bestAlignment(m, na, maxFrames)
  }

  /** The diagonal-voting tail [[clipAlignment]] and the incremental
    * store delta ([[graft.operators.dedup.MediaStore.ingestClips]])
    * share: from a PACKED frame-match set `m` (id_a, id_b — both
    * `clip * maxFrames + frame_idx`, BOTH orientations present for
    * every clip pair) and per-clip frame counts `counts` (id,
    * frames_a + any carried columns, e.g. kind), vote the best offset
    * per directed clip pair and emit (id_a, id_b, frames_a, aligned,
    * offset, containment_pm, carried…). Aggregation cost tracks the
    * match volume — true frame-level duplication, never corpus².
    */
  private[graft] def bestAlignment(m: DataFrame, counts: DataFrame,
      maxFrames: Int): DataFrame = {
    val a = expr(s"id_a div $maxFrames")
    val b = expr(s"id_b div $maxFrames")
    val diag = (col("id_b") % maxFrames) - (col("id_a") % maxFrames)
    val byDiag = m.where(a =!= b)
      .select(a.as("ca"), b.as("cb"), diag.as("offset"))
      .groupBy("ca", "cb", "offset").agg(count(lit(1)).as("aligned"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ca", "cb")
      .orderBy(col("aligned").desc, col("offset").asc)
    val best = byDiag.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val carried = counts.columns.toSeq
      .filter(c => c != "id" && c != "frames_a")
    best.join(counts, col("ca") === col("id"))
      .select(Seq(col("ca").as("id_a"), col("cb").as("id_b"),
        col("frames_a"), col("aligned"), col("offset"),
        expr("aligned * 1000 div frames_a").as("containment_pm")) ++
        carried.map(col): _*)
  }

  /** Sub-clip containment PURGE: [[clipAlignment]] composed into a
    * release decision the way text containment feeds the release
    * pipeline — a clip whose best alignment leaves it
    * ≥ `thresholdPm`-contained in ANOTHER clip is a duplicate candidate
    * (the cut-out re-post shape), candidates cluster through the shared
    * distributed CC, ONE keeper per cluster survives by quality (ties →
    * smallest id; pass frame/segment count as `q` so the longest upload
    * wins), and everything else purges.
    *
    * `frames`: (id, frame_idx, sh) — [[videoDHash]] frame hashes or
    * [[audioSegments]] rows; the operator is media-agnostic exactly
    * like the alignment it rides. `quality`: (id, q). Returns `corpus`
    * survivors (idCol + carried columns). Containment is DIRECTED
    * (aligned/frames_a), so the short re-post pairs with its source
    * even though the long side's own containment stays low — the pair
    * normalizes to one undirected edge for clustering.
    */
  def clipContainmentPurge(corpus: DataFrame, idCol: String,
      frames: DataFrame, quality: DataFrame, thresholdPm: Long = 800,
      maxHamming: Int = 0, chunks: Int = 4,
      maxFrames: Int = 4096): DataFrame =
    containmentPurgeTail(corpus, idCol,
      clipAlignment(frames, maxHamming, chunks, maxFrames),
      quality, thresholdPm)

  /** The release-decision tail [[clipContainmentPurge]] and the
    * incremental store purge
    * ([[graft.operators.dedup.MediaStore.purgeClips]]) share: threshold
    * the DIRECTED alignment rows, normalize to undirected edges,
    * cluster through the shared distributed CC, keep ONE winner per
    * cluster by quality (ties → smallest id), anti-join the losers out
    * of `corpus`.
    */
  private[graft] def containmentPurgeTail(corpus: DataFrame, idCol: String,
      alignment: DataFrame, quality: DataFrame,
      thresholdPm: Long): DataFrame = {
    import graft.operators.dedup.Dedup
    val pairs = alignment
      .where(col("containment_pm") >= thresholdPm)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    val cl = graft.ScratchCache.persist(Dedup.connectedComponents(pairs))
    val losers = cl
      .join(Dedup.clusterKeepers(cl, quality)
          .select(col("cluster"), col("keeper_id")), "cluster")
      .where(col("id") =!= col("keeper_id"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Shot-boundary detection over sampled frame hashes: the frames
    * whose dHash sits ≥ `minHamming` bits from the PREVIOUS sampled
    * frame — the standard cheap scene-change signal (a cut changes the
    * luma gradient field wholesale; motion within a shot barely moves
    * it). Feeds smarter frame sampling (keyframe-per-shot instead of
    * blind stride) and per-shot downstream features. Input is
    * [[videoDHash]]'s output; the first sampled frame is never a
    * boundary (no predecessor). Output: (media_id, frame_idx,
    * hamming_delta). One window per clip over its own sampled frames —
    * embarrassingly parallel at any corpus size.
    */
  def videoScenes(clips: Dataset[VideoHash],
      minHamming: Int = 16): DataFrame =
    hashCuts(clips.toDF().where(col("cause") === "ok")
        .select(col("media_id").as("id"),
          posexplode(col("frame_dhash")).as(Seq("frame_idx", "sh"))),
      minHamming)
      .withColumnRenamed("id", "media_id")

  /** The generic cut detector under [[videoScenes]] — works over ANY
    * ordered 64-bit hash sequence (id, frame_idx, sh): emit the
    * positions whose hash sits ≥ `minHamming` bits from the previous
    * one. Feeding [[audioSegments]] rows finds acoustic scene changes
    * (speaker turns, music↔speech) exactly as video frames find shot
    * cuts. One window per id; output (id, frame_idx, hamming_delta).
    */
  def hashCuts(rows: DataFrame, minHamming: Int): DataFrame = {
    require(minHamming >= 1 && minHamming <= 64)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("frame_idx")
    rows.withColumn("__prev", lag(col("sh"), 1).over(w))
      .where(col("__prev").isNotNull)
      .select(col("id"), col("frame_idx"),
        bit_count(col("sh").bitwiseXOR(col("__prev"))).cast("long")
          .as("hamming_delta"))
      .where(col("hamming_delta") >= minHamming)
  }

  /** One clip's demuxed audio track ([[demuxAudio]]). */
  final case class DemuxedAudio(
      media_id: Long,
      cause: String,
      sample_rate: Option[Int],
      channels: Option[Int],
      /** 16-bit PCM frames recovered from the audio stream's chunks */
      n_frames: Option[Long],
      /** the track re-wrapped as a canonical 16-bit PCM WAV — the
        * [[decodeAudio]] / [[audioDHash]] / [[audioSegments]] input
        * shape (the fast path reads it directly)
        */
      wav: Option[Array[Byte]])

  /** AVI audio-track DEMUX: video files carry their audio interleaved
    * as "NNwb" chunks of a separate stream; this walks the container
    * (the [[decodeVideo]] parser pointed at the first `auds` stream —
    * same stream-numbering discipline: EVERY strh advances the
    * number), concatenates the stream's chunk bytes, and re-wraps them
    * as a canonical WAV so the whole audio family composes downstream.
    * Only uncompressed 16-bit PCM demuxes (WAVEFORMAT wFormatTag 1 —
    * anything else routes to `unsupported_codec`/`unsupported_depth`
    * with header facts intact, the codec-census posture); a clip with
    * no auds stream routes to `no_audio_stream`, a cut chunk to
    * `truncated`. `maxBytes` bounds the assembled track (decompression-
    * bomb guard). Stateless per-partition map.
    */
  def demuxAudio(media: Dataset[MediaRow],
      maxBytes: Long = 1L << 30): Dataset[DemuxedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => demuxOneAudio(r, maxBytes)))
  }

  private def demuxOneAudio(r: MediaRow,
      maxBytes: Long): DemuxedAudio = {
    val none = DemuxedAudio(r.media_id, "", None, None, None, None)
    val p = r.payload
    if (p == null || p.isEmpty) return none.copy(cause = "empty")
    def u32(off: Int): Long =
      if (off + 4 > p.length) -1L
      else ((p(off) & 0xffL)) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int =
      if (off + 2 > p.length) -1
      else (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def fourcc(off: Int): String =
      if (off + 4 > p.length) ""
      else new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return none.copy(cause = "no_reader")

    var formatTag = -1
    var ch = -1
    var rate = -1L
    var bits = -1
    var streamIdx = -1
    var strhSeen = 0
    var moviStart = -1
    var moviEnd = -1L
    var truncated = false
    def walk(start: Int, end: Int, depth: Int): Unit = {
      var pos = start
      var lastStrhAuds = false
      while (pos + 8 <= end && !truncated) {
        val fc = fourcc(pos)
        val sz = u32(pos + 4)
        val dataOff = pos + 8
        if (sz >= 0 && fc == "LIST" && fourcc(dataOff) == "movi") {
          moviStart = dataOff + 4; moviEnd = dataOff.toLong + sz
          pos = (dataOff.toLong + sz + (sz & 1)).min(Int.MaxValue.toLong).toInt
        } else if (sz < 0 || pos + 8 + sz > end) { truncated = true }
        else {
          fc match {
            case "LIST" =>
              if (depth < 4) walk(dataOff + 4, dataOff + sz.toInt, depth + 1)
            case "strh" =>
              // EVERY strh advances the stream number (the decodeVideo
              // lesson: a short foreign strh must not desync "NNwb")
              lastStrhAuds = sz >= 4 && fourcc(dataOff) == "auds"
              if (lastStrhAuds && streamIdx < 0) streamIdx = strhSeen
              strhSeen += 1
            case "strf" if sz >= 16 =>
              if (lastStrhAuds && formatTag < 0) {
                formatTag = u16(dataOff)
                ch = u16(dataOff + 2)
                rate = u32(dataOff + 4)
                bits = u16(dataOff + 14)
              }
            case _ => ()
          }
          pos = dataOff + sz.toInt + (sz.toInt & 1)
        }
      }
    }
    walk(12, p.length, 0)
    if (streamIdx < 0)
      return none.copy(cause =
        if (truncated) "truncated" else "no_audio_stream")
    if (formatTag < 0 || ch < 1 || rate <= 0)
      return none.copy(cause = if (truncated) "truncated" else "no_reader")
    val base = none.copy(sample_rate = Some(rate.toInt),
      channels = Some(ch))
    if (formatTag != 1) return base.copy(cause = "unsupported_codec")
    if (bits != 16) return base.copy(cause = "unsupported_depth")
    if (moviStart < 0)
      return base.copy(cause =
        if (truncated) "truncated" else "no_audio_stream")

    val chunkPrefix = f"$streamIdx%02d"
    val pcm = new java.io.ByteArrayOutputStream()
    var pos = moviStart
    var cut = false
    var over = false
    val end = math.min(moviEnd, p.length.toLong).toInt
    val moviCut = moviEnd > p.length
    while (pos + 8 <= end && !cut && !over) {
      val fc = fourcc(pos)
      val sz = u32(pos + 4)
      if (sz < 0 || pos + 8 + sz > end) cut = true
      else {
        if (fc.startsWith(chunkPrefix) && fc.endsWith("wb")) {
          if (pcm.size.toLong + sz > maxBytes) over = true
          else pcm.write(p, pos + 8, sz.toInt)
        }
        pos = pos + 8 + sz.toInt + (sz.toInt & 1)
      }
    }
    if (over) return base.copy(cause = "too_large")
    if (truncated || cut || moviCut)
      return base.copy(cause = "truncated",
        n_frames = Some(pcm.size.toLong / (2L * ch)))
    val bytes = pcm.toByteArray
    val whole = bytes.length - bytes.length % (2 * ch)
    base.copy(cause = "ok", n_frames = Some(whole.toLong / (2L * ch)),
      wav = Some(wavWrap(rate.toInt, ch, bytes, whole)))
  }

  /** The canonical 44-byte 16-bit PCM WAV header around raw samples —
    * exactly the shape [[wav16Fast]] reads back.
    */
  private def wavWrap(rate: Int, ch: Int, pcm: Array[Byte],
      len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44 + len)
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    tag("RIFF"); le32(36L + len); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(ch); le32(rate.toLong)
    le32(rate.toLong * ch * 2); le16(ch * 2); le16(16)
    tag("data"); le32(len.toLong)
    out.write(pcm, 0, len)
    out.toByteArray
  }

  /** One extracted keyframe ([[videoKeyframes]]); non-`ok` payloads
    * yield a single routing row with `frame_idx = -1`.
    */
  final case class VideoKeyframe(
      media_id: Long,
      cause: String,
      /** sampled-frame ordinal (the [[VideoHash.frame_dhash]] index) */
      frame_idx: Int,
      width: Option[Int],
      height: Option[Int],
      /** the keyframe thumbnail, losslessly PNG-encoded at the
        * [[resizeImages]] fit-within dims
        */
      thumb_png: Option[Array[Byte]])

  /** Keyframe-per-shot extraction — the production frame sampler: ONE
    * pass over each clip decodes the sampled frames, detects shot
    * boundaries exactly as [[videoScenes]] (consecutive-frame dHash
    * distance ≥ `minHamming`), and emits the FIRST frame of every shot
    * (frame 0 plus each boundary frame) as a fit-within bilinear PNG
    * thumbnail ([[resizeImages]]' integer dim contract, shared core).
    * A 10k-frame clip with 12 shots costs 12 thumbnails instead of a
    * blind stride's arbitrary selection — the multimodal training-data
    * shape. No shuffle anywhere: a stateless per-partition flatMap,
    * scaling with executors; one raster live at a time under
    * `maxPixels`.
    */
  def videoKeyframes(media: Dataset[MediaRow], minHamming: Int = 16,
      targetW: Int = 256, targetH: Int = 256, stride: Int = 1,
      maxSampledFrames: Int = 32,
      maxPixels: Long = 64L * 1024 * 1024): Dataset[VideoKeyframe] = {
    require(minHamming >= 1 && minHamming <= 64)
    require(targetW > 0 && targetH > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val kfs = scala.collection.mutable.ArrayBuffer.empty[VideoKeyframe]
        var prev = 0L
        var first = true
        var idx = 0
        val vd = walkOneVideo(r, maxPixels, stride, maxSampledFrames) {
          img =>
            val h = dhashOfImage(img, 8, 8)
            val boundary = first ||
              java.lang.Long.bitCount(h ^ prev) >= minHamming
            prev = h
            first = false
            if (boundary) {
              val (ow, oh, _, png) = thumbOf(img, targetW, targetH)
              kfs += VideoKeyframe(r.media_id, "ok", idx, Some(ow),
                Some(oh), Some(png))
            }
            idx += 1
        }
        if (vd.cause != "ok")
          Seq(VideoKeyframe(r.media_id, vd.cause, -1, None, None, None))
        else kfs.toSeq
      }
    }
  }

  /** One payload's clip hash — the shared core under [[videoDHash]] and
    * [[graft.streaming.StreamImageDedup]]'s video path.
    */
  private[graft] def clipDHashOne(r: MediaRow, hashW: Int, hashH: Int,
      stride: Int, maxSampledFrames: Int, maxPixels: Long): VideoHash = {
    val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val vd = walkOneVideo(r, maxPixels, stride, maxSampledFrames) {
      img => hashes += dhashOfImage(img, hashW, hashH)
    }
    val clip =
      if (vd.cause != "ok" || hashes.isEmpty) None
      else {
        val n = hashes.length
        var bits = 0L
        var b = 0
        while (b < 64) {
          var cnt = 0
          var i = 0
          while (i < n) {
            if (((hashes(i) >>> b) & 1L) == 1L) cnt += 1
            i += 1
          }
          if (2 * cnt > n) bits |= 1L << b
          b += 1
        }
        Some(bits)
      }
    VideoHash(r.media_id, vd.cause, vd.codec, vd.width, vd.height,
      vd.n_frames, vd.sampled_frames,
      if (vd.cause == "ok") Some(hashes.toSeq) else None, clip)
  }

  /** AVI-encode a solid-color clip (the deterministic fixture builder:
    * `codec = "raw"` writes lossless BI_RGB DIB frames, so decode
    * returns exactly the encode parameters — width/height/frames/fps/
    * mean are pure arithmetic, the [[encodeSolidPng]] story for video).
    * `codec = "mjpeg"` writes real per-frame JPEGs via `javax.imageio`
    * (lossy — spec material, not oracle material); any other 4-char
    * value is stamped as the stream's fourcc with raw frame bytes (the
    * unsupported-codec fixture). Executor-safe: pure function.
    *
    * Container layout is fixed: 12-byte RIFF header, 200-byte hdrl LIST
    * (avih 56 + one vids strl with strh 56 / strf 40), then the movi
    * LIST — the first frame chunk starts at byte 224.
    */
  def encodeSolidAvi(w: Int, h: Int, nFrames: Int, fps: Int,
      r: Int, g: Int, b: Int, codec: String = "raw",
      /** strf biBitCount: 24 writes BGR rows, 32 writes real BGRX rows
        * (both decodable); any OTHER value keeps 24bpp frame bytes
        * under the lying header and exercises the `unsupported_depth`
        * route
        */
      bitCount: Int = 24,
      /** negative-biHeight top-down layout: frame rows are written in
        * VISUAL order instead of bottom-up
        */
      topDown: Boolean = false,
      /** mux an audio strl BEFORE the vids strl — the video stream
        * becomes stream 1 and its frame chunks "01dc"
        */
      audioFirst: Boolean = false,
      /** paint the VISUAL top row this color instead of (r, g, b) — an
        * orientation witness a solid frame cannot provide
        */
      topStripe: Option[(Int, Int, Int)] = None,
      /** interleaved 16-bit 8 kHz mono PCM chunks for the auds stream
        * (requires `audioFirst`) — the [[demuxAudio]] fixture
        */
      audioChunks: IndexedSeq[Array[Byte]] = IndexedSeq.empty)
      : Array[Byte] = {
    require(w > 0 && h > 0 && nFrames >= 0 && fps > 0)
    val frames: IndexedSeq[Array[Byte]] =
      if (codec == "mjpeg") {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val os = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.setUseCache(false)
        javax.imageio.ImageIO.write(img, "jpg", os)
        val one = os.toByteArray
        IndexedSeq.fill(nFrames)(one)
      } else {
        // real pixel bytes at the DECLARED depth for the two decodable
        // layouts (24bpp BGR, 32bpp BGRX); any other bitCount keeps
        // 24bpp bytes under the lying header — the unsupported_depth
        // fixture stays header-only
        val bpp = if (bitCount == 32) 4 else 3
        val rowBytes = (w * bpp + 3) & ~3
        val one = new Array[Byte](rowBytes * h)
        var ys = 0
        while (ys < h) {
          // storage row ys holds visual row yv
          val yv = if (topDown) ys else h - 1 - ys
          val (pr, pg, pb) = topStripe match {
            case Some(c) if yv == 0 => c
            case _ => (r, g, b)
          }
          var x = 0
          while (x < w) {
            one(ys * rowBytes + bpp * x) = pb.toByte
            one(ys * rowBytes + bpp * x + 1) = pg.toByte
            one(ys * rowBytes + bpp * x + 2) = pr.toByte
            x += 1
          }
          ys += 1
        }
        IndexedSeq.fill(nFrames)(one)
      }
    writeAvi(w, h, fps, codec, bitCount, topDown, audioFirst, frames,
      audioChunks)
  }

  /** AVI-encode a clip of 9×8 "path" frames — [[encodePathPng]]'s
    * construction as raw BI_RGB DIB frames, so frame i's [[videoDHash]]
    * frame hash equals `keys(i)` exactly (lossless frames, raster
    * already (hashW+1)×hashH, r=g=b pixels). A clip whose majority of
    * frames carry one key fingerprints as that key by pure arithmetic —
    * the deterministic fixture under the video near-dup gate.
    * Executor-safe: pure function.
    */
  def encodePathAvi(keys: Seq[Long], fps: Int = 10,
      /** interleaved 16-bit 8 kHz mono PCM chunks — adds the auds
        * stream (the video frames become "01dc"; [[walkOneVideo]]'s
        * stream numbering handles it), the A/V fixture
        */
      audioChunks: IndexedSeq[Array[Byte]] = IndexedSeq.empty)
      : Array[Byte] = {
    require(fps > 0)
    val rowBytes = (9 * 3 + 3) & ~3
    val frames = keys.toIndexedSeq.map { key =>
      val one = new Array[Byte](rowBytes * 8)
      var yv = 0
      while (yv < 8) {
        val ys = 7 - yv // bottom-up DIB storage of visual row yv
        var v = 128
        def put(x: Int, value: Int): Unit = {
          val o = ys * rowBytes + 3 * x
          one(o) = value.toByte
          one(o + 1) = value.toByte
          one(o + 2) = value.toByte
        }
        put(0, v)
        var x = 0
        while (x < 8) {
          v += (if (((key >>> (yv * 8 + x)) & 1L) == 1L) -8 else 8)
          put(x + 1, v)
          x += 1
        }
        yv += 1
      }
      one
    }
    writeAvi(9, 8, fps, "raw", bitCount = 24, topDown = false,
      audioFirst = audioChunks.nonEmpty, frames, audioChunks)
  }

  /** The fixed AVI container around pre-encoded frame chunks — the
    * shared writer under [[encodeSolidAvi]] and [[encodePathAvi]] (see
    * [[encodeSolidAvi]] for the layout contract).
    */
  private def writeAvi(w: Int, h: Int, fps: Int, codec: String,
      bitCount: Int, topDown: Boolean, audioFirst: Boolean,
      frames: IndexedSeq[Array[Byte]],
      /** interleaved 16-bit 8 kHz mono PCM audio chunks, written as the
        * audio stream's "00wb" data (requires `audioFirst` so the auds
        * strl exists)
        */
      audioChunks: IndexedSeq[Array[Byte]] = IndexedSeq.empty)
      : Array[Byte] = {
    require(audioChunks.isEmpty || audioFirst,
      "audio chunks need the auds stream (audioFirst)")
    val nFrames = frames.length
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val compression = codec match {
      case "raw" => 0L
      case "mjpeg" => // 'MJPG' little-endian
        'M'.toLong | ('J'.toLong << 8) | ('P'.toLong << 16) | ('G'.toLong << 24)
      case f =>
        require(f.length == 4, s"fourcc must be 4 chars: $f")
        f(0).toLong | (f(1).toLong << 8) | (f(2).toLong << 16) |
          (f(3).toLong << 24)
    }
    val moviBody = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum +
      audioChunks.map(a => 8 + a.length + (a.length & 1)).sum
    val audsStrlBody = 4 + (8 + 56) + (8 + 16) // strh + minimal WAVEFORMAT strf
    val vidsStrlBody = 4 + (8 + 56) + (8 + 40)
    val hdrlBody = 4 + (8 + 56) +
      (if (audioFirst) 8 + audsStrlBody else 0) + (8 + vidsStrlBody)
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    tag("RIFF"); le32(riffBody); tag("AVI ")
    tag("LIST"); le32(hdrlBody); tag("hdrl")
    tag("avih"); le32(56)
    le32(1000000L / fps); le32(0); le32(0); le32(0) // usec/frame, maxBps, pad, flags
    le32(nFrames); le32(0); le32(if (audioFirst) 2 else 1); le32(0) // total, initial, streams, sugBuf
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0) // dims + reserved
    if (audioFirst) {
      tag("LIST"); le32(audsStrlBody); tag("strl")
      tag("strh"); le32(56)
      tag("auds"); le32(0); le32(0); le32(0) // type, handler, flags, prio
      le32(0); le32(1); le32(8000); le32(0) // initial, scale, rate, start
      le32(0); le32(0); le32(0xffffffffL); le32(2) // length, sugBuf, quality, sampleSize
      le32(0); le32(0) // rcFrame
      tag("strf"); le32(16)
      le32(1L | (1L << 16)); le32(8000); le32(16000); le32(2L | (16L << 16))
    }
    tag("LIST"); le32(vidsStrlBody); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); le32(compression); le32(0); le32(0) // type, handler, flags, prio
    le32(0); le32(1); le32(fps); le32(0) // initial, scale, rate, start
    le32(nFrames); le32(0); le32(0xffffffffL); le32(0) // length, sugBuf, quality, sampleSize
    le32(0); le32((w.toLong & 0xffff) | ((h.toLong & 0xffff) << 16)) // rcFrame: left|top, right|bottom
    tag("strf"); le32(40)
    le32(40); le32(w) // biSize, biWidth
    le32((if (topDown) -h else h).toLong & 0xffffffffL) // biHeight (sign = row order)
    le32(1L | (bitCount.toLong << 16)) // biPlanes | biBitCount
    le32(compression); le32(frames.headOption.map(_.length.toLong).getOrElse(0L))
    le32(0); le32(0); le32(0); le32(0) // resolutions, clrUsed, clrImportant
    tag("LIST"); le32(moviBody); tag("movi")
    val chunkTag = if (audioFirst) "01dc" else "00dc"
    // interleave: video frame i, then audio chunk i (the mux order a
    // real recorder produces; demux must not depend on it)
    (0 until math.max(frames.length, audioChunks.length)).foreach { i =>
      if (i < frames.length) {
        val f = frames(i)
        tag(chunkTag); le32(f.length); out.write(f, 0, f.length)
        if ((f.length & 1) == 1) out.write(0)
      }
      if (i < audioChunks.length) {
        val a = audioChunks(i)
        tag("00wb"); le32(a.length); out.write(a, 0, a.length)
        if ((a.length & 1) == 1) out.write(0)
      }
    }
    out.toByteArray
  }

  /** PNG-encode a solid-color image (the deterministic fixture builder:
    * PNG is lossless, so decode returns exactly (w, h, rgb) — an
    * arithmetic oracle can predict every decoded feature from the
    * parameters). Executor-safe: pure function of its arguments.
    */
  def encodeSolidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Test/gate fixture: a 9×8 grayscale "path" PNG whose [[imageDHash]]
    * is exactly `key` — each row starts at 128 and steps −8 where the
    * corresponding key bit is set (making luma(x,y) > luma(x+1,y)) and
    * +8 where clear, staying within 64..192 so no step saturates. Pixels
    * are r=g=b, so integer luma equals the channel value and the whole
    * construction is arithmetic an external SQL oracle can replicate
    * from `key` alone — the PNG encode/decode round trip is the part
    * under test.
    */
  def encodePathPng(key: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      var x = 0
      while (x < 8) {
        v += (if (((key >>> (y * 8 + x)) & 1L) == 1L) -8 else 8)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Frame sampling for video-ish payloads: every `stride`-th chunk of
    * `frameBytes` becomes one frame row (media_id, frame_idx, frame bytes).
    * A payload shorter than one frame still yields its single partial
    * frame (a sub-frame clip is still a sample); only EMPTY payloads
    * yield no rows (an empty "frame" would be pure noise downstream).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    val df = media.toDF().where(length(col("payload")) > 0)
    df.select(col("media_id"),
      explode(transform(
        sequence(lit(0), greatest(
          (length(col("payload")) / frameBytes / stride).cast("int") - 1, lit(0))),
        i => struct((i * stride).as("frame_idx"),
          substring(col("payload"), i * stride * frameBytes + 1, lit(frameBytes))
            .as("frame")))).as("f"))
      .select(col("media_id"), col("f.frame_idx"), col("f.frame"))
  }

  /** One image payload's resize outcome: per-cause routing exactly as
    * [[decodeImages]], plus the re-encoded thumbnail bytes.
    */
  final case class ImageResize(
      media_id: Long,
      cause: String,
      src_width: Option[Int],
      src_height: Option[Int],
      width: Option[Int],
      height: Option[Int],
      /** mean luminance of the RESIZED raster (milli-units) — for a
        * solid-color source bilinear interpolation preserves the color
        * exactly, which is what makes the gate oracle-predictable
        */
      mean_rgb_milli: Option[Long],
      /** the thumbnail, re-encoded as PNG (lossless — a decode of these
        * bytes reproduces the resized raster bit-for-bit)
        */
      thumb_png: Option[Array[Byte]])

  /** REAL image resize via `java.awt.Graphics2D` (JDK-only, the
    * [[decodeImages]] story continued): decode, BILINEAR-scale into a
    * `targetW`×`targetH` box preserving aspect ratio (fit-within,
    * never upscale), re-encode as PNG. The output dimension contract is
    * integer-exact so an SQL oracle replicates it:
    *
    *  - `w ≤ targetW && h ≤ targetH` → pass through (w, h);
    *  - wider-than-box aspect (`w·targetH ≥ h·targetW`) →
    *    `(targetW, max(1, (h·targetW) div w))`;
    *  - else → `(max(1, (w·targetH) div h), targetH)`.
    *
    * Iterator→iterator per partition, constant memory; `maxPixels`
    * routes decompression bombs to `too_large` off the header probe
    * before any raster allocates — at 100 TB the thumbnail pass is the
    * first full-decode pass over a crawl, so it inherits every guard
    * the decode pass has.
    */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int,
      maxPixels: Long = 64L * 1024 * 1024): Dataset[ImageResize] = {
    require(targetW > 0 && targetH > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val none = ImageResize(r.media_id, "", None, None, None, None,
          None, None)
        if (r.payload == null || r.payload.isEmpty) none.copy(cause = "empty")
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) none.copy(cause = "no_reader")
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis, true, true)
                val (hw, hh) = (reader.getWidth(0).toLong,
                  reader.getHeight(0).toLong)
                if (hw * hh > maxPixels)
                  none.copy(cause = "too_large",
                    src_width = Some(hw.toInt), src_height = Some(hh.toInt))
                else {
                  val img = reader.read(0)
                  val (w, h) = (img.getWidth, img.getHeight)
                  val (ow, oh, mean, png) = thumbOf(img, targetW, targetH)
                  ImageResize(r.media_id, "ok", Some(w), Some(h),
                    Some(ow), Some(oh), Some(mean), Some(png))
                }
              } catch {
                case scala.util.control.NonFatal(_) =>
                  none.copy(cause = "decode_failed")
              } finally reader.dispose()
            }
          } finally iis.close()
        }
      }
    }
  }

  /** Fit-within bilinear thumbnail of a decoded raster ([[resizeImages]]'
    * integer dim contract), returning (outW, outH, mean_rgb_milli,
    * lossless PNG bytes) — the shared core under [[resizeImages]] and
    * [[videoKeyframes]].
    */
  private def thumbOf(img: java.awt.image.BufferedImage, targetW: Int,
      targetH: Int): (Int, Int, Long, Array[Byte]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (ow, oh) =
      if (w <= targetW && h <= targetH) (w, h)
      else if (w.toLong * targetH >= h.toLong * targetW)
        (targetW, math.max(1L, h.toLong * targetW / w).toInt)
      else
        (math.max(1L, w.toLong * targetH / h).toInt, targetH)
    val out = new java.awt.image.BufferedImage(ow, oh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, ow, oh, null)
    } finally g.dispose()
    var sum = 0L
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val p = out.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    (ow, oh, sum * 1000L / (3L * ow * oh), bos.toByteArray)
  }

  /** One image payload's perceptual-hash outcome ([[imageDHash]]);
    * `cause` routes exactly as [[ImageDecode]].
    */
  final case class ImageHash(
      media_id: Long,
      cause: String,
      width: Option[Int],
      height: Option[Int],
      /** 64-bit difference hash: bit y·hashW + x is set iff
        * luma(x, y) > luma(x + 1, y) on the (hashW+1)×hashH downsample
        */
      dhash: Option[Long])

  /** REAL perceptual hashing for image near-dup detection: decode via
    * `javax.imageio` (the [[decodeImages]] plumbing — per-cause routing,
    * header-probed `maxPixels` bomb guard), bilinear-downsample to
    * (hashW+1)×hashH, and emit the 64-bit DIFFERENCE HASH — bit
    * (y·hashW + x) set iff luma(x,y) > luma(x+1,y). dHash is the
    * standard crawl-pipeline near-dup fingerprint: it survives
    * re-encoding, format conversion and uniform brightness shifts
    * (adding a constant to every pixel preserves all comparisons),
    * while a payload md5 or [[ImageDecode.pixel_crc]] breaks on any
    * byte change. Pair generation is [[graft.operators.dedup.Dedup
    * .hammingPairs]] over the `dhash` column — banded 16-bit blocking,
    * never an all-pairs join, exactly the SimHash discipline.
    *
    * An image already exactly (hashW+1)×hashH skips the resampler, so
    * fixture images of that geometry hash ARITHMETICALLY (luma of
    * r=g=b pixels is the channel value — what makes the gate query's
    * oracle exact); anything larger pays one Graphics2D bilinear pass,
    * constant per row regardless of source size.
    */
  def imageDHash(media: Dataset[MediaRow], hashW: Int = 8, hashH: Int = 8,
      maxPixels: Long = 64L * 1024 * 1024): Dataset[ImageHash] = {
    require(hashW >= 1 && hashW <= 8 && hashH >= 1 && hashH <= 8,
      "dhash bits must fit one long")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (cause, w, h, bits) = dhashOne(r.payload, hashW, hashH, maxPixels)
        ImageHash(r.media_id, cause, w, h, bits)
      }
    }
  }

  /** One payload's dHash: (cause, width, height, bits) — the shared
    * decode under [[imageDHash]] and
    * [[graft.streaming.StreamImageDedup]].
    */
  private[graft] def dhashOne(payload: Array[Byte], hashW: Int, hashH: Int,
      maxPixels: Long): (String, Option[Int], Option[Int], Option[Long]) = {
    if (payload == null || payload.isEmpty) ("empty", None, None, None)
    else {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) ("no_reader", None, None, None)
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val (hw, hh) = (reader.getWidth(0).toLong,
              reader.getHeight(0).toLong)
            if (hw * hh > maxPixels)
              ("too_large", Some(hw.toInt), Some(hh.toInt), None)
            else {
              val img = reader.read(0)
              ("ok", Some(img.getWidth), Some(img.getHeight),
                Some(dhashOfImage(img, hashW, hashH)))
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              ("decode_failed", None, None, None)
          } finally reader.dispose()
        }
      } finally iis.close()
    }
  }

  /** dHash of an already-decoded raster: bilinear downsample to
    * (hashW+1)×hashH (a raster already exactly that geometry skips the
    * resampler — what makes the path fixtures arithmetic), integer
    * luma, difference bits. The shared core under [[dhashOne]] (images)
    * and [[videoDHash]] (per-frame).
    */
  private[graft] def dhashOfImage(img: java.awt.image.BufferedImage,
      hashW: Int, hashH: Int): Long = {
    val small =
      if (img.getWidth == hashW + 1 && img.getHeight == hashH) img
      else {
        val out = new java.awt.image.BufferedImage(hashW + 1, hashH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, hashW + 1, hashH, null)
        } finally g.dispose()
        out
      }
    def luma(x: Int, y: Int): Int = {
      val p = small.getRGB(x, y)
      (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
        (p & 0xff) * 114) / 1000
    }
    var bits = 0L
    var y = 0
    while (y < hashH) {
      var x = 0
      while (x < hashW) {
        if (luma(x, y) > luma(x + 1, y))
          bits |= 1L << (y * hashW + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** A resized ("thumbnail") media row. */
  final case class MediaThumb(media_id: Long, kind: String,
      thumb: Array[Byte])

  /** Resize plumbing: deterministic stub "scaler" — the thumbnail is
    * `targetBytes` evenly-spaced bytes of the payload (payloads already
    * at or under the target pass through). A real implementation swaps
    * the per-row function for an image scaler; the batch shape
    * (iterator→iterator per partition, codec initialized once) and the
    * output schema are what this exercises.
    */
  def resizeStub(media: Dataset[MediaRow],
      targetBytes: Int = 32): Dataset[MediaThumb] = {
    require(targetBytes > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real implementation would initialize the scaler here, once
      rows.map { r =>
        val n = r.payload.length
        val t =
          if (n <= targetBytes) r.payload
          else Array.tabulate(targetBytes)(i =>
            r.payload((i.toLong * n / targetBytes).toInt))
        MediaThumb(r.media_id, r.kind, t)
      }
    }
  }

  /** Build a media dataset from the documents table (text bytes play the
    * payload) — the driver-facing fixture for the multimodal plumbing.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source")).as[MediaRow]
  }
}
