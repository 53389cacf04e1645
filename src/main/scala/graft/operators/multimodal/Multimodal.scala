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
  * RMS/peak, with the same per-cause routing. VIDEO byte decode stays
  * STUBBED (the JDK ships no video codec — environment-blocked):
  * [[StubDecoder]] derives deterministic fake features, and swapping in
  * a real codec changes only the function body — the batch shape,
  * schema and partitioning are what the plumbing tests pin.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Features a decoder emits; deterministic stub values here. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      checksum: String,
      width: Int, // stub: derived from payload bytes
      height: Int,
      n_frames: Int)

  /** The stub "decoder": replace with a real codec binding. Deterministic
    * pure function of the payload so tests and oracles can replicate it.
    */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.payload.length.toLong
      val b0 = if (len > 0) r.payload(0) & 0xff else 0
      val b1 = if (len > 1) r.payload(1) & 0xff else 0
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        byte_len = len,
        checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).map("%02x".format(_)).mkString,
        width = 16 + b0 % 64 * 16,
        height = 16 + b1 % 64 * 16,
        n_frames = if (r.kind == "video") (len % 240 + 1).toInt else 1)
    }
  }

  /** Batch decode: one decoder instance per partition, iterator-in /
    * iterator-out (constant memory; the mapInPandas shape).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real implementation would initialize the codec here, once
      rows.map(StubDecoder.decode)
    }
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
    * cap routes to `too_large` before any sample is read.
    *
    * VIDEO stays stubbed ([[StubDecoder]]): the JDK ships no video
    * codec, so real video decode is environment-blocked the way Kafka
    * runtime is — the plumbing (schema, routing, batch shape) is what
    * [[sampleFrames]]/[[decodeFeatures]] pin.
    */
  def decodeAudio(media: Dataset[MediaRow],
      maxFrames: Long = 1L << 32): Dataset[AudioDecode] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val none = AudioDecode(r.media_id, "", None, None, None, None,
          None, None, None)
        if (r.payload == null || r.payload.isEmpty) none.copy(cause = "empty")
        else {
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
              if (declared > maxFrames) base.copy(cause = "too_large")
              else if (bits != 16)
                // only 16-bit signed PCM gets the sample pass (the
                // fixture/crawl norm); other depths still report header
                // facts with a routed cause rather than wrong amplitudes
                base.copy(cause = "unsupported_depth",
                  n_frames = Some(declared))
              else {
                val frameBytes = fmt.getFrameSize
                val big = fmt.isBigEndian
                val buf = new Array[Byte](8192 - 8192 % frameBytes)
                var sumSq = 0.0
                var peak = 0L
                var nSamples = 0L
                var read = in.read(buf)
                while (read > 0) {
                  var i = 0
                  while (i + 1 < read) {
                    val s =
                      if (big) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                      else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                    sumSq += s.toDouble * s.toDouble
                    val a = math.abs(s.toLong)
                    if (a > peak) peak = a
                    nSamples += 1
                    i += 2
                  }
                  read = in.read(buf)
                }
                val frames = nSamples / ch
                if (frames < declared)
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
