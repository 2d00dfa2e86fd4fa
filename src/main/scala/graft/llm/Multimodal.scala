package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE north star): image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batches
  * per partition.
  *
  * IMAGE decode/resize is REAL: `javax.imageio` (JDK-bundled — PNG,
  * JPEG, GIF, BMP readers) decodes true dimensions, extracts a
  * luminance-band feature, and re-encodes resizes. AUDIO decode is
  * REAL: `javax.sound.sampled` (JDK-bundled — WAV, AIFF, AU readers)
  * extracts true sample rate, channels, duration, and per-channel RMS.
  * VIDEO demux is REAL for RIFF/AVI ([[demuxAvi]]): pure-JVM chunk
  * walk; with MJPEG frames the full demux→decode path runs on a stock
  * JDK. Bytes none of these understand (compressed codecs, corrupt
  * payloads) fall back to the clearly-marked deterministic STUB so the
  * batch pipeline still exercises end-to-end; swap the stub for a
  * JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** Real image decode via the JDK's ImageIO: returns (width, height,
    * 8-dim luminance-band feature) for any payload a registered reader
    * accepts (PNG/JPEG/GIF/BMP in a stock JDK), None otherwise. The
    * feature is the mean gray value of 8 horizontal bands on a ≤64×64
    * sample grid — deterministic integer sampling, cheap at any
    * resolution.
    */
  def decodeImage(content: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (content == null || content.length < 4) return None
    try {
      javax.imageio.ImageIO.setUseCache(false) // no executor-disk scratch files
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None else Some(bandFeatures(img))
    } catch { case _: Throwable => None }
  }

  /** (width, height, 8-band luminance feature) of one decoded image —
    * shared by [[decodeImage]] and [[decodeImageFrames]].
    */
  private def bandFeatures(img: java.awt.image.BufferedImage): (Int, Int, Array[Float]) = {
    val w = img.getWidth; val h = img.getHeight
    val sx = math.max(1, w / 64); val sy = math.max(1, h / 64)
    val feat = new Array[Float](8)
    var band = 0
    while (band < 8) {
      val y0 = h.toLong * band / 8; val y1 = math.max(y0 + 1, h.toLong * (band + 1) / 8)
      var sum = 0L; var n = 0L; var y = y0
      while (y < y1) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y.toInt)
          sum += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
          n += 1; x += sx
        }
        y += sy
      }
      feat(band) = if (n == 0) 0.0f else (sum.toDouble / n / 255.0).toFloat
      band += 1
    }
    (w, h, feat)
  }

  /** Multi-frame image decode (animated GIF on a stock JDK; any
    * multi-image container a registered ImageIO reader claims): one
    * (width, height, feature) per frame in container order, decoded
    * LAZILY — the reader decodes frame i only when the iterator is
    * pulled, so memory is one frame's raster regardless of frame
    * count; the reader is disposed when the iterator is exhausted.
    * None when no reader claims the payload. Frames are read
    * standalone (no disposal compositing — full-frame GIFs, the
    * training-data norm, are exact; partial-update GIFs would need a
    * compositor here).
    */
  def decodeImageFrames(content: Array[Byte]): Option[Iterator[(Int, Int, Int, Array[Float])]] = {
    if (content == null || content.length < 4) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      val frames = (0 until n).iterator.flatMap { i =>
        // a frame that fails to decode mid-container is skipped, but its
        // CONTAINER index is preserved (FrameDecoder contract): later
        // frames keep their true positions so every-Nth sampling stays
        // on the container's frame grid
        val f = try Some(bandFeatures(reader.read(i)))
                catch { case _: Exception => None }
        if (i == n - 1) { reader.dispose(); iis.close() }
        f.map { case (w, h, feat) => (i, w, h, feat) }.iterator
      }
      Some(frames)
    } catch { case _: Throwable => None }
  }

  /** Real image resize: decode via ImageIO, scale with bilinear
    * interpolation, re-encode as PNG. None when the payload isn't a
    * decodable image.
    */
  def resizeImage(content: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    if (content == null || content.length < 4) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (src == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        Some(baos.toByteArray)
      }
    } catch { case _: Throwable => None }
  }

  /** Canonical media-table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),            // image | audio | video
    StructField("content", BinaryType),              // opaque payload
    StructField("meta", StructType(Seq(              // typed metadata
      StructField("source", StringType),
      StructField("mime", StringType),
      StructField("created_ms", LongType))))))

  /** Extracted-feature schema produced by [[featurize]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("byte_len", LongType),
    StructField("content_sha", StringType),
    StructField("width", IntegerType),               // real for images, stub otherwise
    StructField("height", IntegerType),              // real for images, stub otherwise
    StructField("feat", ArrayType(FloatType))))      // luminance bands / stub

  /** Wrap a `binaryFile` scan (path,length,content) into the media table
    * shape — the ingest mapping for real assets on disk.
    */
  def fromBinaryFiles(spark: SparkSession, glob: String, modality: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(
        abs(xxhash64(col("path"))).as("media_id"),
        lit(modality).as("modality"),
        col("content"),
        struct(col("path").as("source"), lit("application/octet-stream").as("mime"),
          unix_millis(col("modificationTime")).as("created_ms")).as("meta"))

  /** Decoded audio metadata + per-channel RMS amplitude feature. */
  final case class AudioMeta(sampleRate: Float, channels: Int, frames: Long,
                             durationMs: Long, rms: Array[Float])

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV, AIFF,
    * AU readers ship with a stock JDK — no codec dependency): true
    * sample rate, channel count, frame count, duration, and a
    * per-channel RMS amplitude feature, computed streaming over 16-bit
    * PCM conversion in 4096-frame chunks (constant memory at any clip
    * length). None when no registered reader accepts the payload
    * (video containers, corrupt bytes → [[decodeStub]]).
    */
  def decodeAudio(content: Array[Byte]): Option[AudioMeta] = {
    if (content == null || content.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val base = in.getFormat
        val ch = base.getChannels
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, ch, ch * 2, base.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, in)
        val frameSize = fmt.getFrameSize
        val buf = new Array[Byte](frameSize * 4096)
        val sumSq = new Array[Double](ch)
        var frames = 0L
        var n = pcm.read(buf)
        while (n > 0) {
          var i = 0
          while (i + frameSize <= n) { // AudioInputStream reads whole frames
            var c = 0
            while (c < ch) {
              val lo = buf(i + 2 * c) & 0xff
              val hi = buf(i + 2 * c + 1)
              val s = ((hi << 8) | lo).toShort / 32768.0
              sumSq(c) += s * s
              c += 1
            }
            frames += 1
            i += frameSize
          }
          n = pcm.read(buf)
        }
        val rms = sumSq.map(x => if (frames == 0L) 0.0f else math.sqrt(x / frames).toFloat)
        Some(AudioMeta(base.getSampleRate, ch, frames,
          math.round(frames * 1000.0 / base.getSampleRate), rms))
      } finally in.close()
    } catch { case _: Throwable => None }
  }

  /** Audio-feature schema produced by [[featurizeAudio]]. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", FloatType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("rms", ArrayType(FloatType))))       // one entry per channel

  /** Batch audio feature extraction — the audio analog of [[featurize]]:
    * per-partition streaming rows, real decode for WAV/AIFF/AU plus the
    * audio track of AVI containers ([[decodeAudioAny]]), null row fields
    * (except id) for payloads no reader accepts.
    */
  def featurizeAudio(media: DataFrame): DataFrame = {
    val rows: Dataset[Row] = media.select("media_id", "content")
      .repartition(col("media_id"))
    rows.mapPartitions { it =>
      it.map { r =>
        decodeAudioAny(r.getAs[Array[Byte]]("content")) match {
          case Some(a) =>
            Row(r.getAs[Long]("media_id"), a.sampleRate, a.channels,
              a.frames, a.durationMs, a.rms.toSeq)
          case None =>
            Row(r.getAs[Long]("media_id"), null, null, null, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(audioFeatureSchema)).toDF()
  }

  /** STUB decode — fallback for payloads [[decodeImage]],
    * [[decodeAudio]] AND [[demuxAvi]] all reject (compressed video
    * codecs, corrupt bytes; a real codec binding would go here (???)):
    * derives (width, height, 8-dim feature) from content bytes so the
    * batch pipeline still runs deterministically end-to-end.
    */
  def decodeStub(content: Array[Byte]): (Int, Int, Array[Float]) = {
    if (content == null || content.isEmpty) (0, 0, Array.fill(8)(0.0f))
    else {
      val h = java.util.Arrays.hashCode(content)
      val width = math.abs(h % 1920) + 1
      val height = math.abs((h / 1920) % 1080) + 1
      val feat = (0 until 8).map(i =>
        ((content(i % content.length) & 0xff) / 255.0f)).toArray
      (width, height, feat)
    }
  }

  /** A demuxed AVI: header metadata + the byte range of every video
    * frame chunk (16 bytes of bookkeeping per frame — the frame bytes
    * themselves stay in the original payload, sliced lazily).
    */
  final case class AviVideo(width: Int, height: Int, usPerFrame: Long,
                            frames: IndexedSeq[(Int, Int)])

  /** Real video demux for the one container a stock JDK can handle
    * end-to-end: RIFF/AVI. Walks the chunk tree (LIST 'hdrl' → 'avih'
    * main header for dimensions and frame timing; LIST 'movi' — plus
    * optional 'rec ' sublists — for '##dc'/'##db' video frame chunks,
    * even-padded per RIFF). For MJPEG AVIs every frame chunk is a bare
    * JPEG that javax.imageio then decodes, so the whole
    * demux→decode→feature path is dependency-free and REAL; only
    * compressed codecs (H.264 etc.) still fall back to [[decodeStub]].
    * Returns None on anything that isn't a structurally valid AVI
    * (wrong magic, truncated chunk, no video frames).
    */
  def demuxAvi(content: Array[Byte]): Option[AviVideo] = {
    if (content == null || content.length < 12) return None
    def u32(o: Int): Long =
      (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
        ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val fileEnd = math.min(content.length.toLong, 8L + u32(4)).toInt
    var width = 0; var height = 0; var usPerFrame = 0L
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    // returns false on a structural violation (truncated chunk)
    def walk(start: Int, end: Int, inMovi: Boolean): Boolean = {
      var o = start
      while (o + 8 <= end) {
        val id = fourcc(o)
        val size = u32(o + 4)
        val dataStart = o + 8
        if (size < 0 || dataStart + size > end) return false
        val dataEnd = (dataStart + size).toInt
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(dataStart)
          if (!walk(dataStart + 4, dataEnd,
            inMovi || listType == "movi" || listType == "rec ")) return false
        } else if (id == "avih" && size >= 40) {
          usPerFrame = u32(dataStart)
          width = u32(dataStart + 32).toInt
          height = u32(dataStart + 36).toInt
        } else if (inMovi && isFrameId(id)) {
          frames += ((dataStart, size.toInt))
        }
        o = dataEnd + (size.toInt & 1) // RIFF chunks are even-padded
      }
      true
    }
    try {
      val out = if (walk(12, fileEnd, inMovi = false)) frames.result() else IndexedSeq.empty
      if (out.isEmpty) None
      else Some(AviVideo(width, height, if (usPerFrame > 0) usPerFrame else 40000L, out))
    } catch { case _: Throwable => None }
  }

  /** The first audio track of a RIFF/AVI, re-muxed as a standalone
    * RIFF/WAVE payload that [[decodeAudio]]'s stock-JDK reader accepts —
    * the audio analog of [[demuxAvi]], and the second real pure-JVM
    * codec path (PCM-in-AVI needs no codec at all, only container
    * surgery). Walks LIST 'strl' stream headers in order ('strh' fccType
    * 'auds' marks the audio stream; its 'strf' is the WAVEFORMATEX
    * verbatim — copied into the output 'fmt ' chunk unchanged, so
    * whether the JDK can decode the enclosed format is decided by the
    * SAME registry as a real .wav of that format), then concatenates
    * that stream's 'NNwb' movi chunks as the 'data' payload. None when
    * the container is structurally invalid, has no audio stream, or the
    * audio stream has no data chunks. Compressed AUDIO formats inside
    * the AVI (MP3 etc.) re-mux fine but then fail at [[decodeAudio]] —
    * the honest boundary, same as a compressed video codec.
    */
  def demuxAviAudio(content: Array[Byte]): Option[Array[Byte]] = {
    if (content == null || content.length < 12) return None
    def u32(o: Int): Long =
      (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
        ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val fileEnd = math.min(content.length.toLong, 8L + u32(4)).toInt
    var streamIdx = -1          // increments per LIST 'strl', hdrl order
    var audioStream = -1        // first stream whose strh.fccType == 'auds'
    var pendingAuds = false     // inside the audio stream's strl, before strf
    var waveFmt: Array[Byte] = null
    val data = IndexedSeq.newBuilder[(Int, Int)]
    def walk(start: Int, end: Int, inMovi: Boolean): Boolean = {
      var o = start
      while (o + 8 <= end) {
        val id = fourcc(o)
        val size = u32(o + 4)
        val dataStart = o + 8
        if (size < 0 || dataStart + size > end) return false
        val dataEnd = (dataStart + size).toInt
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(dataStart)
          if (listType == "strl") { streamIdx += 1; pendingAuds = false }
          if (!walk(dataStart + 4, dataEnd,
            inMovi || listType == "movi" || listType == "rec ")) return false
        } else if (id == "strh" && size >= 4) {
          if (fourcc(dataStart) == "auds" && audioStream < 0) {
            audioStream = streamIdx; pendingAuds = true
          }
        } else if (id == "strf" && pendingAuds) {
          if (size >= 16) waveFmt =
            java.util.Arrays.copyOfRange(content, dataStart, dataEnd)
          pendingAuds = false
        } else if (inMovi && audioStream >= 0 && id == f"$audioStream%02dwb") {
          data += ((dataStart, size.toInt))
        }
        o = dataEnd + (size.toInt & 1)
      }
      true
    }
    try {
      if (!walk(12, fileEnd, inMovi = false)) return None
      val chunks = data.result()
      if (waveFmt == null || chunks.isEmpty) return None
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val dataLen = chunks.map(_._2.toLong).sum
      val out = new java.io.ByteArrayOutputStream(
        (44 + waveFmt.length + dataLen).toInt)
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(le32(4 + 8 + waveFmt.length + (waveFmt.length & 1) + 8 + dataLen))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII"))
      out.write(le32(waveFmt.length.toLong))
      out.write(waveFmt)
      if ((waveFmt.length & 1) == 1) out.write(0)
      out.write("data".getBytes("US-ASCII"))
      out.write(le32(dataLen))
      chunks.foreach { case (off, len) => out.write(content, off, len) }
      Some(out.toByteArray)
    } catch { case _: Throwable => None }
  }

  /** Audio decode that also reaches INTO containers: direct WAV/AIFF/AU
    * first, then the AVI audio track via [[demuxAviAudio]].
    */
  def decodeAudioAny(content: Array[Byte]): Option[AudioMeta] =
    decodeAudio(content).orElse(demuxAviAudio(content).flatMap(decodeAudio))

  /** Frame-sample output schema: one row per sampled frame. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_ms", LongType),
    StructField("frame", BinaryType)))

  /** Decoded-frame-feature schema: one row per sampled DECODED frame. */
  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feat", ArrayType(FloatType))))

  /** Decoded per-frame features, every `everyNth` frame kept: the
    * frame-sampling analog of [[featurize]] — input rows fan out to
    * frame rows via a LAZY iterator chain (decoders decode on pull),
    * so a partition never materializes a whole video's frames.
    *
    * Decoding goes through the pluggable [[FrameDecoder]] chain (first
    * claimant wins): stock = MJPEG-AVI demux+JPEG-decode, then ImageIO
    * multi-frame containers (animated GIF, the q75-gated path). An
    * ffmpeg-backed binding for compressed codecs slots in by prepending
    * to `decoders` — this method does not change. Payloads no decoder
    * claims are dropped.
    */
  def frameFeatures(media: DataFrame, everyNth: Int = 1,
                    decoders: Seq[FrameDecoder] = FrameDecoder.stock): DataFrame = {
    require(everyNth > 0)
    media.select("media_id", "content")
      .repartition(col("media_id")) // spread decode work evenly
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          FrameDecoder.decode(decoders, r.getAs[Array[Byte]]("content")) match {
            case Some(frames) =>
              // frame_idx and the every-Nth grid come from the DECODER's
              // container index, not a post-skip zipWithIndex — a bad
              // mid-stream frame must not shift every later frame's idx
              frames.collect {
                case (idx, w, h, feat) if idx % everyNth == 0 =>
                  Row(id, idx, w, h, feat.toSeq)
              }
            case None => Iterator.empty
          }
        }
      }(org.apache.spark.sql.Encoders.row(frameFeatureSchema)).toDF()
  }

  /** STUB resize — fallback for payloads [[resizeImage]] can't decode
    * (a real video/audio transcode would go here (???)): emits a
    * payload whose length tracks targetW*targetH so size accounting
    * downstream is realistic.
    */
  def resizeStub(content: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    if (content == null || content.isEmpty) Array.emptyByteArray
    else {
      val outLen = math.max(1, math.min(targetW * targetH / 64, 1 << 20))
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) { out(i) = content(i % content.length); i += 1 }
      out
    }
  }

  /** Batch resize: same per-partition batch shape as [[featurize]]
    * (decoder init once per partition, rows streamed). Output keeps the
    * media-table schema so resized assets flow through the same sinks.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val schema = media.select("media_id", "modality", "content", "meta").schema
    media.select("media_id", "modality", "content", "meta")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          // real ImageIO path for decodable images, stub otherwise
          val resized = resizeImage(content, targetW, targetH)
            .getOrElse(resizeStub(content, targetW, targetH))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
            resized, r.getAs[Row]("meta"))
        }
      }(org.apache.spark.sql.Encoders.row(schema)).toDF()
  }

  /** Frame sampling: one input video row fans out to frame rows, every
    * `everyNth` kept. RIFF/AVI payloads demux for REAL ([[demuxAvi]]):
    * frame_idx is the container frame number, frame_ms comes from the
    * avih frame timing, and each emitted frame is the actual video
    * chunk (a decodable JPEG for MJPEG AVIs). Payloads that aren't AVIs
    * fall back to the fixed-size byte split stub (real impl for
    * compressed codecs: ??? — no JDK decoder exists). Either way the
    * plumbing that matters at scale is the ITERATOR fan-out — frames of
    * a partition are never materialized as a whole; each input row
    * yields a lazy iterator, so memory is bounded by one frame
    * regardless of video length.
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 10,
                   frameBytes: Int = 4096, frameMs: Long = 40L): DataFrame = {
    require(everyNth > 0 && frameBytes > 0)
    media.select("media_id", "content")
      .repartition(col("media_id"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val content = r.getAs[Array[Byte]]("content")
          val id = r.getAs[Long]("media_id")
          if (content == null || content.isEmpty) Iterator.empty
          else demuxAvi(content) match {
            case Some(v) =>
              (0 until v.frames.size).iterator
                .filter(_ % everyNth == 0)
                .map { idx =>
                  val (from, len) = v.frames(idx)
                  Row(id, idx, idx * v.usPerFrame / 1000,
                    java.util.Arrays.copyOfRange(content, from, from + len))
                }
            case None =>
              val nFrames = (content.length + frameBytes - 1) / frameBytes
              // lazy range iterator: one frame in memory at a time
              (0 until nFrames).iterator
                .filter(_ % everyNth == 0)
                .map { idx =>
                  val from = idx * frameBytes
                  val until = math.min(from + frameBytes, content.length)
                  Row(id, idx, idx * frameMs,
                    java.util.Arrays.copyOfRange(content, from, until))
                }
          }
        }
      }(org.apache.spark.sql.Encoders.row(frameSchema)).toDF()
  }

  /** Batch feature extraction: per-partition iteration (the Scala analog
    * of `mapInPandas` — one decoder init per partition, streaming rows).
    * Null-safe, constant memory per batch.
    */
  def featurize(media: DataFrame): DataFrame = {
    val rows: Dataset[Row] = media.select("media_id", "modality", "content")
      .repartition(col("media_id")) // spread decode work evenly
    rows.mapPartitions { it =>
      // per-partition decoder init would go here (codec handle, model…)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        // decode chain: real image, then real audio (width:=sample rate,
        // height:=channels, feat:=per-channel RMS zero-padded to 8 — the
        // modality column disambiguates), then real AVI demux (container
        // dimensions + first-frame luminance for MJPEG), then the
        // deterministic stub (compressed codecs, corrupt bytes)
        val (w, h, feat) = decodeImage(content)
          .orElse(decodeAudio(content).map(a =>
            (a.sampleRate.toInt, a.channels, a.rms.padTo(8, 0.0f))))
          .orElse(demuxAvi(content).flatMap { v =>
            val (o, l) = v.frames.head
            decodeImage(java.util.Arrays.copyOfRange(content, o, o + l))
              .map { case (_, _, f) => (v.width, v.height, f) }
          })
          .getOrElse(decodeStub(content))
        val digest =
          if (content == null) ""
          else { sha.reset(); sha.digest(content).map("%02x".format(_)).mkString }
        Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
          if (content == null) 0L else content.length.toLong,
          digest, w, h, feat)
      }
    }(org.apache.spark.sql.Encoders.row(featureSchema)).toDF()
  }
}
