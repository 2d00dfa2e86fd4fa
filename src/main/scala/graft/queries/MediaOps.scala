package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.Multimodal

/** Driver-gated multimodal decode (SURVEY §2.1 S14 / BASELINE north
  * star): the REAL pure-JVM codec paths — ImageIO for images,
  * javax.sound for audio — proven against the DuckDB oracle by
  * construction. Each nation row becomes a synthetic media payload
  * whose decoded properties are exact integer/dyadic-rational
  * arithmetic on the key (no float fuzz: amplitudes are k/256, sample
  * counts multiples of 8), so the oracle can predict the decode output
  * without decoding anything. A broken decoder, an off-by-one in frame
  * accounting, or RMS drift all hash-mismatch.
  *
  * The payload builders are executor-side (a map over the table, no
  * driver collect); a production media table is TB-scale and this
  * shape — binary column in, typed features out — is exactly
  * [[Multimodal.featurize]]/[[Multimodal.featurizeAudio]]'s contract.
  */
object MediaOps {
  import Tables.t

  /** One second-ish of mono 16-bit PCM square wave at 8 kHz: amplitude
    * `(k+1) * 128` (RMS exactly `(k+1)/256` of full scale), `4000 +
    * 800k` frames (duration exactly `500 + 100k` ms).
    */
  private[queries] def buildWav(k: Int): Array[Byte] = {
    val rate = 8000
    val frames = 4000 + 800 * k
    val amp = (k + 1) * 128
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = if (i % 2 == 0) amp else -amp
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = le16(1) ++ le16(1) ++ le32(rate.toLong) ++ le32(rate * 2L) ++
      le16(2) ++ le16(16)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 24 + 8 + data.length.toLong) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16L) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
  }

  /** A `(16+k) × (8+k)` PNG filled with gray level `10k` — lossless, so
    * decode returns the exact level.
    */
  private[queries] def buildPng(k: Int): Array[Byte] = {
    val w = 16 + k; val h = 8 + k; val g = 10 * k
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** An animated GIF with `3 + k%4` full-size frames of `(8+k) × (4+k)`
    * pixels, frame `i` a solid gray `10k + 5i` (max 255 at k=23). An
    * explicit 256-gray `IndexColorModel` palette makes the GIF encode
    * lossless, so every decoded frame recovers its gray exactly.
    */
  private[queries] def buildGif(k: Int): Array[Byte] = {
    val w = 8 + k; val h = 4 + k; val nFrames = 3 + k % 4
    val grays = Array.tabulate(256)(_.toByte)
    val palette = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(10 * k + 5 * i, 10 * k + 5 * i, 10 * k + 5 * i))
      g2.fillRect(0, 0, w, h)
      g2.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  private val wavUdf = udf((k: Int) => buildWav(k))
  private val pngUdf = udf((k: Int) => buildPng(k))
  private val gifUdf = udf((k: Int) => buildGif(k))

  /** Real audio decode under the oracle: WAV payloads built per nation
    * key, decoded by [[Multimodal.featurizeAudio]] (stock-JDK
    * javax.sound), every decoded property predicted arithmetically.
    */
  val audioFeatures: Q = Q(
    "q72_audio_features",
    """SELECT CAST(n_nationkey AS BIGINT) AS media_id,
      |       CAST(8000.0 AS DOUBLE) AS sample_rate,
      |       CAST(1 AS INT) AS channels,
      |       CAST(4000 + 800 * n_nationkey AS BIGINT) AS n_frames,
      |       CAST(500 + 100 * n_nationkey AS BIGINT) AS duration_ms,
      |       CAST(n_nationkey + 1 AS DOUBLE) / 256 AS rms0
      |FROM nation
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    val media = t(s, d, "nation").select(
      col("n_nationkey").cast("long").as("media_id"),
      lit("audio").as("modality"),
      wavUdf(col("n_nationkey").cast("int")).as("content"))
    Multimodal.featurizeAudio(media).select(
      col("media_id"),
      col("sample_rate").cast("double").as("sample_rate"),
      col("channels"),
      col("n_frames"),
      col("duration_ms"),
      element_at(col("rms"), 1).cast("double").as("rms0"))
      .orderBy("media_id")
  }

  /** Real image decode under the oracle: PNG payloads per nation key,
    * decoded by [[Multimodal.featurize]] (stock-JDK ImageIO); true
    * dimensions and the exact gray level recovered from the luminance
    * feature (`round(band * 255)` — lossless PNG makes it exact).
    */
  val imageFeatures: Q = Q(
    "q73_image_features",
    """SELECT CAST(n_nationkey AS BIGINT) AS media_id,
      |       CAST(16 + n_nationkey AS INT) AS width,
      |       CAST(8 + n_nationkey AS INT) AS height,
      |       CAST(10 * n_nationkey AS BIGINT) AS gray
      |FROM nation
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    val media = t(s, d, "nation").select(
      col("n_nationkey").cast("long").as("media_id"),
      lit("image").as("modality"),
      pngUdf(col("n_nationkey").cast("int")).as("content"))
    Multimodal.featurize(media).select(
      col("media_id"),
      col("width"),
      col("height"),
      round(element_at(col("feat"), 1) * 255).cast("long").as("gray"))
      .orderBy("media_id")
  }

  /** Real MULTI-FRAME decode under the oracle: animated-GIF payloads
    * per nation key, frame-sampled (every 2nd) and decoded by
    * [[Multimodal.frameFeatures]] (stock-JDK ImageIO multi-image
    * read); the oracle unrolls the frame fan-out with `range()` and
    * predicts each frame's exact gray. A mis-ordered frame index, a
    * dropped frame, or palette quantization drift hash-mismatches.
    */
  val videoFrames: Q = Q(
    "q75_video_frames",
    """WITH f AS (
      |  SELECT n_nationkey AS k,
      |         UNNEST(range(0, 3 + n_nationkey % 4)) AS i
      |  FROM nation)
      |SELECT CAST(k AS BIGINT) AS media_id,
      |       CAST(i AS INT) AS frame_idx,
      |       CAST(8 + k AS INT) AS width,
      |       CAST(4 + k AS INT) AS height,
      |       CAST(10 * k + 5 * i AS BIGINT) AS gray
      |FROM f WHERE i % 2 = 0
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
    val media = t(s, d, "nation").select(
      col("n_nationkey").cast("long").as("media_id"),
      gifUdf(col("n_nationkey").cast("int")).as("content"))
    Multimodal.frameFeatures(media, everyNth = 2).select(
      col("media_id"),
      col("frame_idx"),
      col("width"),
      col("height"),
      round(element_at(col("feat"), 1) * 255).cast("long").as("gray"))
      .orderBy("media_id", "frame_idx")
  }

  val all: Seq[Q] = Seq(audioFeatures, imageFeatures, videoFrames)
}
