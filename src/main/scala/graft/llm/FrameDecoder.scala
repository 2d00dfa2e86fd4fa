package graft.llm

/** The pluggable `binary → frames` decode contract (SURVEY §2.1 S14 /
  * r9-verdict task 8): everything the engine needs from a video/animation
  * decoder is "give me a LAZY iterator of (width, height, feature) frames,
  * or decline the payload". Query code ([[Multimodal.frameFeatures]])
  * depends only on this trait, so an external decoder binding (an
  * ffmpeg/JNI impl for H.264/VP9/AAC) slots in by prepending one instance
  * to the decoder chain — no query or plumbing changes. The stock chain
  * covers what a bare JDK can decode for real:
  *
  *  - [[FrameDecoder.AviMjpegFrames]] — MJPEG-in-AVI: container demux
  *    ([[Multimodal.demuxAvi]]) + per-frame stock JDK JPEG decode. A real
  *    compressed-video path with zero external deps (MJPEG frames are
  *    standalone JPEGs).
  *  - [[FrameDecoder.ImageIoFrames]] — multi-frame image containers
  *    (animated GIF) via the registered ImageIO readers.
  *
  * Laziness is the load-bearing property at scale: `frames` must decode
  * on pull (one raster in memory per partition at a time), because a
  * partition of hour-long videos must never materialize all frames —
  * the same batch shape a `mapInPandas` impl would have.
  */
trait FrameDecoder extends Serializable {
  def name: String

  /** Lazily decoded frames of `content` as `(containerIdx, width,
    * height, feature)`, or None when this decoder does not claim the
    * payload (the chain then tries the next decoder).
    *
    * `containerIdx` is the frame's position ON THE CONTAINER'S FRAME
    * GRID, not a post-skip ordinal: a decoder that skips an undecodable
    * mid-stream frame must still number later frames by container
    * position, so every-Nth sampling and frame_ms derivation stay
    * aligned to the container's timeline after a bad frame.
    */
  def frames(content: Array[Byte]): Option[Iterator[(Int, Int, Int, Array[Float])]]
}

object FrameDecoder {

  /** Multi-frame image containers (animated GIF on a stock JDK) via the
    * registered ImageIO readers — the q75-gated path.
    */
  object ImageIoFrames extends FrameDecoder {
    val name = "imageio"
    def frames(content: Array[Byte]): Option[Iterator[(Int, Int, Int, Array[Float])]] =
      Multimodal.decodeImageFrames(content)
  }

  /** MJPEG-in-AVI: demux the RIFF container, decode each video chunk as
    * a standalone JPEG. Claims a payload only when it is an AVI whose
    * FIRST frame chunk image-decodes — an AVI carrying H.264 (or any
    * codec the JDK can't decode) falls through to the next decoder in
    * the chain (where an ffmpeg-backed impl would pick it up).
    * Mid-stream frames that fail to decode (truncated tail chunk) are
    * skipped rather than failing the asset.
    */
  object AviMjpegFrames extends FrameDecoder {
    val name = "avi-mjpeg"
    def frames(content: Array[Byte]): Option[Iterator[(Int, Int, Int, Array[Float])]] =
      Multimodal.demuxAvi(content).flatMap { v =>
        // container-aligned: a skipped mid-stream frame (truncated tail
        // chunk) leaves a HOLE in the idx sequence rather than shifting
        // later frames off the container's frame grid
        def decodeAt(idx: Int): Option[(Int, Int, Int, Array[Float])] = {
          val (from, len) = v.frames(idx)
          Multimodal.decodeImage(java.util.Arrays.copyOfRange(content, from, from + len))
            .map { case (w, h, feat) => (idx, w, h, feat) }
        }
        // the claim probe IS frame 0's decode — seed the lazy iterator
        // with it rather than decoding the first frame twice per asset
        if (v.frames.isEmpty) None // demuxAvi yields None here, but stay total
        else decodeAt(0).map(f0 =>
          Iterator.single(f0) ++ (1 until v.frames.size).iterator.flatMap(decodeAt(_).iterator))
      }
  }

  /** The stock decoder chain: first claimant wins. External bindings
    * prepend (e.g. `ffmpegDecoder +: FrameDecoder.stock`).
    */
  val stock: Seq[FrameDecoder] = Seq(AviMjpegFrames, ImageIoFrames)

  /** First decoder in `chain` that claims `content`, as lazy frames. */
  def decode(chain: Seq[FrameDecoder], content: Array[Byte])
  : Option[Iterator[(Int, Int, Int, Array[Float])]] = {
    val it = chain.iterator
    while (it.hasNext) {
      val d = it.next()
      d.frames(content) match {
        case some @ Some(_) => return some
        case None => ()
      }
    }
    None
  }
}
