package graft.queries

import graft.SparkSpec
import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** Multi-frame image decode (q75 surface): the stock-JDK animated-GIF
  * path must recover exact frame count, dimensions, and per-frame gray
  * levels; frame sampling keeps every Nth; undecodable payloads drop.
  */
class GifFramesSpec extends SparkSpec {

  test("buildGif round-trips: frame count, dims, exact grays (k=5)") {
    val frames = Multimodal.decodeImageFrames(MediaOps.buildGif(5)).get.toVector
    assert(frames.size == 4) // 3 + 5%4
    assert(frames.map { case (i, _, _, _) => i } == Vector(0, 1, 2, 3))
    assert(frames.forall { case (_, w, h, _) => w == 13 && h == 9 })
    val grays = frames.map { case (_, _, _, f) => math.round(f(0) * 255) }
    assert(grays == Vector(50L, 55L, 60L, 65L))
  }

  test("frameFeatures fans out lazily, samples every 2nd, drops junk") {
    import spark.implicits._
    val media = Seq(
      (0L, MediaOps.buildGif(0)),              // 3 frames -> idx 0, 2
      (7L, MediaOps.buildGif(7)),              // 6 frames -> idx 0, 2, 4
      (9L, Array.fill[Byte](64)(0x3f))         // no reader claims it -> dropped
    ).toDF("media_id", "content")
    val out = Multimodal.frameFeatures(media, everyNth = 2)
      .select(col("media_id"), col("frame_idx"),
        round(element_at(col("feat"), 1) * 255).cast("long").as("gray"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(
      (0L, 0, 0L), (0L, 2, 10L),
      (7L, 0, 70L), (7L, 2, 80L), (7L, 4, 90L)))
  }
}
