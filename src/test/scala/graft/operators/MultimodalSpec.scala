package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import Multimodal._

  private def items = {
    import spark.implicits._
    spark.createDataset(Seq(
      MediaItem(1L, "image", DecoderStub.encode(640, 480, 1, Array[Byte](1, 2, 3))),
      MediaItem(2L, "video", DecoderStub.encode(1920, 1080, 30, Array[Byte](4, 5))),
      MediaItem(3L, "audio", DecoderStub.encode(0, 0, 0, Array.fill[Byte](100)(7)))))
  }

  test("extractFeatures parses headers batch-wise, no shuffle") {
    val f = extractFeatures(items).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width === 640 && f(1L).height === 480)
    assert(f(2L).n_frames === 30)
    assert(f(3L).byte_len === 112L)
    // narrow plan: no Exchange node
    val plan = extractFeatures(items).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("resize rewrites header, preserves body") {
    val resized = resize(items, 224, 224).collect().map(x => x.media_id -> x).toMap
    val f = DecoderStub.decode(resized(1L))
    assert(f.width === 224 && f.height === 224)
    assert(resized(1L).payload.length === 12 + 3)
  }

  test("sampleFrames explodes video into frame rows") {
    val frames = sampleFrames(items, everyN = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.filter(_._1 == 2L).map(_._2).toSeq.sorted === Seq(0, 10, 20))
    assert(!frames.exists(_._1 == 3L)) // zero frames → no rows
  }
}
