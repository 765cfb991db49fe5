package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class MultimodalSpec extends AnyFunSuite with SharedSpark {

  test("decodeMeta round-trips the stub container and isolates corrupt rows") {
    import spark.implicits._
    val good = Multimodal.encodeStub("image", 640, 480, 0, Array.fill[Byte](100)(7))
    val corrupt = Array[Byte](1, 2, 3)
    val df = Seq((1L, good), (2L, corrupt)).toDF("media_id", "content")
    val out = Multimodal.decodeMeta(df).collect()
    assert(out.length == 1) // corrupt row dropped, not fatal
    val m = out.head
    assert(m.mediaId == 1L && m.meta.kind == "image" &&
      m.meta.width == 640 && m.meta.height == 480 && m.meta.payloadBytes == 100L)
  }

  test("resizeStub halves dimensions down to the bound") {
    import spark.implicits._
    val df = Seq((1L, Multimodal.encodeStub("image", 800, 600, 0,
      new Array[Byte](1000)))).toDF("media_id", "content")
    val resized = Multimodal.resizeStub(df, maxDim = 256)
    val meta = Multimodal.decodeMeta(resized).collect().head.meta
    assert(meta.width == 200 && meta.height == 150)
  }

  test("sampleFrames emits every-nth frame rows for video only") {
    import spark.implicits._
    val video = Multimodal.encodeStub("video", 320, 240, 10, new Array[Byte](100))
    val image = Multimodal.encodeStub("image", 320, 240, 0, new Array[Byte](100))
    val df = Seq((1L, video), (2L, image)).toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(df, everyNth = 3).collect()
    // 100 payload bytes / fps 10 = 10 frames; every 3rd -> 0,3,6,9
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getLong(0) == 1L))
  }
}
