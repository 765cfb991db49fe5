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

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeHeader reads real PNG/JPEG headers via the JDK codecs") {
    import spark.implicits._
    val png = pngBytes(100, 40)
    val jpg = {
      val img = new java.awt.image.BufferedImage(
        8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val gmm = Multimodal.encodeStub("video", 320, 240, 10, new Array[Byte](50))
    val df = Seq((1L, png), (2L, jpg), (3L, gmm), (4L, Array[Byte](9, 9)))
      .toDF("media_id", "content")
    val out = Multimodal.decodeMeta(df).collect()
      .map(d => d.mediaId -> d.meta).toMap
    assert(out.size == 3) // garbage row isolated
    assert(out(1L).kind == "image" && out(1L).width == 100 && out(1L).height == 40)
    assert(out(2L).kind == "image" && out(2L).width == 8 && out(2L).height == 6)
    assert(out(3L).kind == "video" && out(3L).fps == 10) // stub path intact
  }

  test("resizeImages really rescales and re-encodes; aspect preserved") {
    import spark.implicits._
    val smallPng = pngBytes(30, 20)
    val df = Seq((1L, pngBytes(100, 40)), (2L, smallPng),
      (3L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    val out = Multimodal.resizeImages(df, maxDim = 50).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out.size == 2) // non-image row isolated
    val resized = Multimodal.decodeHeader(out(1L))
    assert(resized.kind == "image" && resized.width == 50 && resized.height == 20)
    // already within bound: passed through byte-identical, never decoded
    assert(java.util.Arrays.equals(out(2L), smallPng))
  }

  test("resizeImages preserves transparency of ARGB sources") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      100, 100, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(10, 10, 0xCC336699) // one semi-transparent pixel, rest fully transparent
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("media_id", "content")
    val out = Multimodal.resizeImages(df, maxDim = 50).collect()
      .head.getAs[Array[Byte]](1)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back.getColorModel.hasAlpha,
      "resize flattened the alpha channel away")
    // a fully transparent corner must stay transparent, not composite to
    // opaque black
    assert(((back.getRGB(49, 49) >>> 24) & 0xff) == 0)
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
