package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ImageFeaturesSpec extends AnyFunSuite with SharedSpark {

  private def decode(bytes: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private val sigs = Seq(0L, -1L, 0x0123456789ABCDEFL, 0xF0F0F0F00F0F0F0FL,
    Dedup.md5Hash60("a"), Dedup.md5Hash60("b"), 1L << 63, 0xAAAAAAAAAAAAAAAAL)

  test("dhash64 round-trips dhashPng bit-for-bit across block sizes") {
    for (sig <- sigs; block <- Seq(1, 2, 3, 5))
      assert(ImageFeatures.dhash64(decode(MediaFixtures.dhashPng(sig, block))) ==
        sig, s"sig=$sig block=$block")
  }

  test("dhash is invariant under global brightness shift (perceptual)") {
    for (sig <- Seq(0x0123456789ABCDEFL, Dedup.md5Hash60("x")))
      assert(
        ImageFeatures.dhash64(decode(MediaFixtures.dhashPng(sig, base = 120))) ==
          ImageFeatures.dhash64(decode(MediaFixtures.dhashPng(sig, base = 135))))
  }

  test("dhash is invariant under step amplitude (contrast)") {
    val sig = Dedup.md5Hash60("contrast")
    assert(
      ImageFeatures.dhash64(decode(MediaFixtures.dhashPng(sig, step = 10))) ==
        ImageFeatures.dhash64(decode(MediaFixtures.dhashPng(sig, step = 4))))
  }

  test("grayGrid handles images smaller than the grid (pixel replication)") {
    // 4x3 image: every 9x8 cell must still sample >= 1 pixel, no crash,
    // and a constant image hashes to 0 (no strict increase anywhere)
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(x => (0 until 3).foreach(y =>
      img.setRGB(x, y, 0x707070)))
    val g = ImageFeatures.grayGrid(img, 9, 8)
    assert(g.length == 8 && g.forall(_.length == 9) &&
      g.flatten.forall(_ == 0x70))
    assert(ImageFeatures.dhash64(img) == 0L)
  }

  test("imageFeatures: exact luma sum, dims, and per-row isolation") {
    import spark.implicits._
    // all-bits-zero sig: every row walks 120, 110, ..., 40; block=3 makes
    // the pixel sum 9 * sum(cells); closed form: 8 rows * (sum over 9
    // cells of 120 - 10c) = 8 * (9*120 - 10*36) = 8 * 720 = 5760; * 9
    val png = MediaFixtures.dhashPng(0L)
    val df = Seq((1L, png), (2L, Array[Byte](9, 9, 9))).toDF("media_id", "content")
    val rows = ImageFeatures.imageFeatures(df).collect()
    assert(rows.length == 1) // corrupt row dropped
    val r = rows.head
    assert(r.getAs[Int]("width") == 27 && r.getAs[Int]("height") == 24)
    assert(r.getAs[Long]("dhash") == 0L)
    assert(r.getAs[Long]("sum_luma") == 9L * 8 * (9 * 120 - 10 * 36))
  }

  test("imageFeatures decodes non-gray rasters via BT.601 luma") {
    import spark.implicits._
    // a pure-red 9x8 image: luma = 299*255/1000 = 76 per pixel
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 9).foreach(x => (0 until 8).foreach(y =>
      img.setRGB(x, y, 0xFF0000)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val r = ImageFeatures.imageFeatures(
      Seq((1L, bos.toByteArray)).toDF("media_id", "content")).collect().head
    assert(r.getAs[Long]("sum_luma") == 72L * 76 &&
      r.getAs[Long]("dhash") == 0L)
  }

  test("imageNearDupPairs equals brute-force pairs on planted flips") {
    import spark.implicits._
    val base = Dedup.md5Hash60("neardup-base")
    val sigs = Map(
      0L -> base,
      1L -> (base ^ (1L << 5)),                 // hamming 1 from base
      2L -> (base ^ (1L << 20) ^ (1L << 40)),   // hamming 2 from base
      3L -> (base ^ 0x7F0L))                    // hamming 7: outside radius
    val media = sigs.toSeq.map { case (id, s) =>
      (id, MediaFixtures.dhashPng(s)) }.toDF("media_id", "content")
    val got = ImageFeatures.imageNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == want && want == Set((0L, 1L, 1L), (0L, 2L, 2L), (1L, 2L, 3L)))
  }

  test("imageNearDupPairs refuses a radius beyond the band guarantee") {
    import spark.implicits._
    val df = Seq((1L, MediaFixtures.dhashPng(0L))).toDF("media_id", "content")
    val e = intercept[IllegalArgumentException](
      ImageFeatures.imageNearDupPairs(df, maxHamming = 4))
    assert(e.getMessage.contains("pigeonhole"))
  }
}
