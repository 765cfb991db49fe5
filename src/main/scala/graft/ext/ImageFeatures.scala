package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] REAL pixel-level image features over opaque binary columns —
  * the point where the multimodal plug point shrinks again: raster
  * formats the JDK ships codecs for (PNG/JPEG/GIF/BMP/WBMP) are decoded
  * to PIXELS here (javax.imageio), not just header dimensions, and the
  * decoded rasters feed a perceptual hash + near-duplicate operator.
  * Only compressed AUDIO/VIDEO sample decode remains a declared stub
  * (see [[Multimodal]] / [[CompressedMedia]]).
  *
  * The hash is the public dHash ("difference hash", Krawetz 2013 — the
  * convention WebDataset-era image dedup pipelines use): grayscale,
  * downsample to a 9x8 grid, one bit per horizontal neighbor comparison.
  * Everything is EXACT INTEGER arithmetic (BT.601 luma at /1000 scale,
  * area-average downsample with floor division) so a hash is
  * bit-reproducible across JVMs and platforms — no Graphics2D
  * interpolation, no float rounding — which is what lets probes oracle
  * the full PNG-encode → real-decode → hash pipeline in closed form.
  *
  * Scale story (100 TB of images): hashing is a per-row scalar pass —
  * zero shuffle, the scan parallelism IS the hash parallelism, and the
  * shuffle that near-dup detection does need carries only (id, 64-bit
  * signature) band rows, never image bytes. The candidate join is the
  * same 4-band pigeonhole as [[Dedup.simhashNearDupPairs]] — an
  * equi-join on 16-bit band chunks, never an all-pairs product.
  */
object ImageFeatures {

  /** Integer BT.601 luma in [0, 255]: (299 R + 587 G + 114 B) / 1000.
    * Weights sum to exactly 1000, so a gray pixel (r=g=b=v) maps to v.
    */
  private def lumaOf(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xFF
    val g = (rgb >> 8) & 0xFF
    val b = rgb & 0xFF
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Exact area-average grayscale downsample to a gridW x gridH grid.
    * Cell (gx, gy) averages the pixel block [gx*W/gridW, (gx+1)*W/gridW)
    * x [gy*H/gridH, (gy+1)*H/gridH) with integer floor division — for a
    * block-aligned image (W a multiple of gridW, constant-gray blocks)
    * the average is exact, and for images SMALLER than the grid each
    * cell still samples at least one pixel (replication, never a crash).
    */
  private[ext] def grayGrid(img: java.awt.image.BufferedImage,
                            gridW: Int, gridH: Int): Array[Array[Int]] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(gridH) { gy =>
      val y0 = gy * h / gridH
      val y1 = math.min(math.max((gy + 1) * h / gridH, y0 + 1), h)
      Array.tabulate(gridW) { gx =>
        val x0 = gx * w / gridW
        val x1 = math.min(math.max((gx + 1) * w / gridW, x0 + 1), w)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += lumaOf(img.getRGB(x, y)); x += 1 }
          y += 1
        }
        (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
      }
    }
  }

  /** 64-bit dHash of a decoded raster: 9x8 gray grid, bit (row*8 + col)
    * set iff cell (row, col+1) is STRICTLY brighter than cell (row, col).
    * Invariant under global brightness shifts and under block-size
    * changes that preserve cell averages — the perceptual property
    * (ImageFeaturesSpec pins both).
    */
  def dhash64(img: java.awt.image.BufferedImage): Long = {
    val g = grayGrid(img, 9, 8)
    var out = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r)(c + 1) > g(r)(c)) out |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Real raster decode via the JDK codec registry; None for anything
    * ImageIO cannot fully decode (including truncated bodies behind an
    * intact header — per-row isolation, same contract as
    * [[Multimodal.decodeMeta]]).
    */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Per-image pixel features in ONE real decode + one raster pass:
    * (media_id, width, height, dhash, sum_luma). `sum_luma` is the exact
    * integer sum of BT.601 luma over every pixel (a Long holds 255 *
    * pixels up to ~10^16 pixels — any real image). Zero shuffle; rows
    * that are not decodable rasters are dropped.
    */
  def imageFeatures(media: DataFrame, idCol: String = "media_id",
                    contentCol: String = "content"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some(img) =>
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) { sum += lumaOf(img.getRGB(x, y)); x += 1 }
                y += 1
              }
              Iterator.single((id, img.getWidth, img.getHeight, dhash64(img), sum))
            case None => Iterator.empty
          }
        }
      }
      .toDF("media_id", "width", "height", "dhash", "sum_luma")
  }

  /** Image near-duplicate pairs within a Hamming radius over the 64-bit
    * dHash: pigeonhole over four 16-bit bands (any pair within distance 3
    * shares at least one exact band — same guarantee structure as
    * [[Dedup.simhashNearDupPairs]]), equi-join on (band, chunk), exact
    * popcount verify. Image bytes never shuffle: the signature frame is
    * localCheckpointed once and both join sides read the 16-byte rows.
    */
  def imageNearDupPairs(media: DataFrame, idCol: String = "media_id",
                        contentCol: String = "content",
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-band pigeonhole guarantee (3)")
    val sig = imageFeatures(media, idCol, contentCol)
      .select(col("media_id"), col("dhash"))
      .localCheckpoint()
    val banded = sig.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*))
        .as("bc"))
      .select(col("media_id"), col("dhash"), col("bc.band"), col("bc.chunk"))
    val a = banded.select(col("band"), col("chunk"),
      col("media_id").as("id_a"), col("dhash").as("dh_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("media_id").as("id_b"), col("dhash").as("dh_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("dh_a").bitwiseXOR(col("dh_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
