package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, Multimodal}

/** Header-metadata passthrough (VERDICT r18 ask #8): the no-decode
  * sniff surfaces BMP/PNG container fields and PNG tEXt sidecar
  * metadata as columns; poison payloads yield nulls. */
class MediaMetaSpec extends SparkSpec {
  import spark.implicits._

  test("BMP and PNG headers surface without decode; tEXt chunks " +
      "collect in file order; poison rows null out") {
    val bmp = Multimodal.SyntheticMedia.bmp24(13, 9)((x, y) =>
      (x * 10 % 256, y * 20 % 256, 30))
    var png = MediaDedup.pngReencode(bmp)
    png = Multimodal.SyntheticMedia.pngAddText(png, "src", "crawl7")
    png = Multimodal.SyntheticMedia.pngAddText(png, "lang", "de")
    val rows = Seq(
      (0L, bmp),
      (1L, png),
      (2L, Array[Byte](1, 2, 3)),                 // unknown magic
      (3L, png.take(40)),                          // truncated PNG
      (4L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.headerMeta(rows.toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    // BMP: dims + bpp, no color type, empty (not null) text fields
    assert(out(0).getAs[String]("meta_format") == "bmp")
    assert(out(0).getAs[Int]("meta_width") == 13 &&
      out(0).getAs[Int]("meta_height") == 9 &&
      out(0).getAs[Int]("meta_depth") == 24)
    assert(out(0).isNullAt(out(0).fieldIndex("meta_color_type")))
    assert(out(0).getAs[Int]("n_text") == 0 &&
      out(0).getAs[String]("text_kv") == "")
    // PNG: IHDR 8-bit truecolor + ordered tEXt key=value pairs
    assert(out(1).getAs[String]("meta_format") == "png")
    assert(out(1).getAs[Int]("meta_width") == 13 &&
      out(1).getAs[Int]("meta_height") == 9 &&
      out(1).getAs[Int]("meta_depth") == 8 &&
      out(1).getAs[Int]("meta_color_type") == 2)
    assert(out(1).getAs[Int]("n_text") == 2 &&
      out(1).getAs[String]("text_kv") == "src=crawl7;lang=de")
    // poison rows: all meta columns null, input columns preserved
    for (i <- 2 to 4) {
      assert(out(i).getLong(0) == i.toLong)
      for (c <- Seq("meta_format", "meta_width", "meta_height",
          "meta_depth", "meta_color_type", "n_text", "text_kv"))
        assert(out(i).isNullAt(out(i).fieldIndex(c)), s"row $i col $c")
    }
  }

  test("JPEG SOF headers surface: dims + sample precision, no decode") {
    val bmp = Multimodal.SyntheticMedia.bmp24(21, 14)((x, y) =>
      (x * 9 % 256, y * 13 % 256, 77))
    val jpg = MediaDedup.jpegReencode(bmp)
    val out = Multimodal.headerMeta(
      Seq((0L, jpg), (1L, jpg.take(6))).toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    assert(out(0).getAs[String]("meta_format") == "jpeg")
    assert(out(0).getAs[Int]("meta_width") == 21 &&
      out(0).getAs[Int]("meta_height") == 14 &&
      out(0).getAs[Int]("meta_depth") == 8)
    assert(out(0).isNullAt(out(0).fieldIndex("meta_color_type")))
    assert(out(0).getAs[Int]("n_text") == 0 &&
      out(0).getAs[String]("text_kv") == "")
    // truncated before any SOF: nulls
    assert(out(1).isNullAt(out(1).fieldIndex("meta_format")))
  }

  test("a crafted PNG chunk length near 2^31 nulls out instead of " +
      "bypassing the truncation guard (ADVICE r19: Long bound)") {
    // valid signature + IHDR, then a chunk whose declared length
    // makes o + 12 + len overflow Int — the old Int-math guard let
    // it through and the walk then read at a negative offset.
    val bmp = Multimodal.SyntheticMedia.bmp24(9, 8)((_, _) => (1, 2, 3))
    val png = MediaDedup.pngReencode(bmp)
    val evil = java.util.Arrays.copyOf(png, 33 + 8)
    val evilLen = Int.MaxValue - 20 // 33 + 12 + len wraps negative
    evil(33) = ((evilLen >>> 24) & 0xff).toByte
    evil(34) = ((evilLen >>> 16) & 0xff).toByte
    evil(35) = ((evilLen >>> 8) & 0xff).toByte
    evil(36) = (evilLen & 0xff).toByte
    evil(37) = 't'.toByte; evil(38) = 'E'.toByte
    evil(39) = 'X'.toByte; evil(40) = 't'.toByte
    val out = Multimodal.headerMeta(
      Seq((0L, evil)).toDF("media_id", "payload")).collect()
    for (c <- Seq("meta_format", "meta_width", "meta_height",
        "meta_depth", "meta_color_type", "n_text", "text_kv"))
      assert(out(0).isNullAt(out(0).fieldIndex(c)), s"col $c")
  }

  test("pngAddText emits a CRC-valid chunk every decoder accepts") {
    val bmp = Multimodal.SyntheticMedia.bmp24(10, 10)((_, _) => (5, 6, 7))
    val png = Multimodal.SyntheticMedia.pngAddText(
      MediaDedup.pngReencode(bmp), "k", "v")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 10 && img.getHeight == 10)
    // and the pixel content is untouched (tEXt is ancillary)
    assert(MediaDedup.dhash64Bytes(png) ==
      MediaDedup.dhash64Bytes(MediaDedup.pngReencode(bmp)))
  }
}
