package graft

import graft.multimodal.Multimodal

/** The real 24-bit BMP codec behind the decode seam (second independent
  * format through [[Multimodal.MediaCodec]]): hand-crafted LE headers,
  * row-padding law, top-down (negative-height) images, loud failures on
  * malformed bytes, and header-derived dimensions through the full
  * decodeFeatures plumbing. */
class BmpCodecSpec extends SparkSpec {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Uncompressed 24-bit BMP from raw BGR rows (caller supplies padding). */
  private def bmp(w: Int, h: Int, raster: Array[Byte]): Array[Byte] =
    "BM".getBytes ++ le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(raster.length) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ raster

  test("decodes dims and channel mean from the bytes, honoring row padding") {
    // 2×2, 24-bit: rowBytes = ((3·2+3)/4)·4 = 8 → 2 pad bytes per row.
    // Pad bytes are 0xEE to PROVE the codec skips them.
    val row0 = Array[Byte](1, 2, 3, 4, 5, 6, 0xee.toByte, 0xee.toByte)
    val row1 = Array[Byte](7, 8, 9, 10, 11, 12, 0xee.toByte, 0xee.toByte)
    val (w, h, mean) = Multimodal.BmpCodec.decode(bmp(2, 2, row0 ++ row1), 999, 999)
    assert(w == 2 && h == 2)
    assert(mean == (1 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9 + 10 + 11 + 12) / 12.0)
  }

  test("top-down (negative height) images decode with |height|") {
    val raster = Array[Byte](10, 20, 30, 0) // 1×1 + 1 pad byte
    val (w, h, mean) = Multimodal.BmpCodec.decode(bmp(1, -1, raster), 0, 0)
    assert(w == 1 && h == 1 && mean == 20.0)
  }

  test("zero-pixel image decodes to mean 0.0") {
    val (w, h, mean) = Multimodal.BmpCodec.decode(bmp(0, 1, Array.empty[Byte]), 5, 5)
    assert(w == 0 && h == 1 && mean == 0.0)
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.BmpCodec.decode(bmp(1, 1, Array[Byte](1, 2, 3, 0)).patch(0, "PX".getBytes, 2), 1, 1)
    }
    intercept[IllegalArgumentException] { // header truncated
      Multimodal.BmpCodec.decode("BM".getBytes, 1, 1)
    }
    intercept[IllegalArgumentException] { // raster truncated
      Multimodal.BmpCodec.decode(bmp(4, 4, Array[Byte](1, 2)), 4, 4)
    }
    intercept[IllegalArgumentException] { // 8-bit unsupported
      val b = bmp(1, 1, Array[Byte](1, 2, 3, 0)); b(28) = 8
      Multimodal.BmpCodec.decode(b, 1, 1)
    }
    intercept[IllegalArgumentException] { // RLE compression unsupported
      val b = bmp(1, 1, Array[Byte](1, 2, 3, 0)); b(30) = 1
      Multimodal.BmpCodec.decode(b, 1, 1)
    }
    intercept[IllegalArgumentException] { // |Int.MinValue| height stays negative
      Multimodal.BmpCodec.decode(bmp(1, Int.MinValue, Array[Byte](1, 2, 3, 0)), 1, 1)
    }
  }

  test("decodeFeatures(BmpCodec) reports header dims, not declared metadata") {
    val sq = spark
    import sq.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, bmp(2, 1, Array[Byte](10, 20, 30, 40, 50, 60, 0, 0))),
      (2L, bmp(1, 2, Array[Byte](9, 9, 9, 0) ++ Array[Byte](3, 3, 3, 0))))
    val df = rows.toDF("id", "media").select(
      col("id"), lit("image").as("modality"), col("media"),
      struct(lit(777).as("width"), lit(888).as("height"),
        lit("bmp").as("codec"), lit(0).as("duration_ms")).as("meta"))
    val got = Multimodal.decodeFeatures(df, Multimodal.BmpCodec)
      .select(col("id"), col("width"), col("height"), col("mean_luma"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2, 1, (10 + 20 + 30 + 40 + 50 + 60) / 6.0)))
    assert(got(2L) == ((1, 2, (9 * 3 + 3 * 3) / 6.0)))
  }
}
