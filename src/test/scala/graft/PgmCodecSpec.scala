package graft

import java.nio.charset.StandardCharsets

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** The real PGM (P5) codec behind the decode seam: exact round-trips on
  * known rasters, Netpbm header tolerance, loud failures on malformed
  * bytes, and header-derived (not metadata-echoed) dimensions through the
  * full decodeFeatures plumbing. */
class PgmCodecSpec extends SparkSpec {

  private def pgm(w: Int, h: Int, px: Array[Byte], header: String = null): Array[Byte] = {
    val head = Option(header).getOrElse(s"P5\n$w $h\n255\n").getBytes(StandardCharsets.US_ASCII)
    head ++ px
  }

  test("decodes dimensions and mean from the bytes") {
    val px = Array[Byte](0, 50, 100, (200 & 0xff).toByte, (250 & 0xff).toByte, 10)
    val (w, h, mean) = Multimodal.PgmCodec.decode(pgm(3, 2, px), 999, 999)
    assert(w == 3 && h == 2)
    assert(mean == (0 + 50 + 100 + 200 + 250 + 10) / 6.0)
  }

  test("tolerates Netpbm comments and mixed whitespace in the header") {
    val px = Array[Byte](7, 9)
    val bytes = pgm(2, 1, px, "P5 # a comment\n # more\n 2\t1 255\n")
    val (w, h, mean) = Multimodal.PgmCodec.decode(bytes, 0, 0)
    assert(w == 2 && h == 1 && mean == 8.0)
  }

  test("zero-size raster decodes to mean 0.0") {
    val (w, h, mean) = Multimodal.PgmCodec.decode(pgm(0, 1, Array.empty[Byte]), 5, 5)
    assert(w == 0 && h == 1 && mean == 0.0)
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.PgmCodec.decode("P6\n1 1\n255\nx".getBytes(StandardCharsets.US_ASCII), 1, 1)
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.PgmCodec.decode(pgm(4, 4, Array[Byte](1, 2)), 4, 4)
    }
    intercept[IllegalArgumentException] { // 16-bit maxval unsupported
      Multimodal.PgmCodec.decode(pgm(1, 1, Array[Byte](1, 1), "P5\n1 1\n65535\n"), 1, 1)
    }
    intercept[IllegalArgumentException] { // hostile width must not wrap Int
      Multimodal.PgmCodec.decode(
        pgm(1, 1, Array[Byte](1), "P5\n99999999999999 1\n255\n"), 1, 1)
    }
    intercept[IllegalArgumentException] { // 2^32: wraps an Int back to 0
      Multimodal.PgmCodec.decode(
        pgm(1, 1, Array[Byte](1), "P5\n4294967296 1\n255\n"), 1, 1)
    }
    intercept[IllegalArgumentException] { // 3e9: wraps an Int negative
      Multimodal.PgmCodec.decode(
        pgm(1, 1, Array[Byte](1), "P5\n3000000000 1\n255\n"), 1, 1)
    }
  }

  test("decodeFeatures(PgmCodec) reports header dims, not declared metadata") {
    val sq = spark
    import sq.implicits._
    val rows = Seq((1L, pgm(4, 2, Array.tabulate(8)(i => (i * 10).toByte))),
      (2L, pgm(1, 3, Array[Byte](10, 20, 30))))
    val df = rows.toDF("id", "media").select(
      col("id"), lit("image").as("modality"), col("media"),
      struct(lit(777).as("width"), lit(888).as("height"),
        lit("pgm").as("codec"), lit(0).as("duration_ms")).as("meta"))
    val got = Multimodal.decodeFeatures(df, Multimodal.PgmCodec)
      .select(col("id"), col("width"), col("height"), col("mean_luma"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4, 2, (0 until 8).map(_ * 10).sum / 8.0)))
    assert(got(2L) == ((1, 3, 20.0)))
  }
}
