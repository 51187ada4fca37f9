package graft

import graft.multimodal.Multimodal

/** The real RIFF/WAVE PCM codec behind the decode seam (third format,
  * second modality): hand-crafted LE chunks, unknown-chunk skipping with
  * the odd-size pad byte, signed-sample mean, multi-channel frames, loud
  * failures, and header-derived numbers through decodeFeatures. */
class WavCodecSpec extends SparkSpec {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fmtChunk(channels: Int, bits: Int = 16, format: Int = 1): Array[Byte] =
    "fmt ".getBytes ++ le32(16) ++ le16(format) ++ le16(channels) ++
      le32(8000) ++ le32(8000 * channels * bits / 8) ++ le16(channels * bits / 8) ++ le16(bits)

  private def wav(channels: Int, samples: Seq[Int], pre: Array[Byte] = Array.empty): Array[Byte] = {
    val data = "data".getBytes ++ le32(samples.length * 2) ++ samples.flatMap(le16).toArray
    val body = "WAVE".getBytes ++ fmtChunk(channels) ++ pre ++ data
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  test("decodes frames, channels, and SIGNED sample mean from the bytes") {
    val (f, c, mean) = Multimodal.WavCodec.decode(wav(1, Seq(100, -200, 300, -400)), 9, 9)
    assert(f == 4 && c == 1)
    assert(mean == (100 - 200 + 300 - 400) / 4.0)
  }

  test("stereo: frames = samples / channels") {
    val (f, c, mean) = Multimodal.WavCodec.decode(wav(2, Seq(1000, -1000, 500, -500)), 0, 0)
    assert(f == 2 && c == 2 && mean == 0.0)
  }

  test("unknown chunks are skipped, including the odd-size pad byte") {
    // a 3-byte LIST chunk forces the pad-byte path before 'data'
    val junk = "LIST".getBytes ++ le32(3) ++ Array[Byte](9, 9, 9, 0)
    val (f, c, mean) = Multimodal.WavCodec.decode(wav(1, Seq(32000, -32000, 42), pre = junk), 0, 0)
    assert(f == 3 && c == 1 && mean == 14.0)
  }

  test("zero-length data decodes to mean 0.0") {
    val (f, c, mean) = Multimodal.WavCodec.decode(wav(1, Seq.empty), 5, 5)
    assert(f == 0 && c == 1 && mean == 0.0)
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.WavCodec.decode("JUNK".getBytes ++ wav(1, Seq(1)).drop(4), 0, 0)
    }
    intercept[IllegalArgumentException] { // not WAVE
      val b = wav(1, Seq(1)); b(8) = 'A'
      Multimodal.WavCodec.decode(b, 0, 0)
    }
    intercept[IllegalArgumentException] { // non-PCM format
      val b = wav(1, Seq(1)); b(20) = 3
      Multimodal.WavCodec.decode(b, 0, 0)
    }
    intercept[IllegalArgumentException] { // 8-bit unsupported
      val b = wav(1, Seq(1)); b(34) = 8
      Multimodal.WavCodec.decode(b, 0, 0)
    }
    intercept[IllegalArgumentException] { // chunk overruns payload
      Multimodal.WavCodec.decode(wav(1, Seq(1, 2, 3)).dropRight(2), 0, 0)
    }
    intercept[IllegalArgumentException] { // data not whole stereo frames
      Multimodal.WavCodec.decode(wav(2, Seq(1, 2, 3)), 0, 0)
    }
    intercept[IllegalArgumentException] { // no data chunk at all
      val noData = "RIFF".getBytes ++ le32(20) ++ "WAVE".getBytes ++ fmtChunk(1)
      Multimodal.WavCodec.decode(noData, 0, 0)
    }
  }

  test("decodeFeatures(WavCodec) reports byte-derived numbers, not declared metadata") {
    val sq = spark
    import sq.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, wav(1, Seq(100, 300))), (2L, wav(2, Seq(-100, -300, 500, 700))))
    val df = rows.toDF("id", "media").select(
      col("id"), lit("audio").as("modality"), col("media"),
      struct(lit(777).as("width"), lit(888).as("height"),
        lit("wav").as("codec"), lit(0).as("duration_ms")).as("meta"))
    val got = Multimodal.decodeFeatures(df, Multimodal.WavCodec)
      .select(col("id"), col("width"), col("height"), col("mean_luma"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2, 1, 200.0)))
    assert(got(2L) == ((2, 2, 200.0)))
  }
}
