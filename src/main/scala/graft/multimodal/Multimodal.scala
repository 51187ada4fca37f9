package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the Spark-side plumbing for decode / feature-extract
  * / resize / frame-sample.
  *
  * The container has no image/audio codecs, so THE DECODE KERNEL IS A
  * CLEARLY-MARKED STUB ([[StubCodec]] — a deterministic fake driven by the
  * payload bytes). Everything around it is real and tested: the schema, the
  * binary column handling, partition-sized batch iteration (the Scala
  * analogue of `mapInPandas` — one buffer per partition, vectorized-shaped),
  * and the explode-based frame sampler. Swapping StubCodec for a real codec
  * (JNI/javacv) changes no plumbing.
  */
object Multimodal {

  /** media row: id, modality tag, payload, declared metadata. */
  val MediaSchema = "id BIGINT, modality STRING, media BINARY, meta STRUCT<width:INT, height:INT, codec:STRING, duration_ms:INT>"

  /** Deterministic synthetic media table (seeded bytes; no external data). */
  def syntheticMedia(spark: SparkSession, n: Long, payloadBytes: Int = 256, seed: Long = 42L): DataFrame =
    spark.range(n).select(
      col("id"),
      when(pmod(col("id"), lit(3)) === 0, "image")
        .when(pmod(col("id"), lit(3)) === 1, "audio")
        .otherwise("video").as("modality"),
      // payload: concat of hashed 8-byte words — deterministic, incompressible-ish
      concat(
        (0 until payloadBytes / 8).map(i => unhex(lpad(hex(xxhash64(lit(seed), col("id"), lit(i))), 16, "0"))): _*
      ).as("media"),
      struct(
        (pmod(xxhash64(lit(seed + 1), col("id")), lit(1024)) + 16).cast("int").as("width"),
        (pmod(xxhash64(lit(seed + 2), col("id")), lit(768)) + 16).cast("int").as("height"),
        lit("stub").as("codec"),
        (pmod(xxhash64(lit(seed + 3), col("id")), lit(60000)) + 1000).cast("int").as("duration_ms")
      ).as("meta")
    )

  /** ??? decode seam — deterministic fake standing in for the real codec.
    * Returns (decoded width, height, mean "pixel" value) purely from bytes. */
  object StubCodec {
    def decode(payload: Array[Byte], width: Int, height: Int): (Int, Int, Double) = {
      // REAL CODEC GOES HERE (JNI / javacv). Stub: byte-mean as "luminance".
      var s = 0L
      var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
      (width, height, if (payload.isEmpty) 0.0 else s.toDouble / payload.length)
    }
  }

  case class MediaRow(id: Long, modality: String, media: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(id: Long, modality: String, width: Int, height: Int, mean_luma: Double, n_bytes: Int)

  /** Batch decode — partition-at-a-time iteration (the `mapInPandas` shape:
    * each partition is processed as one streaming batch; the stub kernel is
    * called per element but a real codec would process the whole buffer).
    * No driver collect, no shuffle. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val ds = df.select(
      col("id"), col("modality"), col("media"),
      col("meta.width").as("width"), col("meta.height").as("height")
    ).as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h, luma) = StubCodec.decode(r.media, r.width, r.height)
        MediaFeatures(r.id, r.modality, w, h, luma, r.media.length)
      }
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** Resize plan: pure metadata transform (target box, preserve aspect);
    * the pixel work would happen in the decode kernel. */
  def withResizePlan(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("meta.width"), lit(maxH) / col("meta.height"), lit(1.0))
    df.withColumn("target_width", floor(col("meta.width") * scale).cast("int"))
      .withColumn("target_height", floor(col("meta.height") * scale).cast("int"))
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `everyMs` intervals — explode of a generated offset sequence, fully
    * parallel, no UDF. */
  def sampleFrames(df: DataFrame, everyMs: Int): DataFrame =
    df.where(col("modality") === "video")
      .select(
        col("id"), col("media"), col("meta"),
        posexplode(sequence(lit(0), col("meta.duration_ms") - 1, lit(everyMs))).as(Seq("frame_idx", "offset_ms"))
      )
}
