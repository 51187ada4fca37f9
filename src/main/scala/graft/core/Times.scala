package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.functions._

/** Timestamp arithmetic helpers that work for both TIMESTAMP and
  * TIMESTAMP_NTZ inputs (parquet written by non-Spark writers is usually
  * NTZ; the session timezone is pinned to UTC so the casts are lossless). */
object Times {
  /** Epoch micros of a timestamp column of either flavor. */
  def micros(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))
  /** Micros → timestamp of the same flavor as `like`. */
  def fromMicros(c: Column, like: DataType): Column = timestamp_micros(c).cast(like)
}
