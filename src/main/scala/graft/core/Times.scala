package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.functions._

/** Timestamp arithmetic helpers that work for both TIMESTAMP and
  * TIMESTAMP_NTZ inputs (parquet written by non-Spark writers is usually
  * NTZ; the session timezone is pinned to UTC so the casts are lossless). */
object Times {
  /** Epoch micros of a timestamp column of either flavor. NULL (not an
    * ANSI cast error) for values with no timestamp image — NaN/±Inf
    * numeric event times — so distance/tolerance compares treat them as
    * "no usable candidate", matching the exec kernel's finite-ts guard. */
  def micros(c: Column): Column = unix_micros(c.try_cast("timestamp_ltz"))
  /** Micros → timestamp of the same flavor as `like`. */
  def fromMicros(c: Column, like: DataType): Column = timestamp_micros(c).cast(like)
}
