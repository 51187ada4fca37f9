package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Typed projection out of a semi-structured JSON string column — the
  * ingest step for event-property payloads (the `events.props` shape:
  * loosely-schema'd per-event attributes riding a typed table).
  *
  * Declared as ONE `from_json` against the exact requested schema;
  * Catalyst's OptimizeJsonExprs then rewrites each `GetStructField` into
  * its own SINGLE-FIELD pruned parse (Jackson skips every other subtree —
  * each pruned parse materializes exactly one field, which the optimizer
  * prefers over one wide parse). Unparseable documents and absent fields
  * yield NULL (PERMISSIVE mode), matching the lenient-ingest law of
  * [[graft.core.Canonical]]: bad payloads degrade to null features, they
  * never kill the job.
  *
  * Scale shape: pure scan-level projection — no shuffle, no join.
  * `JsonToStructs` is a CodegenFallback expression, so the projection sits
  * just outside whole-stage codegen (one ColumnarToRow handoff) — the cost
  * is the parse itself, not the eval mode; heavy repeated extraction
  * should parse once into a typed column and persist. */
object Json {

  /** Adds one typed column per (field, type) extracted from `jsonCol`,
    * named `prefix + field`. */
  def extract(
      df: DataFrame,
      jsonCol: String,
      fields: Seq[(String, DataType)],
      prefix: String = ""
  ): DataFrame = {
    require(fields.nonEmpty, "extract needs at least one field")
    // fail at the call site, not with a downstream AMBIGUOUS_REFERENCE
    val clash = fields.map(prefix + _._1).filter(df.columns.contains)
    require(clash.isEmpty,
      s"extract output would shadow existing column(s): ${clash.mkString(", ")} — change `prefix`")
    val dupOut = fields.map(prefix + _._1).diff(fields.map(prefix + _._1).distinct)
    require(dupOut.isEmpty, s"duplicate output column(s): ${dupOut.distinct.mkString(", ")}")
    val schema = StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })
    val parsed: Column = from_json(col(jsonCol), schema)
    df.select(
      df.columns.map(col).toSeq ++
        fields.map { case (n, _) => parsed.getField(n).as(prefix + n) }: _*)
  }
}
