package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured column operators: typed extraction from JSON
  * payloads (event properties, API captures, crawler metadata) so the
  * rest of a pipeline works on real columns — filterable, joinable,
  * aggregable, and visible to Catalyst stats — instead of re-parsing
  * strings at every use site.
  */
object SemiStructured {

  /** Extract the fields of `schema` from a JSON string column as
    * typed top-level columns. The payload is parsed ONCE per row
    * (`from_json` with the full schema, map-only inside whole-stage
    * codegen) however many fields are extracted — the N-field dual of
    * N separate `get_json_object` calls, which would each re-parse
    * the string. Malformed JSON and missing fields yield NULL columns
    * (PERMISSIVE mode), matching SQL `json_extract` semantics.
    *
    * Field names must not collide with existing columns — extraction
    * ADDS columns; renaming is the caller's `select`.
    */
  def jsonExtract(df: DataFrame, jsonCol: String,
      schema: StructType): DataFrame = {
    val clash = schema.fieldNames.toSet & df.columns.toSet
    require(clash.isEmpty,
      s"jsonExtract field(s) ${clash.mkString(", ")} collide with existing columns")
    df.select((df.columns.map(col) :+
        from_json(col(jsonCol), schema).as("__j")).toIndexedSeq: _*)
      .select((df.columns.map(col) ++
        schema.fieldNames.map(n => col(s"__j.$n"))).toIndexedSeq: _*)
  }
}
