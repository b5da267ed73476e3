package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trigger-layer semantics of the reference, as column expressions.
  *
  * Trigger 1 (README.md:187-201): on update, stamp `modified_by :=
  * current_user`, `modified_at := current_timestamp`.
  * Trigger 2 (README.md:206-263): for each column where `new.x IS
  * DISTINCT FROM old.x` (README.md:226), record `{col: {old, new}}`
  * into a JSONB `change_info` (example output README.md:257-263).
  *
  * Spark's `<=>` is exactly SQL `IS NOT DISTINCT FROM`, so the per-column
  * predicate is `NOT (old <=> new)`; the JSONB document becomes
  * `to_json(map_filter(...))` — pure built-ins, codegen-friendly, no UDF.
  */
object ChangeDiff {

  /** Map {colName -> {old, new}} keeping only columns that changed.
    * Values are stringified (the JSONB document in the reference holds
    * the textual representation; lossy serialize is O7's contract too).
    */
  def changeDiff(before: Column, after: Column, fields: Seq[String]): Column = {
    val entries = fields.flatMap { f =>
      Seq(lit(f), struct(
        before.getField(f).cast("string").as("old"),
        after.getField(f).cast("string").as("new")))
    }
    map_filter(map(entries: _*), (_, v) =>
      !(v.getField("old") <=> v.getField("new")))
  }

  /** The JSONB `change_info` payload: the diff serialized, or "{}" when
    * nothing changed, mirroring README.md:257-263.
    *
    * Backed by the native [[graft.functions.ChangeDiffJson]] expression
    * (single codegen'd pass) rather than `to_json(map_filter(...))` —
    * both of those built-ins are CodegenFallback, which drags on wide
    * schemas like the 15-column transaction row. Same output byte for
    * byte (pinned by the cdc_change_diff oracle, which predates the
    * native kernel).
    */
  def changeInfoJson(before: Column, after: Column, fields: Seq[String]): Column = {
    def asStringStruct(c: Column) =
      struct(fields.map(f => c.getField(f).cast("string").as(f)): _*)
    graft.functions.ChangeDiffJson.changeDiffJson(
      asStringStruct(before), asStringStruct(after))
  }

  /** Trigger-1 audit enrichment on the update path (README.md:190-191).
    * `user` defaults to the Spark user — the engine's `current_user`.
    */
  def withAudit(df: DataFrame, user: String): DataFrame =
    df.withColumn("modified_by", lit(user))
      .withColumn("modified_at", current_timestamp())
}
