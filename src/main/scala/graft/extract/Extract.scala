package graft.extract

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Doc, OsmEntity}

/** docs → entities (SURVEY.md §2.1 S2 first half).
  *
  * The whole decode is Column algebra (higher-order array functions), so it
  * stays inside whole-stage codegen and Parquet column pruning applies —
  * no UDFs, no RDDs. The typed `SpanCodec` is the single-row oracle for the
  * same transformation (round-trip tests assert agreement).
  */
object Extract {

  /** Spans of a given kind. */
  private def ofKind(spans: Column, kind: String): Column =
    filter(spans, s => s("kind") === kind)

  /** Decode the interleaved doc table to the entity view.
    * Input schema: (doc_id string, spans array<struct<kind,text,media_ref,
    * offset>>). */
  def entities(docs: DataFrame): DataFrame = {
    val meta = element_at(ofKind(col("spans"), "meta"), 1)("text")
    val metaParts = split(meta, " ")
    val coord = element_at(ofKind(col("spans"), "coord"), 1)("text")
    val coordParts = split(coord, " ")
    docs
      .where(meta.isNotNull)
      .select(
        element_at(metaParts, 1).as("entity_kind"),
        element_at(metaParts, 2).cast("long").as("id"),
        map_from_entries(transform(ofKind(col("spans"), "tag"), s =>
          struct(
            substring_index(s("text"), "=", 1).as("key"),
            s("text").substr(instr(s("text"), "=") + 1,
              length(s("text"))).as("value")))).as("tags"),
        element_at(coordParts, 1).cast("double").as("lat"),
        element_at(coordParts, 2).cast("double").as("lon"),
        transform(ofKind(col("spans"), "ref"),
          s => s("text").cast("long")).as("node_refs"),
        transform(ofKind(col("spans"), "member"), s => {
          val p = split(s("text"), " ")
          struct(
            element_at(p, 1).as("role"),
            element_at(p, 2).as("ref_kind"),
            element_at(p, 3).cast("long").as("ref_id"))
        }).as("members"))
  }

  /** Typed view. */
  def entitiesDS(spark: SparkSession, docs: Dataset[Doc])
      : Dataset[OsmEntity] = {
    import spark.implicits._
    entities(docs.toDF()).as[OsmEntity]
  }
}
