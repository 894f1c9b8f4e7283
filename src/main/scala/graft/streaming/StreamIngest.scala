package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.extract.Extract
import graft.model.Doc

/** Structured Streaming ingest of the interleaved doc table — the
  * continuous-arrival analog of the batch extract (SURVEY.md §2.1 S2;
  * north rule: new document snapshots land continuously at corpus scale).
  *
  * Shape: `readStream` (file source, input_hint schema) → the SAME pure
  * Column-algebra decode as batch (`Extract.entities` — stateless per
  * row, so it is streaming-safe with no watermark/state) → parquet file
  * sink + checkpoint. The file sink's transaction log gives exactly-once:
  * a restarted query resumes from the checkpoint, processes only files it
  * has not committed, and readers that go through the log never observe a
  * partially-committed batch.
  *
  * The dig deliberately stays a BATCH job over the staged entity
  * snapshot: the reference's semantics are whole-snapshot (a relation's
  * dependency closure can reach arbitrarily old entities), so a per-batch
  * dig would be semantically wrong, not merely different.
  */
object StreamIngest {

  /** input_hint schema: (doc_id string, spans array<struct<kind, text,
    * media_ref, offset>>). */
  val docSchema = Encoders.product[Doc].schema

  /** Start the ingest query. `Trigger.AvailableNow` drains everything
    * currently in `inDir` and stops — the incremental-snapshot pattern;
    * pass a processing-time trigger for a long-running ingest. */
  def ingest(spark: SparkSession, inDir: String, stagingDir: String,
             checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Extract.entities(
        spark.readStream.schema(docSchema).parquet(inDir))
      .writeStream
      .format("parquet")
      .option("path", stagingDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The entity snapshot staged so far. */
  def staged(spark: SparkSession, stagingDir: String): DataFrame =
    spark.read.parquet(stagingDir)
}
