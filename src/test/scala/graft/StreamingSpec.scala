package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineCfg
import graft.dig.Dig
import graft.ingest.{CorpusGen, SpanCodec}
import graft.streaming.StreamIngest

/** Structured Streaming ingest: exactly-once staging across restarts,
  * and dig-over-staged == oracle (the streaming path feeds the same
  * engine). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming ingest is exactly-once across restarts; dig over staged == oracle") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stream")
    val inDir = s"$base/in"; val staging = s"$base/staged"
    val ckpt = s"$base/ckpt"
    val docs = CorpusGen.microDocs()
    val (first, second) = docs.splitAt(docs.length / 2)

    // chunk 1 arrives → drain
    spark.createDataset(first).toDF()
      .coalesce(1).write.mode("append").parquet(inDir)
    StreamIngest.ingest(spark, inDir, staging, ckpt).awaitTermination()
    val n1 = StreamIngest.staged(spark, staging).count()
    assert(n1 == first.length)

    // chunk 2 arrives → a RESTARTED query picks up only the new files
    spark.createDataset(second).toDF()
      .coalesce(1).write.mode("append").parquet(inDir)
    StreamIngest.ingest(spark, inDir, staging, ckpt).awaitTermination()
    val all = StreamIngest.staged(spark, staging)
    assert(all.count() == docs.length)

    // a restart with NO new data must not duplicate anything
    StreamIngest.ingest(spark, inDir, staging, ckpt).awaitTermination()
    assert(StreamIngest.staged(spark, staging).count() == docs.length)

    // staged entities are the batch extract, row for row
    val gotEnts = all.as[graft.model.OsmEntity].collect()
    val wantEnts = docs.flatMap(d => SpanCodec.decode(d.spans))
    def key(e: graft.model.OsmEntity) =
      s"${e.entity_kind}/${e.id}/${e.tags.toSeq.sorted}/${e.lat}/${e.lon}/" +
        s"${e.node_refs}/${e.members}"
    assert(gotEnts.map(key).sorted.toSeq == wantEnts.map(key).sorted)

    // and the batch dig over the staged snapshot matches the oracle
    val feats = Dig.features(spark, all, EngineCfg.default).collect()
    val want = Oracle.dig(EngineCfg.default, wantEnts)
    assert(feats.map(Norm.featKey).sorted.toSeq ==
      want.map(Norm.featKey).sorted)
  }
}
