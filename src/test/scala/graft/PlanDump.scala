package graft
import org.apache.spark.sql.SparkSession
import graft.core.EngineCfg
import graft.ingest.CorpusGen
import graft.extract.Extract
import graft.dig.Dig
/** Dumps formatted physical plans of the headline queries to
  * target/plans.txt for plan review (pushdown, codegen spans, join
  * strategies, shuffle count). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sb = new StringBuilder
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      sb.append(s"\n===== $name =====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    val sf = "/root/testdata/sf0.001"
    // docs written to parquet so the scan shows pushdown/pruning
    val docs = spark.createDataset(CorpusGen.microDocs()).toDF()
    docs.write.mode("overwrite").parquet("/tmp/plan_docs")
    val docsP = spark.read.parquet("/tmp/plan_docs")
    dump("extract_entities", Extract.entities(docsP))
    val feats = Dig.features(spark, Extract.entities(docsP), EngineCfg.default)
    dump("dig_features", feats.toDF())
    dump("pyramid_mvt", graft.tile.Pyramid.tiles(spark, feats,
      EngineCfg.default, "tile", "mvt", 0, 14).toDF())
    dump("q1_agg", SparkEntry.queries("q1_agg")(spark, sf))
    dump("f2_tile_cell", SparkEntry.queries("f2_tile_cell")(spark, sf))
    dump("dedup_minhash_pairs", SparkEntry.queries("dedup_minhash_pairs")(spark, sf))
    dump("ann_cosine_topk", SparkEntry.queries("ann_cosine_topk")(spark, sf))
    dump("pack_sequences", SparkEntry.queries("pack_sequences")(spark, sf))
    dump("tfidf_topk", SparkEntry.queries("tfidf_topk")(spark, sf))
    dump("vocab_topk", SparkEntry.queries("vocab_topk")(spark, sf))
    dump("bigram_topk", SparkEntry.queries("bigram_topk")(spark, sf))
    dump("source_cap", SparkEntry.queries("source_cap")(spark, sf))
    dump("corpus_shuffle", SparkEntry.queries("corpus_shuffle")(spark, sf))
    dump("embed_quantize", SparkEntry.queries("embed_quantize")(spark, sf))
    dump("pipeline_funnel", SparkEntry.queries("pipeline_funnel")(spark, sf))
    dump("dup_ngram_frac", SparkEntry.queries("dup_ngram_frac")(spark, sf))
    dump("corpus_stats", SparkEntry.queries("corpus_stats")(spark, sf))
    dump("knn_classify", SparkEntry.queries("knn_classify")(spark, sf))
    dump("dsir_importance",
      SparkEntry.queries("dsir_importance")(spark, sf))
    dump("sem_dedup", SparkEntry.queries("sem_dedup")(spark, sf))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/plans.txt"), sb.toString)
    println("[plandump] written target/plans.txt")
    spark.stop()
  }
}
