package graft

import org.apache.spark.sql.SparkSession

import graft.core.EngineCfg
import graft.dig.Dig
import graft.extract.Extract
import graft.ingest.CorpusGen

/** Dig-only profiling main (test scope): bench corpus → features count,
  * run under JFR to see where dig time goes. */
object DigProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val p = CorpusGen.bench
    val docs = spark.range(0, CorpusGen.unitCount(p).toLong)
      .flatMap(u => CorpusGen.docsOfUnit(p, u.toInt)).toDF().cache()
    docs.count()
    val entities = Extract.entities(docs).cache()
    entities.count()
    // warm rep then measured reps
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = Dig.features(spark, entities, EngineCfg.default).count()
      println(f"[digprof] rep$i features=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
