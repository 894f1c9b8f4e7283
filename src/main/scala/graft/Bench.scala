package graft

import org.apache.spark.sql.SparkSession

import graft.core.EngineCfg
import graft.dig.Dig
import graft.extract.Extract
import graft.ingest.CorpusGen

/** Benchmark main. Headline metric (BASELINE.json): MVT tile generation
  * throughput, zooms 0-14, over the skewed `bench` corpus (80% of features
  * inside one z8 tile — exercises the low-zoom/hot-tile path). Corpus
  * generation is distributed (spark.range → flatMap), so the measured
  * wall-clock is the engine, not a driver-side generator.
  *
  * Scaling evidence (north rule, N vs 4N): run this main at
  * SPARK_GRAFT_CPUS=8 and =32 on the same input; efficiency =
  * (tiles/sec@32) / (4 × tiles/sec@8). Recorded per round in BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 4 task waves per core; cap AQE's coalesce target below the 64m
      // default — tile assembly is CPU-per-byte heavy and the default
      // coalesces it to a handful of tasks
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = EngineCfg.default
    val p = CorpusGen.bench
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      results(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // ---- engine: corpus → entities → features → pyramid ----
    val docs = timed("gen_corpus") {
      val d = spark.range(0, CorpusGen.unitCount(p).toLong)
        .flatMap(u => CorpusGen.docsOfUnit(p, u.toInt))
        .toDF().cache()
      d.count()
      d
    }
    val entities = timed("extract") {
      val e = Extract.entities(docs).cache()
      e.count()
      e
    }
    val features = timed("dig") {
      val f = Dig.features(spark, entities, cfg).cache()
      f.count()
      f
    }
    val nFeatures = features.count()
    docs.unpersist(); entities.unpersist()
    // warm reps: first run pays JIT/codegen compilation; headline = best
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    var nTiles = 0L
    val runs = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      nTiles = graft.tile.Pyramid
        .tiles(spark, features, cfg, "tile", "mvt", 0, 14).count()
      val sec = (System.nanoTime() - t0) / 1e9
      results(s"pyramid_mvt_rep$i") = sec
      sec
    }
    results("pyramid_mvt_z0_14") = runs.min
    val tilesPerSec = nTiles / runs.min
    timed("pyramid_wyrm_z0_12") {
      graft.tile.Pyramid
        .tiles(spark, features, cfg, "tile", "wyrm", 0, 12).count()
    }

    // ---- representative table ops at the given SF ----
    val tableOps = Seq("q1_agg", "q3_join_topk", "dedup_minhash",
      "dedup_minhash_pairs", "dedup_simhash", "ann_cosine_topk",
      "ann_lsh_topk", "knn_join", "j4_cover_explode", "text_quality")
    tableOps.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try timed(name) { fn(spark, sfDir).count() }
        catch { case _: Throwable => results(name) = -1.0 }
      }
    }

    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"mvt_tiles_per_sec_z0_14","value":$tilesPerSec,""" +
        s""""unit":"tiles/sec","tiles":$nTiles,"features":$nFeatures,""" +
        s""""cpus":$cpus,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
