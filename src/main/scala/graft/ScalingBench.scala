package graft

import org.apache.spark.sql.SparkSession

import graft.core.EngineCfg
import graft.dig.Dig
import graft.extract.Extract
import graft.ingest.CorpusGen

/** Scaling-efficiency evidence (north rule: N vs 4N executors; sandbox
  * stand-in: local[8] vs local[32], see BASELINE.md).
  *
  * This VM throttles sustained all-core usage (burst credits), so separate
  * invocations are not comparable. Here the two parallelism levels are
  * INTERLEAVED within one JVM (fresh SparkSession per sample, alternating
  * 32/8), and each level reports its min-of-samples warm time — the
  * closest available estimate of unthrottled throughput at each level.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALING_ROUNDS", "3").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_SCALING_LEVELS", "32,8")
      .split(',').map(_.trim.toInt).toSeq
    val cfg = EngineCfg.default
    // 4× the bench corpus and zooms 0-16: enough work per core that the
    // measurement is compute-bound, not task-overhead-bound
    val p = CorpusGen.bench.copy(nx = 240, ny = 200,
      countyCols = 24, countyRows = 20)
    val samples = scala.collection.mutable.Map[Int,
      scala.collection.mutable.ArrayBuffer[Double]]()

    var nTiles = 0L
    for (_ <- 1 to rounds; cpus <- levels) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        // 4 waves of tasks per core; the tile-assembly stage is
        // CPU-per-byte heavy, so cap AQE's coalesce target well below the
        // 64m default or it strangles parallelism at 32 threads
        .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val docs = spark.range(0, CorpusGen.unitCount(p).toLong)
        .flatMap(u => CorpusGen.docsOfUnit(p, u.toInt)).toDF()
      val entities = Extract.entities(docs)
      val features = Dig.features(spark, entities, cfg).cache()
      features.count()
      val zMax = 16
      // one warmup + two timed reps per sample
      graft.tile.Pyramid.tiles(spark, features, cfg, "tile", "mvt", 12,
        12).count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        nTiles = graft.tile.Pyramid
          .tiles(spark, features, cfg, "tile", "mvt", 0, zMax).count()
        (System.nanoTime() - t0) / 1e9
      }
      samples.getOrElseUpdate(cpus,
        scala.collection.mutable.ArrayBuffer.empty) ++= times
      println(s"[scaling] cpus=$cpus times=" +
        times.map(t => f"$t%.2f").mkString(","))
      spark.stop()
    }
    levels.foreach { c =>
      println(f"""{"level":$c,"sec_min":${samples(c).min}%.3f,""" +
        f""""tiles_per_sec":${nTiles / samples(c).min}%.1f}""")
    }
    if (samples.contains(32) && samples.contains(8)) {
      val t32 = samples(32).min
      val t8 = samples(8).min
      val eff = (nTiles / t32) / (4.0 * (nTiles / t8))
      println(
        f"""{"metric":"scaling_efficiency_8_to_32","value":$eff%.3f,""" +
          f""""tiles":$nTiles,"tiles_per_sec_8":${nTiles / t8}%.1f,""" +
          f""""tiles_per_sec_32":${nTiles / t32}%.1f,"sec_8":$t8%.3f,""" +
          f""""sec_32":$t32%.3f}""")
    }
  }
}
