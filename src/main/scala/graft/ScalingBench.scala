package graft

import org.apache.spark.sql.SparkSession

import graft.core.EngineCfg
import graft.dig.Dig
import graft.extract.Extract
import graft.ingest.CorpusGen

/** Scaling-efficiency evidence (north rule: N vs 4N executors; sandbox
  * stand-in: two local[k] levels on identical input, BASELINE.md).
  *
  * Phase 0 (not measured): generate the 4×-bench corpus, dig it, and
  * materialize the feature table to parquet once at full parallelism.
  * Then, per sample, a FRESH SparkSession at the sample's parallelism
  * reads that parquet and runs the identical pyramid job; levels are
  * interleaved (this VM throttles sustained full-core usage, so separate
  * invocations are not comparable) and each level reports min-of-warm-reps.
  *
  * Default levels 8,2: a pure-CPU calibration (BASELINE.md) shows this VM
  * delivers only ~19 effective cores, capping ANY 8→32 workload near 0.5
  * efficiency; 2→8 is the pair the hardware can meaningfully grade
  * (pure-CPU ceiling ≈ 0.85).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALING_ROUNDS", "2").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_SCALING_LEVELS", "8,2")
      .split(',').map(_.trim.toInt).toSeq
    val zMax = sys.env.getOrElse("SPARK_GRAFT_SCALING_ZMAX", "16").toInt
    val cfg = EngineCfg.default
    val p = CorpusGen.bench.copy(nx = 240, ny = 200,
      countyCols = 24, countyRows = 20)
    val featPath = "/tmp/graft_scaling_features"

    val aqe = sys.env.getOrElse("SPARK_GRAFT_SCALING_AQE", "true")
    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    // phase 0: materialize features once (full parallelism, unmeasured)
    if (!new java.io.File(featPath + "/_SUCCESS").exists()) {
      val s = session(32)
      import s.implicits._
      val docs = s.range(0, CorpusGen.unitCount(p).toLong)
        .flatMap(u => CorpusGen.docsOfUnit(p, u.toInt)).toDF()
      Dig.features(s, Extract.entities(docs), cfg)
        .write.mode("overwrite").parquet(featPath)
      s.stop()
      println(s"[scaling] features materialized at $featPath")
    }

    val samples = scala.collection.mutable.Map[Int,
      scala.collection.mutable.ArrayBuffer[Double]]()
    var nTiles = 0L
    for (_ <- 1 to rounds; cpus <- levels) {
      val spark = session(cpus)
      import spark.implicits._
      val features = spark.read.parquet(featPath)
        .as[graft.model.Feature].cache()
      features.count()
      // warmup (JIT/codegen) then timed reps
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
    val lo = levels.min; val hi = levels.max
    if (hi == lo * 4) {
      val eff = (nTiles / samples(hi).min) /
        (4.0 * (nTiles / samples(lo).min))
      println(
        f"""{"metric":"scaling_efficiency_${lo}_to_$hi",""" +
          f""""value":$eff%.3f,"tiles":$nTiles,""" +
          f""""tiles_per_sec_$lo":${nTiles / samples(lo).min}%.1f,""" +
          f""""tiles_per_sec_$hi":${nTiles / samples(hi).min}%.1f}""")
    }
  }
}
