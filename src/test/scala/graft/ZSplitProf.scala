package graft
import org.apache.spark.sql.SparkSession
import graft.core.EngineCfg
object ZSplitProf {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt*4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val f = spark.read.parquet("/tmp/graft_scaling_features")
      .as[graft.model.Feature].cache()
    f.count()
    def t(n: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = body
      println(f"[zsplit] $n: ${(System.nanoTime()-t0)/1e9}%.2f s ($c tiles)")
    }
    val cfg = EngineCfg.default
    // warm
    graft.tile.Pyramid.tiles(spark, f, cfg, "tile", "mvt", 12, 12).count()
    for (rep <- 1 to 2) {
      t(s"z0_4_rep$rep") { graft.tile.Pyramid.tiles(spark, f, cfg, "tile", "mvt", 0, 4).count() }
      t(s"z5_12_rep$rep") { graft.tile.Pyramid.tiles(spark, f, cfg, "tile", "mvt", 5, 12).count() }
      t(s"z13_16_rep$rep") { graft.tile.Pyramid.tiles(spark, f, cfg, "tile", "mvt", 13, 16).count() }
    }
    spark.stop()
  }
}
