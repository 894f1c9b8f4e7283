package graft
import org.apache.spark.sql.SparkSession
/** Spot-timer for individual `SparkEntry.queries` ops at any SF —
  * `Test/runMain graft.OpSpot <sfDir> <op> [<op>...]` — used to rehearse
  * driver-scale (sf0.1) timings of new ops without a full Bench run. */
object OpSpot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[spot] $n rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
