package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-op timing: `Test/runMain graft.OpsProf <op> [<op>…]`
  * runs each named SparkEntry query twice (cold + warm) at local[8] on
  * sf0.01 and prints wall seconds — for isolating a slow table op from
  * the full Bench pipeline. */
object OpsProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sf).count()
        println(f"[opsprof] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
