package graft
import org.scalatest.funsuite.AnyFunSuite
/** Driver t1 smoke-gate rehearsal: entry() must return rows > 0. */
class EntrySpec extends AnyFunSuite {
  test("entry() produces tiles (driver smoke contract)") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ==
      Seq("group", "z", "x", "y", "n_bytes"))
  }
}
