package graft

/** Locks the sf1 invariant harness itself: every check runs green
  * in-process against sf0.001 (the same artifacts the oracle gate
  * hash-checks at sf0.01), so a FAIL at sf1 means the DATA broke an
  * invariant, not that a check is miswired. */
class ScaleInvariantsSpec extends SparkSpecBase {

  test("every scale invariant holds at sf0.001") {
    val results = scala.collection.mutable.LinkedHashMap[String, (Boolean, String)]()
    val collect = new ScaleInvariants.Check {
      def apply(name: String)(f: => (Boolean, String)): Unit = {
        results(name) =
          try f
          catch { case e: Throwable => (false, e.toString.take(200)) }
        spark.catalog.clearCache()
      }
    }
    ScaleInvariants.runChecks(spark, "/root/testdata/sf0.001", collect)
    assert(results.size >= 12, s"expected >=12 checks, got ${results.keys}")
    val failed = results.collect { case (n, (ok, d)) if !ok => s"$n: $d" }
    assert(failed.isEmpty, failed.mkString("; "))
  }
}
