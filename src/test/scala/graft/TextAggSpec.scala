package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashAgg
import graft.ops.TextOps

/** The one-pass MinHash Aggregator produces bit-identical signatures to
  * the 8-aggregate SQL form (same md5 windows, same minima) — across
  * partitionings, which exercises merge(). */
class TextAggSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("Aggregator signatures equal the SQL-form signatures on testdata") {
    val doc = Tables.documents(spark, sf)
    val sqlForm = TextOps.signatures(doc)
      .select(col("doc_id"), array((0 until MinHashAgg.K).map(i => col(s"s$i")): _*).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val aggForm = TextOps.shingles(doc)
      .repartition(7) // force non-trivial partial/merge path
      .groupBy("doc_id")
      .agg(udaf(MinHashAgg).apply(col("s")).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(aggForm.keySet == sqlForm.keySet)
    aggForm.foreach { case (id, sig) =>
      assert(sig == sqlForm(id), s"doc $id signature mismatch")
    }
  }

  test("Aggregator handles empty input and null shingles") {
    val sigs = Seq((1L, Option.empty[String]), (1L, Some("a b c")))
      .toDF("doc_id", "s")
      .groupBy("doc_id")
      .agg(udaf(MinHashAgg).apply(col("s")).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sigs(1L).forall(_ != null)) // the non-null shingle fills all windows
    assert(sigs(1L).length == MinHashAgg.K)
  }
}
