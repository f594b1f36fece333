package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY.md §7.6 / ENGINE.md scale posture):
  * writing both fact tables bucketed on the join key lets the sort-merge
  * join run without a shuffle on either side — the pre-partitioning
  * strategy for repeated 100 TB fact-fact joins. */
class BucketingSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("join of tables bucketed on the key plans without an exchange") {
    val wh = Files.createTempDirectory("warehouse").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")

    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b")
      .mode("overwrite").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    // neither bucketed side shuffles before the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")

    // and results agree with the unbucketed join
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == expect)
  }
}
