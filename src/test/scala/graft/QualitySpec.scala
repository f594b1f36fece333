package graft

import org.apache.spark.sql.functions._
import graft.ops.{PixelOps, Pixels, Quality}

/** QC gate + scene stats semantics on the sf0.001 testdata and on
  * constructed edge cases (reference processor.py:270-292,
  * quality.py:19-47). */
class QualitySpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("granule gate only keeps granules passing BOTH thresholds") {
    val gated = Quality.granuleGateQ(spark, sf)
    val viol = gated.filter(
      col("contamination_pct") > Quality.MaxContaminationPct ||
        col("valid_pct") < Quality.MinValidPct).count()
    assert(viol == 0)
    assert(gated.count() > 0)
    // and it is a strict subset of the full QC relation
    assert(gated.count() < Quality.granuleQcQ(spark, sf).count())
  }

  test("valid_pct + masked fraction account for every pixel") {
    val qc = Quality.granuleQcQ(spark, sf)
      .select(col("total"), col("n_masked"), col("valid_pct"))
      .as[(Long, Long, Double)].collect()
    qc.foreach { case (total, masked, validPct) =>
      val expect = 100.0 * (total - masked) / total
      assert(math.abs(validPct - expect) < 1e-4,
        s"valid_pct $validPct != $expect for total=$total masked=$masked")
    }
  }

  test("scene stats: stddev_pop of a single-valued scene is 0, all-null scene is NULL") {
    val px = Seq(
      ("2024-01-01 00:00:00", Some(0.5)),
      ("2024-01-02 00:00:00", Some(0.3)), ("2024-01-02 00:00:00", Some(0.3)),
      ("2024-01-03 00:00:00", Option.empty[Double])
    ).toDF("time", "ndvi_c").withColumn("time", to_timestamp(col("time")))
    val got = px.groupBy("time")
      .agg(avg("ndvi_c").as("m"), stddev_pop(col("ndvi_c")).as("s"))
      .orderBy("time")
      .select("m", "s").as[(Option[Double], Option[Double])].collect().toSeq
    assert(got(0) == (Some(0.5), Some(0.0)))
    assert(got(1) == (Some(0.3), Some(0.0)))
    assert(got(2) == (None, None))
  }

  test("pixel relation is deterministic: same dir twice gives identical frames") {
    val a = Pixels.pixels(spark, sf).orderBy("px_id", "y", "x", "red").collect().toSeq
    val b = Pixels.pixels(spark, sf).orderBy("px_id", "y", "x", "red").collect().toSeq
    assert(a == b)
  }

  test("withIndices masks exactly the combinedMask rows") {
    val px = PixelOps.withIndices(Pixels.pixels(spark, sf))
    assert(px.filter(col("mask") && col("ndvi_m").isNotNull).count() == 0)
    assert(px.filter(!col("mask") && col("ndvi_m").isNull).count() == 0)
  }
}
