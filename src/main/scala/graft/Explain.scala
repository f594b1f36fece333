package graft
// dev tool: dump formatted physical plans for representative queries
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "r01_pricing_summary", "r02_revenue_by_nation", "p01_pixel_indices",
      "m01_spatial_merge", "v01_sim_topk", "v04_sim_topk_native",
      "v06_embed_neardup", "v13_residual_error", "t06_dedup_minhash",
      "t20_freq_bucket", "s05_corr_covar", "e06_rolling_stats",
      "e08_gapfill_interp", "g04_resample_utm")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
