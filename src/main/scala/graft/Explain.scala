package graft
// dev tool: dump formatted physical plans for representative queries
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    // a leading absolute-path arg selects the dataset (plan audits at
    // sf1+ need real sizes — AQE join picks differ from sf0.01's)
    val (d, rest) = args.headOption match {
      case Some(p) if p.startsWith("/") => (p, args.drop(1).toSeq)
      case _ => ("/root/testdata/sf0.01", args.toSeq)
    }
    val names = if (rest.nonEmpty) rest else Seq(
      "r01_pricing_summary", "r02_revenue_by_nation", "p01_pixel_indices",
      "m01_spatial_merge", "v01_sim_topk", "v04_sim_topk_native",
      "v06_embed_neardup", "v13_residual_error", "t06_dedup_minhash",
      "t20_freq_bucket", "s05_corr_covar", "e06_rolling_stats",
      "e08_gapfill_interp", "g04_resample_utm")
    // `exec` among the names switches to EXECUTED plans (run the query,
    // then dump what AQE actually chose — broadcast swaps, skew splits,
    // coalesced partitions are runtime decisions invisible statically)
    val exec = rest.contains("exec")
    names.filterNot(_ == "exec").foreach { n =>
      println(s"\n########## $n ##########")
      val df = SparkEntry.queries(n)(spark, d)
      if (exec) {
        val t0 = System.nanoTime()
        df.collect()
        println(f"-- executed in ${(System.nanoTime() - t0) / 1e9}%.2f s")
        println(df.queryExecution.executedPlan.toString)
      } else
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
