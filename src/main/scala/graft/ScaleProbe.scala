package graft

/** Dev harness for the scale-posture experiment: time the index builds
  * and the heavy corpus-wide queries on an ARBITRARY dataset dir — in
  * particular a perturbed N× replica of sf0.1 (devtools/scalegen.py) —
  * so the "would this hold at 10× the data" claims in ENGINE.md rest on
  * measured ratios, not plan reading alone. Not part of the driver
  * contract (Bench is); only touches the documents/embeddings tables so
  * a replica dataset does not need the TPC-H-ish relations.
  *
  * Usage: `java ... graft.ScaleProbe <datasetDir>` → one JSON line of
  * seconds per step, builds forced cold (warehouse invalidated first).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    ops.Warehouse.invalidateDataset(dir)
    val builds = Seq(
      "sig_build" -> timed(ops.TextOps.buildSigIndex(spark, dir)),
      "textdup_build" -> timed(ops.TextOps.buildTextDup(spark, dir)),
      "neardup_build" -> timed(ops.SimOps.buildNearDup(spark, dir)),
      "funnel_build" -> timed(ops.TextOps.buildFunnel(spark, dir)),
      "ivf_build" -> timed(ops.SimOps.buildIvf(spark, dir)))
    def q(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t = timed { fn(spark, dir).count(); () }
      spark.catalog.clearCache()
      t
    }
    val queries = Seq(
      "t06_dedup_minhash" -> q(ops.TextOps.dedupMinhash),
      "t08_ngram_jaccard" -> q(ops.TextOps.ngramJaccard),
      "t11_dedup_components" -> q(ops.TextOps.dedupComponents),
      "t17_curation_funnel" -> q(ops.TextOps.curationFunnel),
      "t20_freq_bucket" -> q(ops.TextOps.freqBucket),
      "v01_sim_topk" -> q(ops.SimOps.simTopk),
      "v05_sim_ivf" -> q(ops.SimOps.simIvf),
      "v06_embed_neardup" -> q(ops.SimOps.embedNearDup),
      "v14_embed_keep" -> q(ops.SimOps.embedKeep))
    val line = (Seq("dir" -> 0.0) ++ builds ++ queries).collect {
      case (k, v) if k != "dir" => s""""$k":${math.rint(v * 1000) / 1000}"""
    }.mkString(s"""{"dir":"$dir",""", ",", "}")
    println(line)
    spark.stop()
  }
}
