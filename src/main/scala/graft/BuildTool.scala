package graft

/** Operational CLI for the warehouse build steps (the CREATE INDEX
  * surface): (re)build named artifact families for a dataset and print
  * wall times. Families: sig, textdup, freq, funnel, neardup, ivf,
  * cube, gcache, gtiff — or `all`. Pass `-cold` to invalidate the
  * family's warehouse artifacts first (a real rebuild, the Bench
  * posture); default reuses warm artifacts like a production session.
  *
  * Usage: `java ... graft.BuildTool <datasetDir> [-cold] <family...>`
  * Combine with `-Dgraft.buildProfile` for per-stage times.
  */
object BuildTool {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: BuildTool <dir> [-cold] <family...>"))
    val rest = args.drop(1)
    val cold = rest.contains("-cold")
    val fams0 = rest.filterNot(_ == "-cold")
    val all = Seq("sig", "textdup", "freq", "funnel", "neardup", "ivf",
      "cube", "gcache", "gtiff")
    val fams = if (fams0.isEmpty || fams0.contains("all")) all else fams0.toSeq
    val spark = Sessions.local()
    val steps: Map[String, () => Unit] = Map(
      "sig" -> (() => { if (cold) { ops.TextOps.clearSigCache(); ops.Warehouse.invalidate("sig", dir) }
        ops.TextOps.buildSigIndex(spark, dir) }),
      "textdup" -> (() => { if (cold) { ops.TextOps.clearTextDupCache(); ops.Warehouse.invalidate("textdup", dir) }
        ops.TextOps.buildTextDup(spark, dir) }),
      "freq" -> (() => { if (cold) { ops.TextOps.clearFreqCache(); ops.Warehouse.invalidate("freq", dir) }
        ops.TextOps.buildFreq(spark, dir) }),
      "funnel" -> (() => { if (cold) { ops.TextOps.clearFunnelCache(); ops.Warehouse.invalidate("funnel", dir) }
        ops.TextOps.buildFunnel(spark, dir) }),
      "neardup" -> (() => { if (cold) { ops.SimOps.clearNearDupCache(); ops.Warehouse.invalidate("neardup", dir) }
        ops.SimOps.buildNearDup(spark, dir) }),
      "ivf" -> (() => { if (cold) { ops.SimOps.clearIvfCaches()
          ops.Warehouse.invalidate("ivf", dir); ops.Warehouse.invalidate("kmeans", dir) }
        ops.SimOps.buildIvf(spark, dir) }),
      "cube" -> (() => { if (cold) { ops.Pipeline.clearCubeCache(); ops.Warehouse.invalidate("cube", dir) }
        ops.Pipeline.buildCube(spark, dir) }),
      "gcache" -> (() => { if (cold) { ops.Pipeline.clearGranuleCacheCache(); ops.Warehouse.invalidate("gcache", dir) }
        ops.Pipeline.buildGranuleCache(spark, dir) }),
      "gtiff" -> (() => { if (cold) { ops.Export.clearGtiffCache(); ops.Warehouse.invalidate("gtiff", dir) }
        ops.Export.buildGeoTiffFrames(spark, dir) }))
    for (f <- fams) {
      val step = steps.getOrElse(f, sys.error(s"unknown family '$f' (know: ${all.mkString(", ")})"))
      val t0 = System.nanoTime()
      step()
      println(f"$f%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
