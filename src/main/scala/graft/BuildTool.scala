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
    // the per-family clear/invalidate/build table lives in [[Families]]
    // (shared with Bench's settle re-runs) — one registry, no drift
    val fams =
      if (fams0.isEmpty || fams0.contains("all")) Families.all
      else fams0.toSeq.map(f => Families.byName(f).getOrElse(sys.error(
        s"unknown family '$f' (know: ${Families.all.map(_.name).mkString(", ")})")))
    val spark = Sessions.local()
    for (fam <- fams) {
      if (cold) fam.cold(dir)
      val t0 = System.nanoTime()
      fam.build(spark, dir)
      println(f"${fam.name}%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
