package graft

// dev tool: time named declared queries on a dataset with Bench's exact
// methodology (fn(...).count() then clearCache), N reps, report each and
// the min. Usage: runMain graft.QTime [/abs/sf/dir] [reps=N] q1 q2 ...
object QTime {
  def main(args: Array[String]): Unit = {
    val (d, rest) = args.headOption match {
      case Some(p) if p.startsWith("/") => (p, args.drop(1).toSeq)
      case _ => ("/root/testdata/sf0.1", args.toSeq)
    }
    val reps = rest.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(3)
    val names = rest.filterNot(_.startsWith("reps="))
    val spark = Sessions.local()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"QTIME $n%-28s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
