package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd+ args: run only the named queries (dev iteration);
    // oracle_sql.json is always written in full.
    val only = args.drop(2).toSet
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not leave a PREVIOUS run's parquet behind
        // to masquerade as this run's result (a stale-but-matching dump
        // once hid a Spark-side parse error through two compare passes):
        // delete the output dir so the oracle check reports the query
        // as missing instead of silently green
        // ...and the cleanup itself must not abort the rest of the run: a
        // held-open file or concurrent _temporary sweep can make a delete
        // throw, which would otherwise propagate out of this catch and
        // lose every remaining query's dump. Log and continue.
        try {
          val dest = Paths.get(outDir, name)
          if (Files.exists(dest)) {
            import scala.jdk.CollectionConverters._
            val walk = Files.walk(dest)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.delete)
            finally walk.close()
          }
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name stale-output cleanup failed " +
            s"(output may be stale): ${e2.getMessage}")
        }
      }
      finally spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
