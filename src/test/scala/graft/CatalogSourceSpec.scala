package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.CatalogSource

/** DSv2 catalog source: predicate pushdown reaches the reader, residual
  * filters stay with Spark, columns prune at the source, and the band-
  * link filter composes downstream (SURVEY.md §2.1, §4 #1). */
class CatalogSourceSpec extends SparkSpecBase {

  private lazy val fixture: String = {
    val f = Files.createTempFile("catalog", ".txt")
    val lines = Seq(
      "HLS.S30.T01.2024100T100000.v2.0|T01|2024-04-09T10:00:00Z|5|day|https://x/a.B02.tif,https://x/a.B04.tif,https://x/a.B08.tif,https://x/a.Fmask.tif",
      "HLS.S30.T01.2024108T100000.v2.0|T01|2024-04-17T10:00:00Z|45|day|https://x/b.B02.tif,https://x/b.B04.tif",
      "HLS.S30.T02.2024100T103000.v2.0|T02|2024-04-09T10:30:00Z|12|day|https://x/c.B02.tif,https://x/c.B04.tif,https://x/c.B08.tif,https://x/c.Fmask.tif",
      "HLS.S30.T02.2024120T103000.v2.0|T02|2024-04-29T10:30:00Z|8|night|https://x/d.B02.tif,https://x/d.B04.tif,https://x/d.B08.tif,https://x/d.Fmask.tif")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toFile.getAbsolutePath
  }

  private def catalog = spark.read.format("graft-catalog")
    .option("path", fixture).load()

  test("searcher-shaped query pushes cloud-cover, day-night and temporal filters") {
    val got = catalog
      .filter(col("cloud_cover") <= 20 && col("day_night") === "day" &&
        col("begin_time") >= "2024-04-01" && col("begin_time") < "2024-05-01")
      .select("granule_ur").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq(
      "HLS.S30.T01.2024100T100000.v2.0", "HLS.S30.T02.2024100T103000.v2.0"))
    assert(CatalogSource.lastPushed.exists(_.contains("cloud_cover")))
    assert(CatalogSource.lastPushed.exists(_.contains("day_night")))
    assert(CatalogSource.lastPushed.exists(_.contains("begin_time")))
    assert(CatalogSource.lastResidual.isEmpty)
  }

  test("unsupported predicate stays residual and Spark still applies it") {
    val got = catalog
      .filter(col("cloud_cover") <= 50 &&
        array_contains(col("urls"), "https://x/b.B02.tif"))
      .select("granule_ur").collect().map(_.getString(0))
    assert(got.toSeq == Seq("HLS.S30.T01.2024108T100000.v2.0"))
    assert(CatalogSource.lastPushed.exists(_.contains("cloud_cover")))
    // array_contains cannot travel to the catalog API
    assert(CatalogSource.lastPushed.forall(!_.contains("urls")))
  }

  test("column pruning reaches the source") {
    catalog.select("tile_id", "cloud_cover").distinct().collect()
    assert(CatalogSource.lastColumns.toSet == Set("tile_id", "cloud_cover"))
  }

  test("explain shows the pushed filters in the scan description") {
    val df = catalog.filter(col("cloud_cover") <= 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-catalog"))
  }

  test("transient read failures retry with backoff and then succeed") {
    CatalogSource.injectFailures.set(2) // fail twice, succeed on attempt 3
    val got = spark.read.format("graft-catalog")
      .option("path", fixture)
      .option("maxRetries", "3").option("retryBaseMs", "1")
      .load().count()
    assert(got == 4, "retried read must still see every granule")
    assert(CatalogSource.lastAttempts == 3,
      s"expected 3rd attempt to win, got ${CatalogSource.lastAttempts}")
    assert(CatalogSource.injectFailures.get() == 0)
  }

  test("a failure outlasting the retry budget surfaces to Spark") {
    CatalogSource.injectFailures.set(10)
    try {
      val e = intercept[Exception] {
        spark.read.format("graft-catalog")
          .option("path", fixture)
          .option("maxRetries", "2").option("retryBaseMs", "1")
          .load().count()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      assert(causes(e).exists(_.getMessage != null)
        && causes(e).exists(c => String.valueOf(c.getMessage)
          .contains("injected transient catalog failure")),
        s"unexpected failure chain: $e")
    } finally CatalogSource.injectFailures.set(0)
  }

  test("withRetry backs off exponentially and stops at the budget") {
    val sleeps = collection.mutable.Buffer[Long]()
    var calls = 0
    val out = sources.Resilience.withRetry(4, 5L, sleeps.append(_)) { attempt =>
      calls += 1
      if (attempt < 2) throw new RuntimeException("flaky")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(sleeps.toSeq == Seq(5L, 10L), s"wrong backoff schedule: $sleeps")
    // exhausted budget rethrows the last failure
    sleeps.clear()
    val e = intercept[RuntimeException] {
      sources.Resilience.withRetry(3, 5L, sleeps.append(_)) { _ =>
        throw new RuntimeException("always down")
      }
    }
    assert(e.getMessage == "always down")
    assert(sleeps.toSeq == Seq(5L, 10L))
  }

  test("token cache refreshes only inside the expiry margin (authenticator.py:27-35)") {
    var clock = 0L
    var mints = 0
    val cache = new sources.Resilience.TokenCache(
      mint = () => { mints += 1; s"t$mints" },
      expiryMs = 1000L, marginMs = 100L, now = () => clock)
    assert(cache.bearer == "Bearer t1") // first use mints
    clock = 800L
    assert(cache.bearer == "Bearer t1" && mints == 1) // before margin: cached
    clock = 900L // exactly expiry - margin: refresh
    assert(cache.bearer == "Bearer t2" && mints == 2)
    clock = 1000L
    assert(cache.bearer == "Bearer t2" && mints == 2) // fresh again
  }

  test("band-link completeness check composes downstream (processor.py:111-116)") {
    // keep granules whose asset list contains all four needed bands
    val complete = catalog
      .withColumn("url", explode(col("urls")))
      .withColumn("band", regexp_extract(col("url"), "\\.(B02|B04|B08|Fmask)\\.tif$", 1))
      .filter(col("band") =!= "")
      .groupBy("granule_ur")
      .agg(countDistinct("band").as("n_bands"))
      .filter(col("n_bands") === 4)
    assert(complete.count() == 3)
  }
}
