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
