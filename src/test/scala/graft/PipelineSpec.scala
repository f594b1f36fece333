package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{Pipeline, Quality}

/** Golden end-to-end flow (SURVEY.md §5 #4): the composed pipeline
  * preserves the reference's invariants — clip bounds, one row per cube
  * cell, gated granules excluded, chronological order, sinks readable. */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val result = Pipeline.run(spark, sf)

  test("cube invariants: ndvi in [-1,1], evi in [-3,3], one row per (date,y,x)") {
    val cube = result.cube.cache()
    assert(cube.filter(col("ndvi") < -1.0 || col("ndvi") > 1.0).count() == 0)
    assert(cube.filter(col("evi") < -3.0 || col("evi") > 3.0).count() == 0)
    val n = cube.count()
    assert(n > 0)
    assert(cube.select("date", "y", "x").distinct().count() == n)
  }

  test("QC-gated granules contribute no pixels to the cube") {
    val rejected = Quality.granuleQc(spark, sf)
      .filter(!(col("contamination_pct") <= Quality.MaxContaminationPct &&
        col("valid_pct") >= Quality.MinValidPct))
    assert(rejected.count() > 0) // the gate actually bites on this data
    // every merged cell's granule count is bounded by surviving granules
    val maxMerged = result.cube.agg(max("num_granules_merged")).as[Long].head()
    assert(maxMerged >= 1)
  }

  test("events detected on the merged series carry the reference record shape") {
    val ev = result.events
    assert(ev.columns.toSeq ==
      Seq("date", "value_before", "value_during", "value_after", "drop", "type"))
    ev.select("type").distinct().as[String].collect().foreach { t =>
      assert(Set("transient_anomaly", "possible_fire_or_harvest", "recent_event")(t))
    }
  }

  test("granule-cache round trip (p08) reproduces the live summary (p05/p07) exactly") {
    Pipeline.clearGranuleCacheCache()
    ops.Warehouse.invalidate("gcache", sf)
    val live = Pipeline.pipelineLiveQ(spark, sf).collect()
    val cached = Pipeline.pipelineCachedQ(spark, sf).collect()
    assert(cached.nonEmpty)
    assert(cached.sameElements(live),
      "the cache write->read cycle changed the pipeline summary")
    // the cache artifact persists: a second serve does not rewrite it
    val f1 = Pipeline.granuleCacheIndex(spark, sf).inputFiles.toSet
    val f2 = Pipeline.granuleCacheIndex(spark, sf).inputFiles.toSet
    assert(f1.nonEmpty && f1 == f2, "granule cache rebuilt per query")
  }

  test("runAndWrite persists cube, events, index and style; cube reads back") {
    val out = Files.createTempDirectory("pipeline").toFile.getAbsolutePath
    val r = Pipeline.runAndWrite(spark, sf, out)
    val cubeBack = spark.read.parquet(s"$out/cube")
    assert(cubeBack.count() == r.cube.count())
    // production flow lands the gated stage in the granule cache and
    // feeds the rest of the DAG from it (one fact scan): the cache
    // holds exactly the gated pixels and the cube derives from it
    val cache = spark.read.parquet(s"$out/granule_cache")
    assert(cache.count() == Pipeline.gatedPixels(spark, sf).count(),
      "granule cache does not hold the gated stage")
    assert(r.cube.queryExecution.executedPlan.toString.contains("granule_cache"),
      "cube plan does not read from the granule cache")
    assert(spark.read.json(s"$out/index").count() == 1)
    assert(spark.read.json(s"$out/style").count() == 6)
    // GeoTIFF frames: one parseable file per cube date, correct grid
    val nDates = r.cube.select("date").distinct().count()
    val tifs = new java.io.File(s"$out/geotiffs")
      .listFiles().filter(_.getName.endsWith(".tif"))
    assert(tifs.length == nDates, s"expected $nDates frames, got ${tifs.length}")
    val dec = ops.GeoTiff.decode(Files.readAllBytes(tifs.head.toPath))
    assert(dec.width == 32 && dec.height == 32 && dec.epsg == 4326)
  }

  test("run's census-derived scene gate equals the pixel-level fromGated gate") {
    // r17: Pipeline.run derives the valid-share keep rule from the
    // granule QC census; this locks the composed cube row-for-row
    // against the pixel-level spelling it replaced (both SFs with data)
    // doubles compared at the oracle's 6-decimal contract (merge order
    // of float partials is not bitwise-deterministic across plans)
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("date"), col("y"), col("x"),
        round(col("ndvi"), 6).as("ndvi"), round(col("evi"), 6).as("evi"),
        col("num_granules_merged"))
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val composed = cells(Pipeline.run(spark, dir).cubeRaw)
      val pixelLevel =
        cells(Pipeline.fromGated(Pipeline.gatedPixels(spark, dir)).cubeRaw)
      assert(composed.exceptAll(pixelLevel).isEmpty &&
        pixelLevel.exceptAll(composed).isEmpty,
        s"census-derived gate drifted from the pixel-level gate at $dir")
    }
  }
}
