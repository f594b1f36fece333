package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's end-to-end dataflow (SURVEY.md §3.1,
  * pipeline.py:128-187) composed from the engine's operators into one
  * declarative DAG: pixel scan → band math + masking → per-granule QC
  * gate → scene-level quality filter → same-day merge → chronological
  * cube → abrupt-drop event detection → sinks.
  *
  * Each stage is the already-tested operator; this object only wires
  * them, which is the point — the reference's imperative pipeline
  * becomes plan composition, and Catalyst sees the whole thing at once
  * (filter pushdown through every stage, one shuffle per keyed
  * aggregation, the scene-level window on a relation with one row per
  * scene).
  */
object Pipeline {

  final case class Result(cube: DataFrame, sceneStats: DataFrame, events: DataFrame)

  /** Run the full flow over the testdata pixel relation. */
  def run(spark: SparkSession, dir: String): Result = {
    // 1. scan + indices + masks (processor.py:165-301)
    val px = PixelOps.withIndices(Pixels.pixels(spark, dir))

    // 2. per-granule QC gate (processor.py:280-292): aggregate, filter,
    //    semi-join survivors back to the pixel relation
    val gatedGranules = Quality.granuleQc(spark, dir)
      .filter(col("contamination_pct") <= Quality.MaxContaminationPct &&
        col("valid_pct") >= Quality.MinValidPct)
      .select("tile_id", "time")
    val gated = px.join(gatedGranules, Seq("tile_id", "time"), "left_semi")

    // 3. scene-level quality filter (quality.py:29-91): keep scenes the
    //    neighbor pass doesn't reject (skip entirely when < 3 scenes,
    //    quality.py:19-21)
    val scenes = gated.groupBy("time")
      .agg(avg("ndvi_c").as("ndvi_mean"),
        stddev_pop(col("ndvi_c")).as("ndvi_std"),
        count(col("ndvi_c")).as("n_valid"),
        count(lit(1)).as("n_total"))
    val w = Window.orderBy("time")
    val keepScenes = scenes
      .withColumn("n_scenes", count(lit(1)).over(Window.partitionBy()))
      .withColumn("prev_mean", lag(col("ndvi_mean"), 1).over(w))
      .withColumn("next_mean", lead(col("ndvi_mean"), 1).over(w))
      .withColumn("valid_share", lit(100.0) * col("n_valid") / col("n_total"))
      .filter(col("n_scenes") < 3 || col("valid_share") >= 40.0)
      .select("time")
    val filtered = gated.join(keepScenes, Seq("time"), "left_semi")

    // 4. same-day merge (merger.py:56-93) + chronological order
    val cube = filtered
      .groupBy(col("date"), col("y"), col("x"))
      .agg(avg("ndvi_c").as("ndvi"), avg("evi_c").as("evi"),
        countDistinct("tile_id", "time").as("num_granules_merged"))
      .withColumn("time", col("date").cast("timestamp"))
      .orderBy("time", "y", "x")

    // 5. scene series + event detection (quality.py:105-181) over the
    //    merged cube's daily means
    val daySeries = cube.groupBy(col("date").as("day"))
      .agg(avg("ndvi").as("vmean"))
    val events = Events.detectDrops(daySeries,
      dropThreshold = -0.05, recoveryThreshold = 0.03)

    Result(cube, scenes, events)
  }

  /** Run and persist through the standard sinks (pipeline.py:167-187),
    * including per-date GeoTIFF frames on the reference grid
    * (arcgis.py:60-101: export follows the cube write). */
  def runAndWrite(spark: SparkSession, dir: String, outDir: String): Result = {
    val r = run(spark, dir)
    Export.writeCube(r.cube, s"$outDir/cube")
    Export.writeEventsJson(r.events, s"$outDir/events")
    Export.writeIndexJson(spark, r.cube, s"$outDir/index")
    Export.writeStyleJson(spark, s"$outDir/style")
    Export.writeGeoTiffs(r.cube, s"$outDir/geotiffs", Resample.SrcGrid)
    r
  }
}
