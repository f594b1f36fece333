package graft

import org.apache.spark.sql.functions._

/** Merge-semantics properties (SURVEY.md §5 #3; reference merger.py):
  * single-granule merge is identity, union order doesn't change the
  * merged result, and the mean-of-timestamps is granule- not
  * pixel-weighted. */
class MergeSpec extends SparkSpecBase {
  import spark.implicits._

  private val cube = Seq(
    // (tile, time, y, x, ndvi)
    (0L, "1996-01-01 00:00:00", 0, 0, 0.2),
    (0L, "1996-01-01 00:00:00", 0, 1, 0.4),
    (2L, "1996-01-01 00:00:00", 0, 0, 0.6), // same timestamp, other tile
    (1L, "1996-01-01 03:00:00", 0, 0, 0.8)  // same date, later granule
  ).toDF("tile_id", "time", "y", "x", "ndvi")
    .withColumn("time", to_timestamp(col("time")))

  test("merging a single granule is identity on values (merger.py:26-27)") {
    val one = cube.filter(col("tile_id") === 1)
    val merged = one.groupBy("time", "y", "x").agg(avg("ndvi").as("ndvi"))
    assert(merged.select("ndvi").as[Double].collect().toSeq == Seq(0.8))
    assert(merged.count() == one.count())
  }

  test("spatial merge means across tiles at the same timestamp (merger.py:40-42)") {
    val merged = cube
      .filter(col("time") === to_timestamp(lit("1996-01-01 00:00:00")))
      .groupBy("time", "y", "x")
      .agg(avg("ndvi").as("ndvi"), countDistinct("tile_id").as("n"))
      .orderBy("y", "x")
    val rows = merged.select("ndvi", "n").as[(Double, Long)].collect().toSeq
    assert(rows == Seq((0.4, 2L), (0.4, 1L))) // (0.2+0.6)/2 cell merged; lone cell kept
  }

  test("union order invariance: merge(reverse(parts)) == merge(parts) (merger.py:103-104)") {
    val parts = Seq(
      cube.filter(col("tile_id") === 0),
      cube.filter(col("tile_id") === 1),
      cube.filter(col("tile_id") === 2))
    def mergeAll(ps: Seq[org.apache.spark.sql.DataFrame]) =
      ps.reduce(_ unionByName _)
        .groupBy("time", "y", "x").agg(avg("ndvi").as("ndvi"))
        .orderBy("time", "y", "x")
        .collect().toSeq
    assert(mergeAll(parts) == mergeAll(parts.reverse))
  }

  test("merged timestamp averages distinct granule times, not pixel rows (merger.py:78-80)") {
    // tile 0 contributes 2 pixel rows at 00:00, tile 1 one row at 03:00 —
    // a pixel-weighted mean would skew toward 00:00 (01:00); the granule
    // mean is 01:30.
    val mergedTs = cube
      .select(to_date(col("time")).as("date"), col("time")).distinct()
      .groupBy("date")
      .agg(timestamp_micros(floor(avg(unix_micros(col("time").cast("timestamp"))))
        .cast("long")).as("merged_ts"))
      .select(date_format(col("merged_ts"), "HH:mm:ss")).as[String].collect().toSeq
    assert(mergedTs == Seq("01:30:00"))
  }
}
