package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{Export, Merge, PixelOps, Pixels}

/** Sink round-trips (SURVEY.md §2.2): date-partitioned cube writes with
  * partition pruning on read-back, downsample+fill export frames, events
  * JSON, and the index/style metadata records. */
class ExportSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def cube = PixelOps.withIndices(Pixels.pixels(spark, sf))
    .filter(year(col("date")) === 1996)
    .select(col("time"), col("y"), col("x"),
      col("ndvi_c").as("ndvi"), col("evi_c").as("evi"))

  test("cube sink writes date partitions and read-back round-trips the rows") {
    val out = tmp("cube")
    Export.writeCube(cube, out)
    val back = spark.read.parquet(out)
    assert(back.count() == cube.count())
    // partition column materialized → a date predicate prunes partitions
    val oneDay = back.filter(col("p_date") === lit("1996-03-15"))
    val expect = cube.filter(to_date(col("time")) === lit("1996-03-15"))
    assert(oneDay.count() == expect.count())
    // the predicate must land in PartitionFilters (directory pruning),
    // NOT as a data filter — at 100 TB this is the difference between
    // listing one partition and scanning the whole table
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("p_date"),
      s"date predicate did not prune partitions:\n$scan")
    val prunedParts = oneDay.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(prunedParts.exists(_ == 1), s"expected exactly 1 partition read, got $prunedParts")
  }

  test("granule cache sink partitions by (tile, date) and overwrite invalidates") {
    val out = tmp("cache")
    val g = PixelOps.withIndices(Pixels.pixels(spark, sf))
      .filter(col("tile_id") === 1 && year(col("date")) === 1996)
      .select(col("tile_id"), col("time"), col("y"), col("x"), col("ndvi_c"))
    assert(g.count() > 0)
    Export.writeGranuleCache(g, out)
    val n1 = spark.read.parquet(out).count()
    Export.writeGranuleCache(g, out) // idempotent overwrite
    assert(spark.read.parquet(out).count() == n1)
  }

  test("export frame: downsample reindexes the grid and fill removes NULLs") {
    val f = Export.exportFrame(cube, downsample = 2)
    assert(f.filter(col("ndvi").isNull || col("evi").isNull).count() == 0)
    val (maxY, maxX) = f.agg(max("y"), max("x")).as[(Int, Int)].head()
    assert(maxY <= 15 && maxX <= 15)
    // every kept coordinate came from an even source coordinate
    assert(f.count() ==
      cube.filter(col("y") % 2 === 0 && col("x") % 2 === 0).count())
  }

  test("events JSON sink writes readable records") {
    val out = tmp("events")
    Export.writeEventsJson(ops.Events.abruptDrops(spark, sf), out)
    val back = spark.read.json(out)
    assert(back.count() > 0)
    assert(back.columns.toSet.contains("type"))
  }

  test("index record carries dims, date list, bands, and nodata") {
    val rec = Export.indexRecord(spark, cube).collect().head
    assert(rec.getAs[Int]("height") == 32)
    assert(rec.getAs[Int]("width") == 32)
    assert(rec.getAs[collection.Seq[String]]("dates").nonEmpty)
    assert(rec.getAs[collection.Seq[String]]("bands").toSeq == Seq("ndvi", "evi"))
    assert(rec.getAs[Double]("nodata") == -9999.0)
  }

  test("style sink emits the fixed 6-class ramp") {
    val out = tmp("style")
    Export.writeStyleJson(spark, out)
    assert(spark.read.json(out).count() == 6)
  }
}
