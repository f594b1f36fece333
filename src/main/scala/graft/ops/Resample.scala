package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Num._

/** Reprojection / resampling (SURVEY.md §2.4; reference
  * processor.py:205-251): warp a source grid to a target grid with
  * bilinear (reflectance) or nearest (categorical) sampling.
  *
  * Two implementations with identical semantics:
  *  - [[bilinearRelational]]: pure DataFrame ops — each target cell
  *    explodes to its ≤4 covering source cells with bilinear weights,
  *    then a keyed aggregate divides the weighted sums. Shuffle-scalable
  *    (partitions by target key), DuckDB-oracle-checkable, and the form
  *    that survives 100 TB (option (b) in SURVEY §2.4).
  *  - [[bilinearKernel]]: per-tile mapPartitions warp over a dense
  *    in-memory band — the rasterio-like form (option (a)), used when a
  *    tile fits an executor core; ResampleSpec asserts both agree.
  *
  * NULL handling mirrors the NaN discipline: masked source cells drop
  * out of the weighted sum (renormalizing by the remaining weight),
  * like numpy nan-aware resampling.
  */
object Resample {

  type Q = (SparkSession, String) => DataFrame

  val SrcSize = 32
  val DstSize = 20
  /** scale = 32/20; target cell centers map to source coords
    * sy = (ty + 0.5) * scale - 0.5. */
  val Scale: Double = SrcSize.toDouble / DstSize

  /** Source grid: per-(y,x) temporal mean of clipped NDVI (deterministic
    * over the pixel relation). */
  def sourceGrid(s: SparkSession, d: String): DataFrame =
    PixelOps.withIndices(Pixels.pixels(s, d))
      .groupBy("y", "x")
      .agg(avg("ndvi_c").as("v"))

  private val sourceGridSql: String = {
    val f = Pixels.Sql0
    s"""SELECT y, x, avg(${f.ndviClipped}) AS v
       |FROM pixels GROUP BY y, x""".stripMargin
  }

  /** Relational bilinear resample of the 32×32 NDVI mean grid to 20×20. */
  val bilinearRelational: Q = (s, d) => {
    val src = sourceGrid(s, d)
    val ty = s.range(DstSize).select(col("id").cast("int").as("ty"))
    val tx = s.range(DstSize).select(col("id").cast("int").as("tx"))
    val corners = Seq((0, 0), (0, 1), (1, 0), (1, 1))
      .toDF(s)("dy", "dx")
    val targets = ty.crossJoin(tx).crossJoin(corners)
      .withColumn("sy", (col("ty") + 0.5) * Scale - 0.5)
      .withColumn("sx", (col("tx") + 0.5) * Scale - 0.5)
      .withColumn("fy", col("sy") - floor(col("sy")))
      .withColumn("fx", col("sx") - floor(col("sx")))
      .withColumn("ny", least(greatest(floor(col("sy")).cast("int") + col("dy"), lit(0)), lit(SrcSize - 1)))
      .withColumn("nx", least(greatest(floor(col("sx")).cast("int") + col("dx"), lit(0)), lit(SrcSize - 1)))
      .withColumn("w",
        (when(col("dy") === 0, lit(1.0) - col("fy")).otherwise(col("fy"))) *
          (when(col("dx") === 0, lit(1.0) - col("fx")).otherwise(col("fx"))))
    targets.join(src, col("ny") === col("y") && col("nx") === col("x"), "left")
      .groupBy("ty", "tx")
      .agg(
        r6(sum(when(col("v").isNotNull, col("w") * col("v"))) /
          sum(when(col("v").isNotNull, col("w")))).as("ndvi"),
        r6(sum(when(col("v").isNotNull, col("w")))).as("w_valid"))
      .orderBy("ty", "tx")
  }

  implicit private class SeqToDF(private val pairs: Seq[(Int, Int)]) extends AnyVal {
    def toDF(s: SparkSession)(c1: String, c2: String): DataFrame = {
      val rows = pairs.map { case (a, b) => Row(a, b) }
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField(c1, IntegerType, false), StructField(c2, IntegerType, false))))
    }
  }

  val bilinearRelationalSql: String = Pixels.withPixels(
    s"""WITH src AS (
       |$sourceGridSql
       |), corners AS (
       |  SELECT * FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) AS t(dy, dx)
       |), targets AS (
       |  SELECT ty.g AS ty, tx.g AS tx, dy, dx,
       |    (ty.g + 0.5) * $Scale - 0.5 AS sy,
       |    (tx.g + 0.5) * $Scale - 0.5 AS sx
       |  FROM (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) ty,
       |       (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) tx,
       |       corners
       |), weighted AS (
       |  SELECT ty, tx,
       |    least(greatest(CAST(floor(sy) AS INT) + dy, 0), ${SrcSize - 1}) AS ny,
       |    least(greatest(CAST(floor(sx) AS INT) + dx, 0), ${SrcSize - 1}) AS nx,
       |    (CASE WHEN dy = 0 THEN 1.0 - (sy - floor(sy)) ELSE sy - floor(sy) END)
       |    * (CASE WHEN dx = 0 THEN 1.0 - (sx - floor(sx)) ELSE sx - floor(sx) END) AS w
       |  FROM targets
       |)
       |SELECT ty, tx,
       |  0.0 + round(sum(CASE WHEN v IS NOT NULL THEN w * v END)
       |        / sum(CASE WHEN v IS NOT NULL THEN w END), 6) AS ndvi,
       |  0.0 + round(sum(CASE WHEN v IS NOT NULL THEN w END), 6) AS w_valid
       |FROM weighted LEFT JOIN src ON ny = src.y AND nx = src.x
       |GROUP BY ty, tx
       |ORDER BY ty, tx""".stripMargin)

  /** Nearest-neighbor resample of the categorical fmask majority grid
    * (reference processor.py:241-251 uses nearest for Fmask). */
  val nearestRelational: Q = (s, d) => {
    val src = Pixels.pixels(s, d)
      .groupBy("y", "x")
      .agg(min("fmask").as("fmask")) // deterministic per-cell class
    val ty = s.range(DstSize).select(col("id").cast("int").as("ty"))
    val tx = s.range(DstSize).select(col("id").cast("int").as("tx"))
    ty.crossJoin(tx)
      .withColumn("ny", least(greatest(
        round((col("ty") + 0.5) * Scale - 0.5).cast("int"), lit(0)), lit(SrcSize - 1)))
      .withColumn("nx", least(greatest(
        round((col("tx") + 0.5) * Scale - 0.5).cast("int"), lit(0)), lit(SrcSize - 1)))
      .join(src, col("ny") === col("y") && col("nx") === col("x"))
      .select(col("ty"), col("tx"), col("fmask"))
      .orderBy("ty", "tx")
  }

  val nearestRelationalSql: String = Pixels.withPixels(
    s"""WITH src AS (
       |  SELECT y, x, min(fmask) AS fmask FROM pixels GROUP BY y, x
       |)
       |SELECT ty.g AS ty, tx.g AS tx, fmask
       |FROM (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) ty,
       |     (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) tx
       |JOIN src
       |  ON src.y = least(greatest(CAST(round((ty.g + 0.5) * $Scale - 0.5) AS INT), 0), ${SrcSize - 1})
       | AND src.x = least(greatest(CAST(round((tx.g + 0.5) * $Scale - 0.5) AS INT), 0), ${SrcSize - 1})
       |ORDER BY ty, tx""".stripMargin)

  /** Dense-kernel twin of [[bilinearRelational]]: warp a full tile held
    * as an Array inside one task (option (a)); used per-tile where a
    * tile fits in memory. */
  def bilinearKernel(src: Array[Array[Option[Double]]], dstSize: Int): Array[Array[Option[Double]]] = {
    val n = src.length
    val scale = n.toDouble / dstSize
    Array.tabulate(dstSize, dstSize) { (ty, tx) =>
      val sy = (ty + 0.5) * scale - 0.5
      val sx = (tx + 0.5) * scale - 0.5
      val y0 = math.floor(sy).toInt; val fy = sy - math.floor(sy)
      val x0 = math.floor(sx).toInt; val fx = sx - math.floor(sx)
      var num = 0.0; var den = 0.0
      for ((dy, dx) <- Seq((0, 0), (0, 1), (1, 0), (1, 1))) {
        val ny = math.min(math.max(y0 + dy, 0), n - 1)
        val nx = math.min(math.max(x0 + dx, 0), n - 1)
        val w = (if (dy == 0) 1.0 - fy else fy) * (if (dx == 0) 1.0 - fx else fx)
        src(ny)(nx).foreach { v => num += w * v; den += w }
      }
      if (den == 0.0) None else Some(num / den)
    }
  }

  val queries: Map[String, Q] = Map(
    "g01_resample_bilinear" -> bilinearRelational,
    "g02_resample_nearest" -> nearestRelational)

  val oracle: Map[String, String] = Map(
    "g01_resample_bilinear" -> bilinearRelationalSql,
    "g02_resample_nearest" -> nearestRelationalSql)
}
