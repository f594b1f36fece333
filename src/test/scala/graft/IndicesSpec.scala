package graft

import org.apache.spark.sql.functions._
import graft.ops.Indices

/** §2.3 expression semantics: NaN→NULL discipline, NULL-propagating clip,
  * mask null-safety, clip bounds (reference processor.py:258-301).
  * Property-style sweeps use deterministic grids instead of random gens
  * so failures reproduce exactly. */
class IndicesSpec extends SparkSpecBase {
  import spark.implicits._

  test("clip propagates NULL (ADVICE r01 high): clip(NULL) is NULL, not the hi bound") {
    val df = Seq[Option[Double]](None, Some(0.5), Some(5.0), Some(-5.0)).toDF("v")
      .select(Indices.clip(col("v"), -1.0, 1.0).as("c"))
    val got = df.as[Option[Double]].collect().toSeq
    assert(got == Seq(None, Some(0.5), Some(1.0), Some(-1.0)))
  }

  test("combinedMask: outside-polygon pixels (NULL bands) mask regardless of other legs") {
    val df = Seq(
      (Some(500.0), Some(900.0), Some(100.0), 0), // clean
      (Option.empty[Double], Some(900.0), Some(100.0), 0), // outside: red NULL
      (Some(500.0), Some(900.0), Some(100.0), 2), // cloud shadow
      (Some(500.0), Some(900.0), Some(2000.0), 0) // haze
    ).toDF("red", "nir", "blue", "fmask")
    val got = df.select(Indices.combinedMask(
      col("red"), col("nir"), col("blue"), col("fmask")).as("m"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(false, true, true, true))
  }

  test("property sweep: clipped NDVI in [-1, 1], EVI in [-3, 3] over a finite band grid") {
    val bands = for {
      red <- Seq(1.0, 50.0, 99.9, 100.1, 5000.0, 9999.0, 11999.0)
      nir <- Seq(1.0, 120.0, 4000.0, 10000.5, 11999.0)
      blue <- Seq(0.0, 700.0, 1500.5, 1999.0)
    } yield (red, nir, blue)
    val df = bands.toDF("red", "nir", "blue")
      .select(
        Indices.clip(Indices.ndvi(col("nir"), col("red")), -1.0, 1.0).as("n"),
        Indices.clip(Indices.evi(col("nir"), col("red"), col("blue")), -3.0, 3.0).as("e"))
    df.as[(Double, Double)].collect().foreach { case (n, e) =>
      assert(n >= -1.0 && n <= 1.0, s"ndvi out of range: $n")
      assert(e >= -3.0 && e <= 3.0, s"evi out of range: $e")
    }
  }

  test("property: adding a mask never increases the valid count (mask monotonicity)") {
    val rows = Seq.tabulate(50)(i =>
      (100.0 + i * 37.0 % 11000.0, 200.0 + i * 91.0 % 11000.0, (i * 53.0) % 2000.0, i % 6))
    val df = rows.toDF("red", "nir", "blue", "fmask")
    val base = Indices.outsidePolygon(col("red"), col("nir"), col("blue"))
    val withHaze = base || coalesce(Indices.haze(col("blue")), lit(false))
    val nBase = df.filter(!base).count()
    val nMore = df.filter(!withHaze).count()
    assert(nMore <= nBase)
  }

  test("nodata round-trip: fill then nullif is identity on valid values") {
    val df = Seq(Some(0.25), None, Some(-0.5)).toDF("v")
      .select(Indices.nodataToNull(Indices.nodataFill(col("v"))).as("r"))
    assert(df.as[Option[Double]].collect().toSeq == Seq(Some(0.25), None, Some(-0.5)))
  }
}
