package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Num._

/** Whole-cube and per-pixel temporal statistics (SURVEY.md §2.6
  * agg_global_stats / agg_temporal_mean_px / agg_temporal_std_px;
  * reference visualize_dataset.py:47-59, 277-314).
  *
  * `percentile` (exact, interpolating) is used instead of
  * `percentile_approx` so the DuckDB oracle (`quantile_cont`) matches
  * bit-for-bit (SURVEY.md §7.5). At 100 TB an exact percentile implies a
  * sort — swap to approx_percentile in latency-sensitive paths where the
  * oracle contract doesn't apply.
  */
object Stats {

  type Q = (SparkSession, String) => DataFrame

  /** Whole-cube min/max/mean/median/std + valid % per variable —
    * visualize_dataset.py:47-59 (np.nanmin/max/mean/median/std,
    * population std per xarray ddof=0). */
  val globalStatsQ: Q = (s, d) => {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    def stats(c: String, tag: String) = px.agg(
      lit(tag).as("variable"),
      count(lit(1)).as("n_total"),
      count(col(c)).as("n_valid"),
      r6(lit(100.0) * count(col(c)) / count(lit(1))).as("valid_pct"),
      r6(min(col(c))).as("vmin"),
      r6(max(col(c))).as("vmax"),
      r6(avg(col(c))).as("vmean"),
      r6(expr(s"percentile($c, 0.5)")).as("vmedian"),
      r6(stddev_pop(col(c))).as("vstd"))
    stats("ndvi_c", "ndvi").unionByName(stats("evi_c", "evi")).orderBy("variable")
  }

  val globalStatsSql: String = {
    val f = Pixels.Sql0
    def one(expr: String, tag: String) =
      s"""SELECT '$tag' AS variable,
         |  count(*) AS n_total,
         |  count($expr) AS n_valid,
         |  0.0 + round(100.0 * count($expr) / count(*), 6) AS valid_pct,
         |  0.0 + round(min($expr), 6) AS vmin,
         |  0.0 + round(max($expr), 6) AS vmax,
         |  0.0 + round(avg($expr), 6) AS vmean,
         |  0.0 + round(quantile_cont($expr, 0.5), 6) AS vmedian,
         |  0.0 + round(stddev_pop($expr), 6) AS vstd
         |FROM pixels""".stripMargin
    Pixels.withPixels(
      s"""${one(f.ndviClipped, "ndvi")}
         |UNION ALL
         |${one(f.eviClipped, "evi")}
         |ORDER BY variable""".stripMargin)
  }

  /** Per-pixel mean over time — visualize_dataset.py:277-278. */
  val temporalMeanQ: Q = (s, d) => {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    px.groupBy("y", "x")
      .agg(
        r6(avg("ndvi_c")).as("ndvi_mean"),
        r6(avg("evi_c")).as("evi_mean"),
        count(col("ndvi_c")).as("n_obs"))
      .orderBy("y", "x")
  }

  val temporalMeanSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT y, x,
         |  0.0 + round(avg(${f.ndviClipped}), 6) AS ndvi_mean,
         |  0.0 + round(avg(${f.eviClipped}), 6) AS evi_mean,
         |  count(${f.ndviClipped}) AS n_obs
         |FROM pixels GROUP BY y, x
         |ORDER BY y, x""".stripMargin)
  }

  /** Per-pixel population std over time — visualize_dataset.py:313-314
    * (xarray default ddof=0 ⇒ stddev_pop, SURVEY.md §7.4 #2). */
  val temporalStdQ: Q = (s, d) => {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    px.groupBy("y", "x")
      .agg(
        r6(stddev_pop(col("ndvi_c"))).as("ndvi_std"),
        r6(stddev_pop(col("evi_c"))).as("evi_std"))
      .orderBy("y", "x")
  }

  val temporalStdSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT y, x,
         |  0.0 + round(stddev_pop(${f.ndviClipped}), 6) AS ndvi_std,
         |  0.0 + round(stddev_pop(${f.eviClipped}), 6) AS evi_std
         |FROM pixels GROUP BY y, x
         |ORDER BY y, x""".stripMargin)
  }

  /** Exact quantile battery per group (q25/q50/q75/q95 of the clipped
    * NDVI per tile): `percentile` ≡ DuckDB `quantile_cont`, both linear
    * interpolation — never approx in a declared query (SURVEY.md §7.5).
    * Per-key exact percentiles sort within the key only, so the shuffle
    * is the groupBy and the sort parallelizes across tiles. */
  val quantilesQ: Q = (s, d) => {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    px.groupBy("tile_id")
      .agg(
        count(col("ndvi_c")).as("n_valid"),
        r6(expr("percentile(ndvi_c, 0.25)")).as("q25"),
        r6(expr("percentile(ndvi_c, 0.5)")).as("q50"),
        r6(expr("percentile(ndvi_c, 0.75)")).as("q75"),
        r6(expr("percentile(ndvi_c, 0.95)")).as("q95"))
      .orderBy("tile_id")
  }

  val quantilesSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT tile_id,
         |  count(${f.ndviClipped}) AS n_valid,
         |  0.0 + round(quantile_cont(${f.ndviClipped}, 0.25), 6) AS q25,
         |  0.0 + round(quantile_cont(${f.ndviClipped}, 0.5), 6) AS q50,
         |  0.0 + round(quantile_cont(${f.ndviClipped}, 0.75), 6) AS q75,
         |  0.0 + round(quantile_cont(${f.ndviClipped}, 0.95), 6) AS q95
         |FROM pixels GROUP BY tile_id
         |ORDER BY tile_id""".stripMargin)
  }

  /** Bivariate moment aggregates (corr / covariance / variance of the
    * two indices per tile) — the correlation structure a band-math QC
    * job inspects. corr is scale-free (|r| <= 1) and the index values
    * are unit-magnitude, so double moment accumulation stays far inside
    * round-to-6; single pass, map-side combined. */
  val corrCovarQ: Q = (s, d) => {
    // No pre-filter: corr/covar skip incomplete pairs natively, and a
    // filter on the derived columns would evaluate the big mask/clip
    // expression trees twice (once in the filter, once under the
    // aggregate — no CSE across operators). var_pop gets a `when` guard
    // so it sees exactly the pair-complete rows the others do.
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    px.groupBy("tile_id")
      .agg(
        sum(when(col("ndvi_c").isNotNull && col("evi_c").isNotNull, 1L)
          .otherwise(0L)).as("n_pairs"),
        r6(corr(col("ndvi_c"), col("evi_c"))).as("r_ndvi_evi"),
        r6(covar_pop(col("ndvi_c"), col("evi_c"))).as("covp"),
        r6(covar_samp(col("ndvi_c"), col("evi_c"))).as("covs"),
        r6(var_pop(when(col("evi_c").isNotNull, col("ndvi_c")))).as("var_ndvi"))
      .orderBy("tile_id")
  }

  val corrCovarSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT tile_id,
         |  CAST(sum(CASE WHEN n_v IS NOT NULL AND e_v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
         |  0.0 + round(corr(n_v, e_v), 6) AS r_ndvi_evi,
         |  0.0 + round(covar_pop(n_v, e_v), 6) AS covp,
         |  0.0 + round(covar_samp(n_v, e_v), 6) AS covs,
         |  0.0 + round(var_pop(CASE WHEN e_v IS NOT NULL THEN n_v END), 6) AS var_ndvi
         |FROM (
         |  SELECT tile_id, ${f.ndviClipped} AS n_v, ${f.eviClipped} AS e_v
         |  FROM pixels) t
         |GROUP BY tile_id
         |ORDER BY tile_id""".stripMargin)
  }

  /** Approx-percentile sketch with an oracle-checkable error contract
    * (the r17 pattern for engine-specific sketches): the raw
    * `approx_percentile` value differs per engine, so the declared
    * output is the exact quantile plus a boolean asserting the sketch
    * landed inside a rank-error bound the accuracy parameter implies;
    * the oracle asserts the bound as literal TRUE. At 100 TB the sketch
    * is one pass and mergeable where the exact form must sort per key. */
  val approxQuantileBoundQ: Q = (s, d) => {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    px.groupBy("tile_id")
      .agg(
        count(col("ndvi_c")).as("n_valid"),
        r6(expr("percentile(ndvi_c, 0.5)")).as("exact_median"),
        expr("approx_percentile(ndvi_c, 0.5, 1000)").as("ap"),
        expr("percentile(ndvi_c, 0.45)").as("lo"),
        expr("percentile(ndvi_c, 0.55)").as("hi"))
      .select(col("tile_id"), col("n_valid"), col("exact_median"),
        (col("ap") >= col("lo") && col("ap") <= col("hi")).as("approx_in_bound"))
      .orderBy("tile_id")
  }

  val approxQuantileBoundSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT tile_id,
         |  count(${f.ndviClipped}) AS n_valid,
         |  0.0 + round(quantile_cont(${f.ndviClipped}, 0.5), 6) AS exact_median,
         |  TRUE AS approx_in_bound
         |FROM pixels GROUP BY tile_id
         |ORDER BY tile_id""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "s06_approx_quantile_bound" -> approxQuantileBoundQ,
    "s01_global_stats" -> globalStatsQ,
    "s02_temporal_mean_px" -> temporalMeanQ,
    "s03_temporal_std_px" -> temporalStdQ,
    "s04_quantiles" -> quantilesQ,
    "s05_corr_covar" -> corrCovarQ)

  val oracle: Map[String, String] = Map(
    "s06_approx_quantile_bound" -> approxQuantileBoundSql,
    "s01_global_stats" -> globalStatsSql,
    "s02_temporal_mean_px" -> temporalMeanSql,
    "s03_temporal_std_px" -> temporalStdSql,
    "s04_quantiles" -> quantilesSql,
    "s05_corr_covar" -> corrCovarSql)
}
