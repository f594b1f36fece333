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
    * job inspects.
    *
    * Determinism: the five moments (Σx, Σy, Σxy, Σx², Σy²) accumulate in
    * DECIMAL(38,18) — order-independent and bit-identical across engines
    * like every other exact sum — and the corr/covar/var values derive
    * from them through one fixed IEEE-double formula spelled identically
    * in the oracle, so the hash compare no longer leans on two engines'
    * native moment accumulators agreeing after round-to-6. Zero-variance
    * and n<2 groups yield NULL on BOTH sides by explicit guard (Spark's
    * native corr would emit NaN where DuckDB emits NULL). Single pass,
    * map-side combined. */
  val corrCovarQ: Q = (s, d) => {
    // Pair-guard inside a projection, not a filter: a filter on the
    // derived columns would evaluate the big mask/clip expression trees
    // twice (no CSE across operators).
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
      .withColumn("pair_ok", col("ndvi_c").isNotNull && col("evi_c").isNotNull)
      .withColumn("n_v", when(col("pair_ok"), col("ndvi_c")))
      .withColumn("e_v", when(col("pair_ok"), col("evi_c")))
    val m = px.groupBy("tile_id")
      .agg(
        count(col("n_v")).as("n_pairs"),
        xsumHi(col("n_v")).as("sx"),
        xsumHi(col("e_v")).as("sy"),
        xsumHi(col("n_v") * col("e_v")).as("sxy"),
        xsumHi(col("n_v") * col("n_v")).as("sx2"),
        xsumHi(col("e_v") * col("e_v")).as("sy2"))
      .withColumn("dn", col("n_pairs").cast("double"))
    val vx = col("dn") * col("sx2") - col("sx") * col("sx")
    val vy = col("dn") * col("sy2") - col("sy") * col("sy")
    m.select(
      col("tile_id"),
      col("n_pairs"),
      r6(when(col("n_pairs") > 1 && vx > 0 && vy > 0,
        (col("dn") * col("sxy") - col("sx") * col("sy")) / sqrt(vx * vy)))
        .as("r_ndvi_evi"),
      r6(when(col("n_pairs") > 0,
        (col("sxy") - col("sx") * col("sy") / col("dn")) / col("dn")))
        .as("covp"),
      r6(when(col("n_pairs") > 1,
        (col("sxy") - col("sx") * col("sy") / col("dn")) / (col("dn") - 1)))
        .as("covs"),
      r6(when(col("n_pairs") > 0,
        (col("sx2") - col("sx") * col("sx") / col("dn")) / col("dn")))
        .as("var_ndvi"))
      .orderBy("tile_id")
  }

  val corrCovarSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""WITH g AS (
         |  SELECT tile_id,
         |    CASE WHEN n0 IS NOT NULL AND e0 IS NOT NULL THEN n0 END AS n_v,
         |    CASE WHEN n0 IS NOT NULL AND e0 IS NOT NULL THEN e0 END AS e_v
         |  FROM (
         |    SELECT tile_id, ${f.ndviClipped} AS n0, ${f.eviClipped} AS e0
         |    FROM pixels) t0
         |), m AS (
         |  SELECT tile_id,
         |    count(n_v) AS n_pairs,
         |    CAST(count(n_v) AS DOUBLE) AS dn,
         |    ${xsumHiSql("n_v")} AS sx,
         |    ${xsumHiSql("e_v")} AS sy,
         |    ${xsumHiSql("n_v * e_v")} AS sxy,
         |    ${xsumHiSql("n_v * n_v")} AS sx2,
         |    ${xsumHiSql("e_v * e_v")} AS sy2
         |  FROM g GROUP BY tile_id
         |)
         |SELECT tile_id, n_pairs,
         |  0.0 + round(CASE WHEN n_pairs > 1
         |      AND dn * sx2 - sx * sx > 0 AND dn * sy2 - sy * sy > 0
         |    THEN (dn * sxy - sx * sy)
         |      / sqrt((dn * sx2 - sx * sx) * (dn * sy2 - sy * sy)) END, 6) AS r_ndvi_evi,
         |  0.0 + round(CASE WHEN n_pairs > 0
         |    THEN (sxy - sx * sy / dn) / dn END, 6) AS covp,
         |  0.0 + round(CASE WHEN n_pairs > 1
         |    THEN (sxy - sx * sy / dn) / (dn - 1) END, 6) AS covs,
         |  0.0 + round(CASE WHEN n_pairs > 0
         |    THEN (sx2 - sx * sx / dn) / dn END, 6) AS var_ndvi
         |FROM m
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

  /** Per-frame (per-date) stats over valid pixels — the frame
    * annotation numbers of the reference's animation path
    * (visualize_dataset.py:109-133 titles each rendered frame with its
    * date and the frame's nanmin/nanmax/nanmean). Closes SURVEY §2
    * agg_frame_stats as a declared query. One keyed aggregate,
    * map-side combined, one output row per date at any scale. */
  val frameStatsQ: Q = (s, d) => {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    px.groupBy(date_format(col("date"), "yyyy-MM-dd").as("date"))
      .agg(
        count(lit(1)).as("n_total"),
        count(col("ndvi_c")).as("n_valid"),
        r6(min(col("ndvi_c"))).as("ndvi_min"),
        r6(max(col("ndvi_c"))).as("ndvi_max"),
        r6(avg(col("ndvi_c"))).as("ndvi_mean"),
        r6(min(col("evi_c"))).as("evi_min"),
        r6(max(col("evi_c"))).as("evi_max"),
        r6(avg(col("evi_c"))).as("evi_mean"))
      .orderBy("date")
  }

  val frameStatsSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT strftime(date, '%Y-%m-%d') AS date,
         |  count(*) AS n_total,
         |  count(${f.ndviClipped}) AS n_valid,
         |  0.0 + round(min(${f.ndviClipped}), 6) AS ndvi_min,
         |  0.0 + round(max(${f.ndviClipped}), 6) AS ndvi_max,
         |  0.0 + round(avg(${f.ndviClipped}), 6) AS ndvi_mean,
         |  0.0 + round(min(${f.eviClipped}), 6) AS evi_min,
         |  0.0 + round(max(${f.eviClipped}), 6) AS evi_max,
         |  0.0 + round(avg(${f.eviClipped}), 6) AS evi_mean
         |FROM pixels GROUP BY date
         |ORDER BY date""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "s07_frame_stats" -> frameStatsQ,
    "s06_approx_quantile_bound" -> approxQuantileBoundQ,
    "s01_global_stats" -> globalStatsQ,
    "s02_temporal_mean_px" -> temporalMeanQ,
    "s03_temporal_std_px" -> temporalStdQ,
    "s04_quantiles" -> quantilesQ,
    "s05_corr_covar" -> corrCovarQ)

  val oracle: Map[String, String] = Map(
    "s07_frame_stats" -> frameStatsSql,
    "s06_approx_quantile_bound" -> approxQuantileBoundSql,
    "s01_global_stats" -> globalStatsSql,
    "s02_temporal_mean_px" -> temporalMeanSql,
    "s03_temporal_std_px" -> temporalStdSql,
    "s04_quantiles" -> quantilesSql,
    "s05_corr_covar" -> corrCovarSql)
}
