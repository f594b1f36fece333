package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num._

/** Granule/scene quality-control aggregations and the neighbor-aware scene
  * rejection pass (SURVEY.md §2.6 agg_granule_qc / agg_granule_gate /
  * agg_scene_stats and §2.7 win_quality_neighbor; reference
  * processor.py:270-292, quality.py:17-96).
  *
  * Scale posture: the per-granule QC is a keyed hash aggregation (partial
  * map-side combine, shuffle bounded by granule cardinality, not pixel
  * count). The neighbor pass runs over the *scene-level* relation — one
  * row per timestamp — so its unpartitioned window is trivially small no
  * matter how many pixels each scene has (SURVEY.md §7.6).
  */
object Quality {

  type Q = (SparkSession, String) => DataFrame

  /** Gate thresholds, scaled to the synthetic pixel relation (the
    * reference's 30%/10% at settings.py:7-8 would reject almost every
    * synthetic granule; semantics identical, constants data-appropriate). */
  val MaxContaminationPct = 55.0
  val MinValidPct = 30.0

  /** Per-granule conditional counts — processor.py:270-272. The QcConfig
    * parameter feeds BOTH the Catalyst predicates here and the oracle SQL
    * fragments (Pixels.Sql(cfg)) — one source of truth for thresholds. */
  def granuleQc(s: SparkSession, d: String,
      cfg: Indices.QcConfig = Indices.DefaultQc): DataFrame =
    granuleQcOf(Pixels.pixels(s, d), cfg)

  /** [[granuleQc]] over an arbitrary pixel relation — the form the
    * incremental cube maintenance aggregates over a batch alone (QC is
    * per-granule, so a batch's verdicts equal the full corpus's). */
  private[graft] def granuleQcOf(px: DataFrame,
      cfg: Indices.QcConfig = Indices.DefaultQc): DataFrame = {
    val mask = Indices.combinedMask(col("red"), col("nir"), col("blue"), col("fmask"), cfg)
    val haze = coalesce(Indices.haze(col("blue"), cfg), lit(false))
    val anomaly = coalesce(
      Indices.anomalyLow(col("red"), col("nir"), cfg) ||
        Indices.anomalyHigh(col("red"), col("nir"), cfg), lit(false))
    val invalid = coalesce(Indices.invalidNdvi(col("nir"), col("red"), cfg), lit(false))
    px.groupBy("tile_id", "time")
      .agg(
        count(lit(1)).as("total"),
        sum(when(mask, 1L).otherwise(0L)).as("n_masked"),
        r6(lit(100.0) * sum(when(!mask, 1L).otherwise(0L)) / count(lit(1))).as("valid_pct"),
        r6(lit(100.0) * (sum(when(haze, 1L).otherwise(0L))
          + sum(when(anomaly, 1L).otherwise(0L))
          + sum(when(invalid, 1L).otherwise(0L))) / count(lit(1))).as("contamination_pct"),
        // per-granule count of non-NULL clipped NDVI — the exact rows
        // the scene-level valid-share keep rule counts per time, so the
        // composed pipeline (Pipeline.run) can derive that rule from
        // this census instead of a second pixel-level aggregation over
        // the gated relation (r17). Column pruning removes it for the
        // declarative consumers; the eager-pinned batch paths drop it
        // explicitly before the pin (a localCheckpoint materializes
        // all columns)
        count(Indices.clip(
          Indices.maskToNull(Indices.ndvi(col("nir"), col("red")), mask),
          -1.0, 1.0)).as("n_valid_ndvi"))
  }

  /** QC relation with a string timestamp key (deterministic output). */
  private def qcOut(df: DataFrame): DataFrame =
    df.select(
      col("tile_id"),
      date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("granule_ts"),
      col("total"), col("n_masked"), col("valid_pct"), col("contamination_pct"))

  val granuleQcQ: Q = (s, d) => qcOut(granuleQc(s, d)).orderBy("tile_id", "granule_ts")

  private[graft] def qcSqlBody: String = {
    val f = Pixels.Sql0
    s"""SELECT tile_id, time, count(*) AS total,
       |  CAST(sum(CASE WHEN ${f.combinedMask} THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       |  0.0 + round(100.0 * sum(CASE WHEN NOT ${f.combinedMask} THEN 1 ELSE 0 END) / count(*), 6) AS valid_pct,
       |  0.0 + round(100.0 * (sum(CASE WHEN coalesce(${f.haze}, false) THEN 1 ELSE 0 END)
       |    + sum(CASE WHEN coalesce(${f.anomalyLow} OR ${f.anomalyHigh}, false) THEN 1 ELSE 0 END)
       |    + sum(CASE WHEN coalesce(${f.invalidNdvi}, false) THEN 1 ELSE 0 END)) / count(*), 6) AS contamination_pct
       |FROM pixels GROUP BY tile_id, time""".stripMargin
  }

  val granuleQcSql: String = Pixels.withPixels(
    s"""SELECT tile_id, strftime(time, '%Y-%m-%d %H:%M:%S') AS granule_ts,
       |  total, n_masked, valid_pct, contamination_pct
       |FROM ($qcSqlBody)
       |ORDER BY tile_id, granule_ts""".stripMargin)

  /** HAVING-style granule gate — processor.py:280-292: aggregate QC, then
    * keep only granules passing both thresholds. */
  val granuleGateQ: Q = (s, d) =>
    qcOut(granuleQc(s, d)
        .filter(col("contamination_pct") <= MaxContaminationPct &&
          col("valid_pct") >= MinValidPct))
      .orderBy("tile_id", "granule_ts")

  val granuleGateSql: String = Pixels.withPixels(
    s"""SELECT tile_id, strftime(time, '%Y-%m-%d %H:%M:%S') AS granule_ts,
       |  total, n_masked, valid_pct, contamination_pct
       |FROM ($qcSqlBody)
       |WHERE contamination_pct <= $MaxContaminationPct AND valid_pct >= $MinValidPct
       |ORDER BY tile_id, granule_ts""".stripMargin)

  /** Per-scene mean/std over valid pixels — quality.py:33-34. NULL-skipping
    * avg ≡ np.nanmean; stddev_pop ≡ np.nanstd (ddof=0). */
  def sceneStats(s: SparkSession, d: String): DataFrame = {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    px.groupBy("time")
      .agg(
        avg("ndvi_c").as("ndvi_mean"),
        stddev_pop(col("ndvi_c")).as("ndvi_std"),
        count(col("ndvi_c")).as("n_valid"),
        count(lit(1)).as("n_total"))
  }

  val sceneStatsQ: Q = (s, d) =>
    sceneStats(s, d)
      .select(
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("scene_ts"),
        r6(col("ndvi_mean")).as("ndvi_mean"),
        r6(col("ndvi_std")).as("ndvi_std"),
        col("n_valid"), col("n_total"))
      .orderBy("scene_ts")

  private def sceneSqlBody: String = {
    val f = Pixels.Sql0
    s"""SELECT time,
       |  avg(${f.ndviClipped}) AS ndvi_mean,
       |  stddev_pop(${f.ndviClipped}) AS ndvi_std,
       |  count(${f.ndviClipped}) AS n_valid,
       |  count(*) AS n_total
       |FROM pixels GROUP BY time""".stripMargin
  }

  val sceneStatsSql: String = Pixels.withPixels(
    s"""SELECT strftime(time, '%Y-%m-%d %H:%M:%S') AS scene_ts,
       |  0.0 + round(ndvi_mean, 6) AS ndvi_mean,
       |  0.0 + round(ndvi_std, 6) AS ndvi_std,
       |  n_valid, n_total
       |FROM ($sceneSqlBody)
       |ORDER BY scene_ts""".stripMargin)

  /** Neighbor-aware scene rejection — quality.py:29-91, one lag/lead pass
    * over the scene relation (NOT an iterative fixpoint; SURVEY.md §7.4
    * #7). Thresholds scaled to the synthetic series. Scenes with < 3
    * timestamps skip the filter entirely (quality.py:19-21). */
  val qualityNeighborQ: Q = (s, d) => {
    val scenes = sceneStats(s, d)
      .withColumn("contamination_pct",
        lit(100.0) * (col("n_total") - col("n_valid")) / col("n_total"))
    val w = Window.orderBy("time")
    val enriched = scenes
      .withColumn("n_scenes", count(lit(1)).over(Window.partitionBy()))
      .withColumn("prev_mean", lag(col("ndvi_mean"), 1).over(w))
      .withColumn("next_mean", lead(col("ndvi_mean"), 1).over(w))
    val nbMean = when(col("prev_mean").isNull && col("next_mean").isNull, lit(null))
      .when(col("prev_mean").isNull, col("next_mean"))
      .when(col("next_mean").isNull, col("prev_mean"))
      .otherwise((col("prev_mean") + col("next_mean")) / 2.0)
    val drop = nbMean - col("ndvi_mean")
    val recovery = col("next_mean") - col("ndvi_mean")
    val status = when(col("n_scenes") < 3, lit("kept_all"))
      .when(col("valid_share") < 40.0 || col("contamination_pct") > 80.0, lit("rejected_hard"))
      .when(!(col("contamination_pct") > 62.0 ||
        (col("ndvi_mean") < 0.0 && col("ndvi_std") > 0.5)), lit("kept"))
      .when(coalesce(drop > 0.15, lit(false)) && coalesce(recovery > 0.1, lit(false)),
        lit("rejected_drop"))
      .when(col("contamination_pct") > 70.0, lit("rejected_contamination"))
      .otherwise(lit("kept_suspect"))
    enriched
      .withColumn("valid_share", lit(100.0) * col("n_valid") / col("n_total"))
      .withColumn("status", status)
      .select(
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("scene_ts"),
        r6(col("ndvi_mean")).as("ndvi_mean"),
        r6(col("contamination_pct")).as("contamination_pct"),
        col("status"))
      .orderBy("scene_ts")
  }

  val qualityNeighborSql: String = Pixels.withPixels(
    s"""WITH scenes AS (
       |  SELECT time, ndvi_mean, ndvi_std, n_valid, n_total,
       |    100.0 * (n_total - n_valid) / n_total AS contamination_pct,
       |    100.0 * n_valid / n_total AS valid_share
       |  FROM ($sceneSqlBody)
       |), enriched AS (
       |  SELECT *,
       |    count(*) OVER () AS n_scenes,
       |    lag(ndvi_mean) OVER (ORDER BY time) AS prev_mean,
       |    lead(ndvi_mean) OVER (ORDER BY time) AS next_mean
       |  FROM scenes
       |)
       |SELECT strftime(time, '%Y-%m-%d %H:%M:%S') AS scene_ts,
       |  0.0 + round(ndvi_mean, 6) AS ndvi_mean,
       |  0.0 + round(contamination_pct, 6) AS contamination_pct,
       |  CASE
       |    WHEN n_scenes < 3 THEN 'kept_all'
       |    WHEN valid_share < 40.0 OR contamination_pct > 80.0 THEN 'rejected_hard'
       |    WHEN NOT (contamination_pct > 62.0 OR (ndvi_mean < 0.0 AND ndvi_std > 0.5)) THEN 'kept'
       |    WHEN coalesce((CASE
       |        WHEN prev_mean IS NULL AND next_mean IS NULL THEN NULL
       |        WHEN prev_mean IS NULL THEN next_mean
       |        WHEN next_mean IS NULL THEN prev_mean
       |        ELSE (prev_mean + next_mean) / 2.0 END) - ndvi_mean > 0.15, false)
       |      AND coalesce(next_mean - ndvi_mean > 0.1, false) THEN 'rejected_drop'
       |    WHEN contamination_pct > 70.0 THEN 'rejected_contamination'
       |    ELSE 'kept_suspect'
       |  END AS status
       |FROM enriched
       |ORDER BY scene_ts""".stripMargin)

  /** The filter APPLIED — quality.py:93-96: rejected timestamps drop out
    * of the pixel cube via a semi-join against the kept scene set; output
    * is the per-scene survivor census (proves the join-back shape, not
    * just the per-scene verdict that q04 emits). */
  val qualityFilterAppliedQ: Q = (s, d) => {
    val px = PixelOps.withIndices(Pixels.pixels(s, d))
    val kept = sceneStats(s, d)
      .withColumn("valid_share", lit(100.0) * col("n_valid") / col("n_total"))
      .filter(col("valid_share") >= 40.0)
      .select("time")
    px.join(kept, Seq("time"), "left_semi")
      .groupBy(year(col("date")).as("yr"))
      .agg(count(lit(1)).as("n_pixels"),
        countDistinct("time").as("n_scenes"),
        r6(avg("ndvi_c")).as("ndvi_mean"))
      .orderBy("yr")
  }

  val qualityFilterAppliedSql: String = Pixels.withPixels(
    s"""WITH kept AS (
       |  SELECT time FROM ($sceneSqlBody)
       |  WHERE 100.0 * n_valid / n_total >= 40.0
       |)
       |SELECT CAST(year(date) AS INT) AS yr,
       |  count(*) AS n_pixels,
       |  count(DISTINCT p.time) AS n_scenes,
       |  0.0 + round(avg(${Pixels.Sql0.ndviClipped}), 6) AS ndvi_mean
       |FROM pixels p
       |WHERE EXISTS (SELECT 1 FROM kept k WHERE k.time = p.time)
       |GROUP BY year(date)
       |ORDER BY yr""".stripMargin)

  /** Stricter non-default QcConfig: every threshold differs from the
    * defaults, exercising the cfg-parameterized path end-to-end (the
    * Scala predicates and the oracle fragments are generated from the
    * SAME case class, so a threshold change cannot desynchronize them). */
  val StrictQc: Indices.QcConfig = Indices.QcConfig(
    reflectanceLow = 200.0,
    reflectanceHigh = 9000.0,
    blueHaze = 1200.0,
    ndviMin = -0.3,
    ndviMax = 0.9,
    maxContaminationPct = 65.0,
    minValidPct = 20.0)

  /** Granule QC gate under [[StrictQc]] — q01/q02 semantics with every
    * threshold overridden from one config value. */
  val customQcGateQ: Q = (s, d) =>
    qcOut(granuleQc(s, d, StrictQc)
        .filter(col("contamination_pct") <= StrictQc.maxContaminationPct &&
          col("valid_pct") >= StrictQc.minValidPct))
      .orderBy("tile_id", "granule_ts")

  private def qcSqlBodyFor(f: Pixels.Sql): String =
    s"""SELECT tile_id, time, count(*) AS total,
       |  CAST(sum(CASE WHEN ${f.combinedMask} THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       |  0.0 + round(100.0 * sum(CASE WHEN NOT ${f.combinedMask} THEN 1 ELSE 0 END) / count(*), 6) AS valid_pct,
       |  0.0 + round(100.0 * (sum(CASE WHEN coalesce(${f.haze}, false) THEN 1 ELSE 0 END)
       |    + sum(CASE WHEN coalesce(${f.anomalyLow} OR ${f.anomalyHigh}, false) THEN 1 ELSE 0 END)
       |    + sum(CASE WHEN coalesce(${f.invalidNdvi}, false) THEN 1 ELSE 0 END)) / count(*), 6) AS contamination_pct
       |FROM pixels GROUP BY tile_id, time""".stripMargin

  val customQcGateSql: String = Pixels.withPixels(
    s"""SELECT tile_id, strftime(time, '%Y-%m-%d %H:%M:%S') AS granule_ts,
       |  total, n_masked, valid_pct, contamination_pct
       |FROM (${qcSqlBodyFor(Pixels.Sql(StrictQc))})
       |WHERE contamination_pct <= ${StrictQc.maxContaminationPct}
       |  AND valid_pct >= ${StrictQc.minValidPct}
       |ORDER BY tile_id, granule_ts""".stripMargin)

  val queries: Map[String, Q] = Map(
    "q01_granule_qc" -> granuleQcQ,
    "q02_granule_gate" -> granuleGateQ,
    "q03_scene_stats" -> sceneStatsQ,
    "q04_quality_neighbor" -> qualityNeighborQ,
    "q05_quality_filter_applied" -> qualityFilterAppliedQ,
    "q06_custom_qc_gate" -> customQcGateQ)

  val oracle: Map[String, String] = Map(
    "q01_granule_qc" -> granuleQcSql,
    "q02_granule_gate" -> granuleGateSql,
    "q03_scene_stats" -> sceneStatsSql,
    "q04_quality_neighbor" -> qualityNeighborSql,
    "q05_quality_filter_applied" -> qualityFilterAppliedSql,
    "q06_custom_qc_gate" -> customQcGateSql)
}
