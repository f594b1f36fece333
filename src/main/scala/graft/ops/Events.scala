package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Num._

/** Time-series analytics over the events stream table (SURVEY.md §2.7:
  * win_diff_prev / win_recovery_next / win_abrupt_drop /
  * win_sustained_change, plus ext_event_sessionize; reference
  * quality.py:105-181). The per-day mean of `value` stands in for the
  * scene-mean NDVI series (FIXTURES.md §A), with thresholds scaled to
  * this data (reference thresholds at settings.py:24-26 are NDVI-scale).
  *
  * Scale posture: the day-series windows run over one row per day —
  * microscopic regardless of event volume; the only big shuffle is the
  * initial day aggregation (map-side combined). Sessionization partitions
  * by user_id, so its window parallelizes across users and never needs a
  * global sort.
  */
object Events {

  type Q = (SparkSession, String) => DataFrame

  /** Scaled event-detection thresholds (reference settings.py:24-26). */
  val DropThreshold = -3.0      // reference: -0.3 on NDVI scale
  val RecoveryThreshold = 2.0   // reference: 0.2
  val SustainedLow = 49.7       // reference: 0.3
  val SustainedPrior = 50.0     // reference: 0.5

  /** Per-day scene series: mean/std/count of value (agg_same_day_merge +
    * agg_scene_stats shape over the stream table). */
  def dayStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        avg("value").as("vmean"),
        stddev_pop(col("value")).as("vstd"),
        count(lit(1)).as("n_events"))

  private val daySqlBody: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  avg(value) AS vmean,
      |  stddev_pop(value) AS vstd,
      |  count(*) AS n_events
      |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin

  val sceneSeriesQ: Q = (s, d) =>
    dayStats(s, d)
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        r6(col("vmean")).as("vmean"),
        r6(col("vstd")).as("vstd"),
        col("n_events"))
      .orderBy("day")

  val sceneSeriesSql: String =
    s"""SELECT strftime(day, '%Y-%m-%d') AS day,
       |  0.0 + round(vmean, 6) AS vmean,
       |  0.0 + round(vstd, 6) AS vstd,
       |  n_events
       |FROM ($daySqlBody)
       |ORDER BY day""".stripMargin

  /** diff vs previous scene and recovery vs next — quality.py:124-129. */
  val winDiffQ: Q = (s, d) => {
    val w = Window.orderBy("day")
    dayStats(s, d)
      .withColumn("diff", col("vmean") - lag(col("vmean"), 1).over(w))
      .withColumn("recovery", lead(col("vmean"), 1).over(w) - col("vmean"))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        r6(col("vmean")).as("vmean"),
        r6(col("diff")).as("diff"),
        r6(col("recovery")).as("recovery"))
      .orderBy("day")
  }

  val winDiffSql: String =
    s"""SELECT strftime(day, '%Y-%m-%d') AS day,
       |  0.0 + round(vmean, 6) AS vmean,
       |  0.0 + round(vmean - lag(vmean) OVER (ORDER BY day), 6) AS diff,
       |  0.0 + round(lead(vmean) OVER (ORDER BY day) - vmean, 6) AS recovery
       |FROM ($daySqlBody)
       |ORDER BY day""".stripMargin

  /** Abrupt-drop detection + classification — quality.py:127-154: drop
    * events classified transient_anomaly (recovers), recent_event (last
    * scene, no next), else possible_fire_or_harvest. Takes any day-series
    * relation (day, vmean) so the window semantics are testable on
    * hand-authored fixtures (FIXTURES.md §B2). */
  def detectDrops(series: DataFrame,
      dropThreshold: Double = DropThreshold,
      recoveryThreshold: Double = RecoveryThreshold): DataFrame = {
    val w = Window.orderBy("day")
    series
      .withColumn("prev_mean", lag(col("vmean"), 1).over(w))
      .withColumn("next_mean", lead(col("vmean"), 1).over(w))
      .withColumn("diff", col("vmean") - col("prev_mean"))
      .withColumn("recovery", col("next_mean") - col("vmean"))
      .filter(col("diff") < dropThreshold)
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("date"),
        r6(col("prev_mean")).as("value_before"),
        r6(col("vmean")).as("value_during"),
        r6(col("next_mean")).as("value_after"),
        r6(col("diff")).as("drop"),
        when(col("next_mean").isNull, lit("recent_event"))
          .when(col("recovery") > recoveryThreshold, lit("transient_anomaly"))
          .otherwise(lit("possible_fire_or_harvest")).as("type"))
      .orderBy("date")
  }

  def abruptDrops(s: SparkSession, d: String): DataFrame =
    detectDrops(dayStats(s, d))

  val abruptDropsQ: Q = (s, d) => abruptDrops(s, d)

  val abruptDropsSql: String =
    s"""SELECT strftime(day, '%Y-%m-%d') AS date,
       |  0.0 + round(prev_mean, 6) AS value_before,
       |  0.0 + round(vmean, 6) AS value_during,
       |  0.0 + round(next_mean, 6) AS value_after,
       |  0.0 + round(vmean - prev_mean, 6) AS drop,
       |  CASE WHEN next_mean IS NULL THEN 'recent_event'
       |       WHEN next_mean - vmean > $RecoveryThreshold THEN 'transient_anomaly'
       |       ELSE 'possible_fire_or_harvest' END AS type
       |FROM (
       |  SELECT day, vmean,
       |    lag(vmean) OVER (ORDER BY day) AS prev_mean,
       |    lead(vmean) OVER (ORDER BY day) AS next_mean
       |  FROM ($daySqlBody))
       |WHERE vmean - prev_mean < $DropThreshold
       |ORDER BY date""".stripMargin

  /** Sustained change — quality.py:156-165: 3 consecutive scenes below
    * the low bar, preceded (3 back) by a healthy scene; reports the
    * window's start/end and mean. */
  val sustainedChangeQ: Q = (s, d) => {
    val w = Window.orderBy("day")
    val w3 = w.rowsBetween(-2, 0)
    dayStats(s, d)
      .withColumn("w3_max", max(col("vmean")).over(w3))
      .withColumn("w3_mean", avg(col("vmean")).over(w3))
      .withColumn("prior", lag(col("vmean"), 3).over(w))
      .withColumn("start_day", lag(col("day"), 2).over(w))
      .filter(col("w3_max") < SustainedLow && col("prior") > SustainedPrior)
      .select(
        date_format(col("start_day"), "yyyy-MM-dd").as("start_date"),
        date_format(col("day"), "yyyy-MM-dd").as("end_date"),
        r6(col("w3_mean")).as("window_mean"),
        r6(col("prior")).as("prior_value"))
      .orderBy("end_date")
  }

  val sustainedChangeSql: String =
    s"""SELECT strftime(start_day, '%Y-%m-%d') AS start_date,
       |  strftime(day, '%Y-%m-%d') AS end_date,
       |  0.0 + round(w3_mean, 6) AS window_mean,
       |  0.0 + round(prior, 6) AS prior_value
       |FROM (
       |  SELECT day,
       |    max(vmean) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w3_max,
       |    avg(vmean) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w3_mean,
       |    lag(vmean, 3) OVER (ORDER BY day) AS prior,
       |    lag(day, 2) OVER (ORDER BY day) AS start_day
       |  FROM ($daySqlBody))
       |WHERE w3_max < $SustainedLow AND prior > $SustainedPrior
       |ORDER BY end_date""".stripMargin

  /** Gap-based sessionization (ext_event_sessionize): a new session starts
    * after a >30 min silence per user; sessions aggregate count, span and
    * value sum. Runs on the raw microsecond timeline, partitioned by
    * user — embarrassingly parallel across users at any scale. */
  val sessionizeQ: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("us"),
        col("event_id"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L, 1L)
          .when(lag(col("us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("us").as("start_us"),
        max("us").as("end_us"),
        xsum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    s"""SELECT user_id, session_id, count(*) AS n_events,
       |  min(us) AS start_us, max(us) AS end_us,
       |  ${xsumSql("value")} AS sum_value
       |FROM (
       |  SELECT user_id, us, value,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM (
       |    SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, value,
       |      CASE WHEN lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) IS NULL THEN 1
       |           WHEN epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) > 1800000000 THEN 1
       |           ELSE 0 END AS new_sess
       |    FROM events))
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** Rolling statistics with BOTH frame kinds over the day series: a
    * 7-row ROWS frame (last 7 observations) and a 7-day RANGE frame over
    * the epoch-day ordering (true calendar week — differs from the ROWS
    * frame exactly when days are missing). The series is one row per day,
    * so the unpartitioned window is microscopic at any event volume. */
  val rollingStatsQ: Q = (s, d) => {
    val wRows = Window.orderBy("day_num").rowsBetween(-6, 0)
    val wRange = Window.orderBy("day_num").rangeBetween(-6, 0)
    dayStats(s, d)
      .withColumn("day_num", datediff(col("day"), lit("2024-01-01").cast("date")))
      .withColumn("ma7_rows", avg(col("vmean")).over(wRows))
      .withColumn("ma7_cal", avg(col("vmean")).over(wRange))
      .withColumn("roll_min", min(col("vmean")).over(wRows))
      .withColumn("roll_max", max(col("vmean")).over(wRows))
      .withColumn("n_in_week", count(lit(1)).over(wRange))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        r6(col("vmean")).as("vmean"),
        r6(col("ma7_rows")).as("ma7_rows"),
        r6(col("ma7_cal")).as("ma7_cal"),
        r6(col("roll_min")).as("roll_min"),
        r6(col("roll_max")).as("roll_max"),
        col("n_in_week"))
      .orderBy("day")
  }

  val rollingStatsSql: String =
    s"""SELECT strftime(day, '%Y-%m-%d') AS day,
       |  0.0 + round(vmean, 6) AS vmean,
       |  0.0 + round(avg(vmean) OVER (ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7_rows,
       |  0.0 + round(avg(vmean) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7_cal,
       |  0.0 + round(min(vmean) OVER (ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_min,
       |  0.0 + round(max(vmean) OVER (ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_max,
       |  count(*) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_in_week
       |FROM (
       |  SELECT day, vmean,
       |    CAST(day - DATE '2024-01-01' AS INT) AS day_num
       |  FROM ($daySqlBody))
       |ORDER BY day""".stripMargin

  /** Calendar gap-fill + last-observation-carried-forward: the quality
    * filter drops low scenes (vmean below a bar), the dense calendar is
    * rebuilt with `sequence(min, max, 1 day)`, and dropped days are
    * filled from the last kept scene — the filter→merge→export lifecycle
    * (pipeline.py:156-176) when a sink wants a gapless series. The
    * calendar explode is one row per day and the LOCF window one pass. */
  val gapfillLocfQ: Q = (s, d) => {
    val kept = dayStats(s, d).filter(col("vmean") >= 48.0)
      .select(col("day"), col("vmean"))
    val cal = kept.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(kept, Seq("day"), "left")
      .withColumn("v_filled", last(col("vmean"), ignoreNulls = true).over(w))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        r6(col("vmean")).as("vmean_kept"),
        r6(col("v_filled")).as("v_filled"),
        col("vmean").isNull.as("is_gap"))
      .orderBy("day")
  }

  val gapfillLocfSql: String =
    s"""WITH ds AS (
       |  SELECT day, vmean FROM ($daySqlBody) WHERE vmean >= 48.0
       |), b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ds
       |), cal AS (
       |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM b
       |), j AS (SELECT cal.day, ds.vmean FROM cal LEFT JOIN ds ON cal.day = ds.day)
       |SELECT strftime(day, '%Y-%m-%d') AS day,
       |  0.0 + round(vmean, 6) AS vmean_kept,
       |  0.0 + round(last_value(vmean IGNORE NULLS) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled,
       |  vmean IS NULL AS is_gap
       |FROM j
       |ORDER BY day""".stripMargin

  /** Calendar gap-fill by LINEAR interpolation — the xarray
    * `interpolate_na` analog beside e07's LOCF: each gap day takes
    * `prev + (next − prev) · frac` between its nearest kept neighbors,
    * weighted by calendar distance; leading/trailing gaps fall back to
    * nearest-observation. The interpolation expression is spelled as
    * the identical IEEE tree in both engines (one subtraction, one
    * division, one multiply-add — no transcendentals), so the hash
    * compare is exact. Same microscopic-window posture as e06/e07: the
    * series is one row per day. */
  val gapfillInterpQ: Q = (s, d) => {
    val kept = dayStats(s, d).filter(col("vmean") >= 48.0)
      .select(col("day"), col("vmean"))
    val cal = kept.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wB = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val frac = datediff(col("day"), col("prev_d")).cast("double") /
      datediff(col("next_d"), col("prev_d")).cast("double")
    cal.join(kept, Seq("day"), "left")
      .withColumn("prev_v", last(col("vmean"), ignoreNulls = true).over(wB))
      .withColumn("prev_d",
        last(when(col("vmean").isNotNull, col("day")), ignoreNulls = true).over(wB))
      .withColumn("next_v", first(col("vmean"), ignoreNulls = true).over(wF))
      .withColumn("next_d",
        first(when(col("vmean").isNotNull, col("day")), ignoreNulls = true).over(wF))
      .withColumn("v_interp",
        when(col("vmean").isNotNull, col("vmean"))
          .when(col("prev_v").isNull, col("next_v"))
          .when(col("next_v").isNull, col("prev_v"))
          .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) * frac))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        r6(col("vmean")).as("vmean_kept"),
        r6(col("v_interp")).as("v_interp"),
        col("vmean").isNull.as("is_gap"))
      .orderBy("day")
  }

  val gapfillInterpSql: String =
    s"""WITH ds AS (
       |  SELECT day, vmean FROM ($daySqlBody) WHERE vmean >= 48.0
       |), b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ds
       |), cal AS (
       |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM b
       |), j AS (SELECT cal.day, ds.vmean FROM cal LEFT JOIN ds ON cal.day = ds.day
       |), n AS (
       |  SELECT day, vmean,
       |    last_value(vmean IGNORE NULLS) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
       |    last_value(CASE WHEN vmean IS NOT NULL THEN day END IGNORE NULLS)
       |      OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
       |    first_value(vmean IGNORE NULLS) OVER (ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
       |    first_value(CASE WHEN vmean IS NOT NULL THEN day END IGNORE NULLS)
       |      OVER (ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
       |  FROM j
       |)
       |SELECT strftime(day, '%Y-%m-%d') AS day,
       |  0.0 + round(vmean, 6) AS vmean_kept,
       |  0.0 + round(CASE
       |    WHEN vmean IS NOT NULL THEN vmean
       |    WHEN prev_v IS NULL THEN next_v
       |    WHEN next_v IS NULL THEN prev_v
       |    ELSE prev_v + (next_v - prev_v) *
       |      (CAST(day - prev_d AS DOUBLE) / CAST(next_d - prev_d AS DOUBLE))
       |  END, 6) AS v_interp,
       |  vmean IS NULL AS is_gap
       |FROM n
       |ORDER BY day""".stripMargin

  val queries: Map[String, Q] = Map(
    "e08_gapfill_interp" -> gapfillInterpQ,
    "e01_scene_series" -> sceneSeriesQ,
    "e02_win_diff" -> winDiffQ,
    "e03_abrupt_drops" -> abruptDropsQ,
    "e04_sustained_change" -> sustainedChangeQ,
    "e05_sessionize" -> sessionizeQ,
    "e06_rolling_stats" -> rollingStatsQ,
    "e07_gapfill_locf" -> gapfillLocfQ)

  val oracle: Map[String, String] = Map(
    "e08_gapfill_interp" -> gapfillInterpSql,
    "e01_scene_series" -> sceneSeriesSql,
    "e02_win_diff" -> winDiffSql,
    "e03_abrupt_drops" -> abruptDropsSql,
    "e04_sustained_change" -> sustainedChangeSql,
    "e05_sessionize" -> sessionizeSql,
    "e06_rolling_stats" -> rollingStatsSql,
    "e07_gapfill_locf" -> gapfillLocfSql)
}
