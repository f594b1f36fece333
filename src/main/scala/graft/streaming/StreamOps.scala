package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the engine's incremental semantics
  * (SURVEY.md §2.10): the reference is batch-only, but its resumable /
  * out-of-order-tolerant behaviors map onto watermarked windowed
  * aggregation plus one piece of custom state — the scene-series event
  * detector, which needs the previous scene mean per series
  * (quality.py:124-154) and is therefore a flatMapGroupsWithState.
  *
  * Scale posture: state is keyed by series id (AOI/tile), a few doubles
  * per key — state-store size is O(#series), independent of event
  * volume; the windowed aggregation shuffles once on (series, window)
  * with watermark-bounded state eviction.
  */
object StreamOps {

  /** One scene-mean observation (input to the stateful detector). */
  case class SceneMean(seriesId: Long, day: Timestamp, vmean: Double)

  /** Detector state: last seen day + mean per series. */
  case class DropState(lastDayMs: Long, lastMean: Double)

  /** Emitted drop event (streaming cousin of Events.detectDrops rows;
    * `recovery`/classification need the *next* scene, so the streaming
    * form emits on detection and leaves classification to a downstream
    * batch pass — the reference's own recent_event branch acknowledges
    * exactly this "no next scene yet" case, quality.py:147-154). */
  case class DropEvent(seriesId: Long, day: Timestamp,
      valueBefore: Double, valueDuring: Double, drop: Double)

  /** Watermarked per-window scene means over a raw event stream with
    * schema (ts TIMESTAMP, seriesId LONG, value DOUBLE). Late data past
    * the watermark is dropped; state for closed windows is evicted. */
  def windowedSceneMeans(events: DataFrame,
      watermark: String = "2 days", windowLength: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("seriesId"), window(col("ts"), windowLength))
      .agg(avg("value").as("vmean"), count(lit(1)).as("n_events"))
      .select(col("seriesId"), col("window.start").as("day"),
        col("vmean"), col("n_events"))

  /** QC-gated same-day scene means — the streaming fusion of the batch
    * pipeline's ingest → QC gate (agg_granule_qc/gate, quality.py) →
    * same-day merge (merger.py) stages: one watermarked day-window
    * aggregate computes the mean over VALID observations and the valid
    * fraction per (series, day); days under the gate drop out entirely,
    * so the downstream detector never sees a cloudy scene. Input schema
    * (ts TIMESTAMP, seriesId LONG, value DOUBLE, qcFlag INT), qcFlag 0 =
    * clear. Emits [[SceneMean]]-shaped rows in append mode once the
    * watermark closes the day.
    *
    * Chained through a file sink (exactly-once manifest) into
    * [[detectDropsStateful]] this is the full incremental DAG — two
    * stateful stages in separate queries, each independently
    * checkpointed and resumable (StreamingSpec kills and resumes both
    * mid-stream). */
  def qcSceneMeans(raw: DataFrame, minValidFrac: Double = 0.5,
      watermark: String = "2 days", windowLength: String = "1 day"): DataFrame =
    raw
      .withWatermark("ts", watermark)
      .groupBy(col("seriesId"), window(col("ts"), windowLength))
      .agg(
        avg(when(col("qcFlag") === 0, col("value"))).as("vmean"),
        (sum(when(col("qcFlag") === 0, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("valid_frac"))
      .filter(col("valid_frac") >= minValidFrac && col("vmean").isNotNull)
      .select(col("seriesId"), col("window.start").as("day"), col("vmean"))

  /** Watermark-bounded ingest dedup — the streaming face of the cache
    * anti-join (processor.py:342-356 skips already-processed granules):
    * an at-least-once upstream (redelivered files, retried fetches) can
    * replay the same (series, ts) observation across triggers;
    * `dropDuplicatesWithinWatermark` keeps one copy using state that the
    * watermark evicts, so the dedup memory is bounded by the lateness
    * horizon instead of growing with the stream. */
  def dedupEvents(events: DataFrame,
      watermark: String = "2 days", keys: Seq[String] = Seq("seriesId", "ts")): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming document-ingest curation — the LLM-data ingest face of
    * the batch t05/t10 stages: exact content-hash dedup whose state the
    * ingest watermark evicts (an at-least-once crawler redelivers
    * documents; the hash table must not grow with the stream), then the
    * cheap per-row quality gate, yielding an append-only curated feed.
    * Near-dup/decontamination stay batch jobs over the curated table —
    * their corpus-wide joins have no bounded-state streaming form. */
  def curateDocs(docs: DataFrame, watermark: String = "1 hour",
      minChars: Int = 20): DataFrame =
    docs
      // quality gate FIRST: a short document can never be emitted, so
      // filtering before the dedup keeps its copies out of the state
      // store entirely (the output is identical either way — a short
      // doc's duplicates are equally short)
      .filter(length(col("text")) >= minChars)
      .withWatermark("ingest_ts", watermark)
      .withColumn("h", md5(col("text").cast("binary")))
      .dropDuplicatesWithinWatermark("h")
      .select("doc_id", "ingest_ts", "text")

  /** Stream-static enrichment: join each streaming event against a
    * static dimension table (e.g. the granule/tile catalog) — Spark
    * broadcasts or re-reads the static side per micro-batch, no
    * streaming state at all. The streaming face of the engine's
    * broadcast-dimension-join posture. */
  def enrichWithStatic(events: DataFrame, dim: DataFrame,
      key: String = "seriesId"): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Gap-based session windows over a raw event stream — the streaming
    * form of the batch sessionization (ops/Events e05): Spark's native
    * `session_window` merges events within the gap into one growing
    * window per user, watermark-bounded. State per (user, open session)
    * only; closed sessions emit and evict in append mode. */
  def sessionWindows(events: DataFrame,
      gap: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("userId"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("userId"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Stateful abrupt-drop detection: for each series, compare each scene
    * mean against the previous one held in state; emit when the drop
    * exceeds the threshold. Input must be per-trigger scene means (e.g.
    * the output of [[windowedSceneMeans]] in update mode, or a
    * deduplicated upstream). */
  def detectDropsStateful(means: Dataset[SceneMean], dropThreshold: Double)
      : Dataset[DropEvent] = {
    import means.sparkSession.implicits._
    means.groupByKey(_.seriesId)
      .flatMapGroupsWithState[DropState, DropEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (seriesId: Long, rows: Iterator[SceneMean], state: GroupState[DropState]) =>
          val sorted = rows.toSeq.sortBy(_.day.getTime)
          var prev = state.getOption
          val out = Seq.newBuilder[DropEvent]
          sorted.foreach { m =>
            prev match {
              case Some(p) if p.lastDayMs < m.day.getTime =>
                val diff = m.vmean - p.lastMean
                if (diff < dropThreshold)
                  out += DropEvent(seriesId, m.day, p.lastMean, m.vmean, diff)
                prev = Some(DropState(m.day.getTime, m.vmean))
              case Some(p) => // late/duplicate scene — keep newest state
                if (m.day.getTime > p.lastDayMs) prev = Some(DropState(m.day.getTime, m.vmean))
              case None =>
                prev = Some(DropState(m.day.getTime, m.vmean))
            }
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }
}
