package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{DropEvent, SceneMean}

/** Structured Streaming semantics (SURVEY.md §2.10): watermarked windowed
  * scene means and the stateful drop detector across triggers. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed scene means aggregate per day window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "seriesId", "value")
    val q = StreamOps.windowedSceneMeans(events)
      .writeStream.format("memory").queryName("scene_means")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 01:00:00"), 1L, 10.0),
        (ts("2024-01-01 13:00:00"), 1L, 20.0),
        (ts("2024-01-02 01:00:00"), 1L, 30.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the first windows
      input.addData((ts("2024-01-10 00:00:00"), 1L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("scene_means")
        .select(date_format(col("day"), "yyyy-MM-dd"), col("vmean"), col("n_events"))
        .as[(String, Double, Long)].collect().toSet
      assert(rows.contains(("2024-01-01", 15.0, 2L)))
      assert(rows.contains(("2024-01-02", 30.0, 1L)))
    } finally q.stop()
  }

  test("stream-static join enriches events against a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "seriesId", "value")
    val dim = Seq((1L, "forest"), (2L, "crop")).toDF("seriesId", "landcover")
    val q = StreamOps.enrichWithStatic(events, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:01:00"), 3L, 2.0)) // no dim row -> NULL landcover
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select(col("seriesId"), col("landcover")).as[(Long, Option[String])]
        .collect().toSet
      assert(rows == Set((1L, Some("forest")), (3L, None)))
    } finally q.stop()
  }

  test("session windows merge within the gap and split across it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "userId", "value")
    val q = StreamOps.sessionWindows(events, gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),  // session A
        (ts("2024-01-01 10:20:00"), 1L, 2.0),  // merges into A (gap 20m)
        (ts("2024-01-01 11:30:00"), 1L, 4.0))  // new session B (gap 70m)
      q.processAllAvailable()
      // push the watermark past both sessions so append emits them
      input.addData((ts("2024-01-02 00:00:00"), 1L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select(date_format(col("session_start"), "HH:mm"), col("n_events"), col("sum_value"))
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("10:00", 2L, 3.0)), s"merged session missing: $rows")
      assert(rows.contains(("11:30", 1L, 4.0)), s"split session missing: $rows")
    } finally q.stop()
  }

  test("stateful drop detector remembers the previous scene across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SceneMean]
    val q = StreamOps.detectDropsStateful(input.toDS(), dropThreshold = -3.0)
      .writeStream.format("memory").queryName("drops")
      .outputMode(OutputMode.Append).start()
    try {
      // trigger 1: baseline scene
      input.addData(SceneMean(7L, ts("2024-01-01 00:00:00"), 50.0))
      q.processAllAvailable()
      assert(spark.table("drops").count() == 0)
      // trigger 2: drop arrives in a later trigger — needs state to fire
      input.addData(SceneMean(7L, ts("2024-01-02 00:00:00"), 44.0))
      q.processAllAvailable()
      val got = spark.table("drops").as[DropEvent].collect().toSeq
      assert(got == Seq(DropEvent(7L, ts("2024-01-02 00:00:00"), 50.0, 44.0, -6.0)))
      // trigger 3: small dip below threshold magnitude — no event
      input.addData(SceneMean(7L, ts("2024-01-03 00:00:00"), 43.0))
      q.processAllAvailable()
      assert(spark.table("drops").count() == 1)
    } finally q.stop()
  }

  test("checkpointed detector state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toFile.getAbsolutePath
    val input = MemoryStream[SceneMean]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[DropEvent]()
    // memory sink can't recover from a checkpoint; foreachBatch can
    def start() = StreamOps.detectDropsStateful(input.toDS(), dropThreshold = -3.0)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DropEvent], _: Long) =>
        batch.collect().foreach(sink.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    // run 1: establish per-series state, then stop
    val q1 = start()
    input.addData(SceneMean(9L, ts("2024-01-01 00:00:00"), 50.0))
    q1.processAllAvailable()
    q1.stop()
    assert(sink.isEmpty)
    // run 2: same checkpoint — the drop must fire against the state
    // recovered from run 1, not a cold start (exactly-once resume,
    // SURVEY §2.10: the streaming analog of the granule cache skip)
    val q2 = start()
    try {
      input.addData(SceneMean(9L, ts("2024-01-02 00:00:00"), 44.0))
      q2.processAllAvailable()
      val got = sink.toArray(Array.empty[DropEvent]).toSeq
      assert(got == Seq(DropEvent(9L, ts("2024-01-02 00:00:00"), 50.0, 44.0, -6.0)),
        s"state was not recovered across restart: $got")
    } finally q2.stop()
  }

  test("full file-stream DAG (ingest→QC→merge→detect) resumes exactly-once after a kill") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("dag").toFile.getAbsolutePath
    val rawDir = s"$base/raw"; val meansDir = s"$base/means"
    val ckptA = s"$base/ckptA"; val ckptB = s"$base/ckptB"
    val rawSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("seriesId", LongType),
      StructField("value", DoubleType), StructField("qcFlag", IntegerType)))
    val meansSchema = StructType(Seq(
      StructField("seriesId", LongType), StructField("day", TimestampType),
      StructField("vmean", DoubleType)))
    def writeRaw(rows: Seq[(Timestamp, Long, Double, Int)]): Unit =
      rows.toDF("ts", "seriesId", "value", "qcFlag")
        .coalesce(1).write.mode("append").parquet(rawDir)
    // stage A: file-source ingest → QC gate + same-day merge → exactly-once
    // parquet sink (its manifest is what lets stage B read only committed files)
    def startA() = StreamOps.qcSceneMeans(
        spark.readStream.schema(rawSchema).parquet(rawDir))
      .writeStream.format("parquet").option("path", meansDir)
      .option("checkpointLocation", ckptA)
      .outputMode(OutputMode.Append).start()
    // stage B: scene-mean stream → stateful drop detector → event sink
    val events = new java.util.concurrent.ConcurrentLinkedQueue[DropEvent]()
    def startB() = StreamOps.detectDropsStateful(
        spark.readStream.schema(meansSchema).parquet(meansDir).as[SceneMean],
        dropThreshold = -3.0)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DropEvent], _: Long) =>
        batch.collect().foreach(events.add)
      }
      .option("checkpointLocation", ckptB)
      .outputMode(OutputMode.Append).start()

    // ---- run 1: Jan1 (clear, 50), Jan2 (clear, 44 → drop), Jan3 (mostly
    // cloudy → must be GATED, else its mean 10 would fake a -34 drop),
    // Jan5 partial data (42; the window stays open at watermark Jan3)
    writeRaw(Seq(
      (ts("2024-01-01 10:00:00"), 7L, 50.0, 0),
      (ts("2024-01-01 11:00:00"), 7L, 50.0, 0),
      (ts("2024-01-01 12:00:00"), 7L, 0.0, 1),  // cloudy obs: excluded from mean
      (ts("2024-01-02 10:00:00"), 7L, 44.0, 0),
      (ts("2024-01-02 11:00:00"), 7L, 44.0, 0),
      (ts("2024-01-03 10:00:00"), 7L, 10.0, 0), // 1 valid of 4 → gated
      (ts("2024-01-03 11:00:00"), 7L, 0.0, 1),
      (ts("2024-01-03 12:00:00"), 7L, 0.0, 1),
      (ts("2024-01-03 13:00:00"), 7L, 0.0, 1),
      (ts("2024-01-05 10:00:00"), 7L, 42.0, 0)))
    val a1 = startA(); a1.processAllAvailable()
    val b1 = startB(); b1.processAllAvailable()
    a1.stop(); b1.stop() // kill both queries mid-stream
    assert(events.toArray(Array.empty[DropEvent]).toSeq ==
      Seq(DropEvent(7L, ts("2024-01-02 00:00:00"), 50.0, 44.0, -6.0)),
      s"run 1 should see exactly the Jan2 drop, got $events")

    // ---- run 2 (same checkpoints): more Jan5 data merges into the window
    // state recovered in stage A (mean 40 over BOTH runs' rows), Jan9
    // advances the watermark so Jan5 closes → second drop via the detector
    // state recovered in stage B (prev = Jan2's 44, skipping gated Jan3)
    writeRaw(Seq(
      (ts("2024-01-05 12:00:00"), 7L, 38.0, 0),
      (ts("2024-01-09 10:00:00"), 7L, 46.0, 0)))
    val a2 = startA(); a2.processAllAvailable()
    val b2 = startB(); b2.processAllAvailable()
    a2.stop(); b2.stop()
    val got = events.toArray(Array.empty[DropEvent]).toSeq.sortBy(_.day.getTime)
    assert(got == Seq(
      DropEvent(7L, ts("2024-01-02 00:00:00"), 50.0, 44.0, -6.0),
      DropEvent(7L, ts("2024-01-05 00:00:00"), 44.0, 40.0, -4.0)),
      s"resume lost or duplicated state: $got")
  }

  test("document-ingest curation dedups by content across a kill, gates short docs") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("curate").toFile.getAbsolutePath
    val rawDir = s"$base/raw"; val outDir = s"$base/curated"; val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("ingest_ts", TimestampType), StructField("doc_id", LongType),
      StructField("text", StringType)))
    def writeRaw(rows: Seq[(Timestamp, Long, String)]): Unit =
      rows.toDF("ingest_ts", "doc_id", "text")
        .coalesce(1).write.mode("append").parquet(rawDir)
    def start() = StreamOps.curateDocs(
        spark.readStream.schema(schema).parquet(rawDir))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val longA = "a clean document with plenty of characters in it"
    val longB = "another clean document with plenty of characters"
    // run 1: a dup pair (same text, different ids), one short doc
    writeRaw(Seq(
      (ts("2024-01-01 10:00:00"), 1L, longA),
      (ts("2024-01-01 10:00:30"), 2L, longA),  // content dup of 1
      (ts("2024-01-01 10:01:00"), 3L, "too short")))
    val q1 = start(); q1.processAllAvailable()
    // the quality gate runs BEFORE the watermark dedup, so the short
    // doc never inserts dedup state: exactly ONE content hash (longA,
    // covering docs 1+2) is stored — not two
    val stateRows = q1.recentProgress
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal)
    assert(stateRows.nonEmpty && stateRows.max == 1L,
      s"short doc leaked into the dedup state store: $stateRows")
    q1.stop() // kill mid-stream
    val run1 = spark.read.schema(schema).parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(run1 == Set(1L), s"run 1 should keep only doc 1, got $run1")
    // run 2 (same checkpoint): the crawler REDELIVERS doc 1's content
    // inside the watermark horizon and ships one genuinely new doc — the
    // recovered hash state must drop the replay, not re-emit it
    writeRaw(Seq(
      (ts("2024-01-01 10:20:00"), 9L, longA),  // replay across restart
      (ts("2024-01-01 10:21:00"), 4L, longB)))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val run2 = spark.read.schema(schema).parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(run2 == Set(1L, 4L),
      s"resume re-emitted a replayed document or lost a new one: $run2")
  }

  test("curated stream maintains the signature table incrementally per micro-batch") {
    // the production wiring of the incremental dedup index: each curated
    // micro-batch appends to the corpus table AND to the signature
    // artifact (TextOps.appendToSigIndex) — historic signature files
    // carry over untouched, only the batch hashes
    implicit val sqlCtx = spark.sqlContext
    val ds = java.nio.file.Files.createTempDirectory("graft-stream-sig").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val curated = StreamOps.curateDocs(
      input.toDF().toDF("doc_id", "ingest_ts", "text"))
    val q = curated.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val docs = batch.select(col("doc_id"), col("text"),
          lit("en").as("lang"), lit("srcS").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        if (!docs.isEmpty) {
          docs.write.mode("append").parquet(s"$ds/documents.parquet")
          graft.ops.TextOps.appendToSigIndex(spark, ds, docs)
        }
        ()
      }
      .start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha bravo charlie delta echo foxtrot one"),
        (2L, ts("2024-01-01 10:00:10"), "golf hotel india juliet kilo lima mike two"))
      q.processAllAvailable()
      val afterB1 = graft.ops.TextOps.sigIndex(spark, ds).inputFiles
        .map(_.split('/').last).toSet
      assert(afterB1.nonEmpty, "first batch did not build the signature table")
      input.addData(
        (3L, ts("2024-01-01 10:05:00"), "november oscar papa quebec romeo sierra three"))
      q.processAllAvailable()
      val afterB2 = graft.ops.TextOps.sigIndex(spark, ds).inputFiles
        .map(_.split('/').last).toSet
      assert(afterB1.subsetOf(afterB2) && afterB2.size > afterB1.size,
        s"batch 2 was not an incremental append: $afterB1 vs $afterB2")
      // the maintained table equals a from-scratch build over the full corpus
      val inc = graft.ops.TextOps.sigIndex(spark, ds)
        .orderBy("doc_id").collect()
      graft.ops.TextOps.clearSigCache()
      graft.ops.Warehouse.invalidate("sig", ds)
      val full = graft.ops.TextOps.sigIndex(spark, ds)
        .orderBy("doc_id").collect()
      assert(inc.sameElements(full),
        "stream-maintained signatures drifted from a full rebuild")
    } finally {
      q.stop()
      graft.ops.Warehouse.invalidateDataset(ds)
    }
  }

  test("curated stream maintains the whole text manifest chain (sig -> textdup -> funnel) per micro-batch") {
    // the full streamed curation posture: each micro-batch appends to
    // the corpus and drives all three incremental updaters in
    // dependency order, so every artifact the dedup/funnel queries
    // serve from is stream-maintained; the chain must equal a
    // from-scratch build at the final corpus version
    implicit val sqlCtx = spark.sqlContext
    val ds = java.nio.file.Files.createTempDirectory("graft-stream-chain").toString
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base.write.parquet(s"$ds/documents.parquet")
    graft.ops.TextOps.clearSigCache()
    graft.ops.TextOps.clearTextDupCache()
    graft.ops.TextOps.clearFunnelCache()
    graft.ops.TextOps.buildFunnel(spark, ds)
    // stream rows reference a source doc: copy=true ships its exact
    // text (a cross-batch near-dup pair + exact-dedup drop), else a
    // perturbed unique text
    val input = MemoryStream[(Long, Long, Boolean)]
    val q = input.toDF().toDF("doc_id", "src_id", "copy")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val docs = batch.join(
            base.select(col("doc_id").as("src_id"), col("text"),
              col("lang"), col("source"), col("n_chars")), "src_id")
          .select(col("doc_id"),
            when(col("copy"), col("text"))
              .otherwise(concat(col("text"), lit(" zq"), col("doc_id"))).as("text"),
            col("lang"), col("source"), col("n_chars"))
        if (!docs.isEmpty) {
          docs.write.mode("append").parquet(s"$ds/documents.parquet")
          graft.ops.TextOps.appendToSigIndex(spark, ds, docs)
          graft.ops.TextOps.appendToTextDup(spark, ds, docs)
          graft.ops.TextOps.appendToFunnel(spark, ds, docs)
        }
        ()
      }
      .start()
    try {
      input.addData((1003L, 3L, true), (1300L, 100L, false))
      q.processAllAvailable()
      input.addData((1017L, 17L, true), (1301L, 101L, false))
      q.processAllAvailable()
      def snap() = (
        graft.ops.TextOps.dedupMinhash(spark, ds).collect(),
        graft.ops.TextOps.dedupComponents(spark, ds).collect(),
        graft.ops.TextOps.funnelIndex(spark, ds)
          .orderBy("stage", "doc_id").collect())
      val (p1, c1, f1) = snap()
      // copies surfaced as pairs across batches; copies lost stage 1
      for (id <- Seq(3L, 17L))
        assert(p1.exists(r => r.getLong(0) == id && r.getLong(1) == id + 1000L),
          s"streamed copy pair ($id, ${id + 1000L}) missing")
      val k1 = f1.filter(_.getString(0) == "01_exact_dedup").map(_.getLong(1)).toSet
      assert(!k1.contains(1003L) && !k1.contains(1017L),
        "streamed exact copies survived stage 1")
      assert(k1.contains(1300L) && k1.contains(1301L),
        "streamed fresh docs lost stage 1")
      // the stream-maintained chain equals a from-scratch build
      graft.ops.TextOps.clearSigCache()
      graft.ops.TextOps.clearTextDupCache()
      graft.ops.TextOps.clearFunnelCache()
      graft.ops.Warehouse.invalidate("sig", ds)
      graft.ops.Warehouse.invalidate("textdup", ds)
      graft.ops.Warehouse.invalidate("funnel", ds)
      val (p2, c2, f2) = snap()
      assert(p1.sameElements(p2), "stream-maintained pairs drifted")
      assert(c1.sameElements(c2), "stream-maintained components drifted")
      assert(f1.sameElements(f2), "stream-maintained funnel drifted")
    } finally {
      q.stop()
      graft.ops.Warehouse.invalidateDataset(ds)
    }
  }

  test("curated stream maintains the near-dup pair manifest incrementally per micro-batch") {
    // the embedding analog of the signature wiring above (r9, VERDICT
    // #3): each micro-batch appends to the embedding corpus AND drives
    // SimOps.appendToNearDup, so the pair manifest v06/v14 serve from
    // is maintained by the stream, not rebuilt per session
    implicit val sqlCtx = spark.sqlContext
    val ds = java.nio.file.Files.createTempDirectory("graft-stream-nd").toString
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base.write.parquet(s"$ds/embeddings.parquet")
    graft.ops.SimOps.clearNearDupCache()
    graft.ops.SimOps.buildNearDup(spark, ds)
    // stream rows reference a source vector: copies land in the same
    // sign-LSH buckets (guaranteed cross-batch cosine-1 pairs), rev
    // rows are fresh content
    val input = MemoryStream[(Long, Long, Boolean)]
    val q = input.toDF().toDF("vec_id", "src_id", "rev")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val vecs = batch.join(
            base.select(col("vec_id").as("src_id"), col("embedding"),
              col("label")), "src_id")
          .select(col("vec_id"),
            when(col("rev"), reverse(col("embedding")))
              .otherwise(col("embedding")).as("embedding"),
            col("label"))
        if (!vecs.isEmpty) {
          vecs.write.mode("append").parquet(s"$ds/embeddings.parquet")
          graft.ops.SimOps.appendToNearDup(spark, ds, vecs)
        }
        ()
      }
      .start()
    try {
      input.addData((1007L, 7L, false), (1011L, 11L, false))
      q.processAllAvailable()
      input.addData((1013L, 13L, false), (2001L, 401L, true))
      q.processAllAvailable()
      val pairs = graft.ops.SimOps.embedNearDup(spark, ds).collect()
      for (id <- Seq(7L, 11L, 13L))
        assert(pairs.exists(r => r.getLong(0) == id && r.getLong(1) == id + 1000L),
          s"streamed copy pair ($id, ${id + 1000L}) missing")
      val keep = graft.ops.SimOps.embedKeep(spark, ds).collect()
      // equality with a from-scratch build at the streamed corpus version
      graft.ops.SimOps.clearNearDupCache()
      graft.ops.Warehouse.invalidate("neardup", ds)
      assert(graft.ops.SimOps.embedNearDup(spark, ds).collect().sameElements(pairs),
        "stream-maintained pair manifest drifted from a full rebuild")
      assert(graft.ops.SimOps.embedKeep(spark, ds).collect().sameElements(keep),
        "v14 over the streamed manifest drifted from a full rebuild")
    } finally {
      q.stop()
      graft.ops.Warehouse.invalidateDataset(ds)
    }
  }

  test("streamed date-batches maintain the cube + granule cache; p05/p08 == full rebuild") {
    // the pixel-family analog of the text chain above — and the
    // reference's ACTUAL resumable surface (processor.py:342-356 only
    // ever adds new acquisitions): each micro-batch of strictly-newer
    // dates appends to the raw table AND drives appendToCube +
    // appendToGranuleCache, so the artifacts p05/p06/p08 serve from are
    // stream-maintained
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Pipeline
    val ds = java.nio.file.Files.createTempDirectory("graft-stream-px").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cutoff = "1998-06-01"
    li.filter(col("l_shipdate") <= lit(cutoff))
      .write.mode("overwrite").parquet(s"$ds/lineitem.parquet")
    Pipeline.clearCubeCache()
    Pipeline.clearGranuleCacheCache()
    Pipeline.buildCube(spark, ds)
    Pipeline.buildGranuleCache(spark, ds)
    val input = MemoryStream[(String, String)] // (lo, hi] date windows
    val q = input.toDF().toDF("lo", "hi")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach { r =>
          val (lo, hi) = (r.getString(0), r.getString(1))
          li.filter(col("l_shipdate") > lit(lo) && col("l_shipdate") <= lit(hi))
            .write.mode("append").parquet(s"$ds/lineitem.parquet")
          Pipeline.clearCubeCache()
          Pipeline.clearGranuleCacheCache()
          val raw = graft.ops.Pixels.pixels(spark, ds)
            .filter(col("date") > lit(lo) && col("date") <= lit(hi))
          Pipeline.appendToCube(spark, ds, raw)
          Pipeline.appendToGranuleCache(spark, ds, raw)
        }
        ()
      }
      .start()
    try {
      input.addData(("1998-06-01", "1998-09-01"))
      q.processAllAvailable()
      input.addData(("1998-09-01", "1998-12-31"))
      q.processAllAvailable()
      def snap() = (
        Pipeline.cubeIndex(spark, ds)
          .select(col("date"), col("y"), col("x"),
            graft.ops.Num.r6(col("ndvi")).as("ndvi"),
            graft.ops.Num.r6(col("evi")).as("evi"),
            col("num_granules_merged"))
          .orderBy("date", "y", "x").collect(),
        SparkEntry.queries("p05_pipeline_summary")(spark, ds).collect(),
        SparkEntry.queries("p08_pipeline_cached")(spark, ds).collect())
      val (c1, s1, g1) = snap()
      assert(c1.exists(_.getDate(0).toString > "1998-09-01"),
        "second streamed window never reached the cube")
      // the stream-maintained artifacts equal a from-scratch build
      Pipeline.clearCubeCache()
      Pipeline.clearGranuleCacheCache()
      graft.ops.Warehouse.invalidate("cube", ds)
      graft.ops.Warehouse.invalidate("gcache", ds)
      val (c2, s2, g2) = snap()
      assert(c1.sameElements(c2), "stream-maintained cube drifted")
      assert(s1.sameElements(s2), "p05 over the streamed cube drifted")
      assert(g1.sameElements(g2), "p08 over the streamed granule cache drifted")
    } finally {
      q.stop()
      graft.ops.Warehouse.invalidateDataset(ds)
    }
  }

  test("ingest dedup drops replayed observations across triggers, state watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "seriesId", "value")
    val q = StreamOps.dedupEvents(events)
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L, 5.0))
      q.processAllAvailable()
      // the same observation replayed in a LATER trigger (at-least-once
      // upstream) — must be dropped by state, not by in-batch dedup
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 5.0),
        (ts("2024-01-01 11:00:00"), 1L, 6.0))
      q.processAllAvailable()
      val rows = spark.table("deduped")
        .select(date_format(col("ts"), "HH:mm"), col("seriesId"))
        .as[(String, Long)].collect().toSeq.sorted
      assert(rows == Seq(("10:00", 1L), ("11:00", 1L)),
        s"replayed observation not deduped: $rows")
    } finally q.stop()
  }

  test("file-source pacing bounds per-trigger work (the batch_size analog)") {
    // the reference paces its downloader in fixed-size batches
    // (pipeline.py batch_size loop); the file-source analog is
    // maxFilesPerTrigger — each micro-batch ingests a bounded file set
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("pace").toFile.getAbsolutePath
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("seriesId", LongType),
      StructField("value", DoubleType), StructField("qcFlag", IntegerType)))
    for (i <- 1 to 3)
      Seq((ts(s"2024-01-0$i 10:00:00"), 7L, i.toDouble, 0))
        .toDF("ts", "seriesId", "value", "qcFlag")
        .coalesce(1).write.mode("append").parquet(base)
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(base)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.add(batch.count()); ()
      }
      .start()
    try {
      q.processAllAvailable()
      val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).toSeq
      assert(sizes.length == 3, s"expected 3 paced micro-batches, got $sizes")
      assert(sizes.forall(_ == 1L), s"a trigger exceeded the pacing bound: $sizes")
    } finally q.stop()
  }

  test("detector keys state per series — independent series don't interfere") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SceneMean]
    val q = StreamOps.detectDropsStateful(input.toDS(), dropThreshold = -3.0)
      .writeStream.format("memory").queryName("drops2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        SceneMean(1L, ts("2024-01-01 00:00:00"), 50.0),
        SceneMean(2L, ts("2024-01-01 00:00:00"), 10.0))
      q.processAllAvailable()
      input.addData(
        SceneMean(1L, ts("2024-01-02 00:00:00"), 30.0), // drop on series 1
        SceneMean(2L, ts("2024-01-02 00:00:00"), 12.0)) // rise on series 2
      q.processAllAvailable()
      val got = spark.table("drops2").as[DropEvent].collect().toSeq
      assert(got.map(_.seriesId) == Seq(1L))
    } finally q.stop()
  }
}
