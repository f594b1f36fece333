package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan-shape assertions for the 100 TB posture (ENGINE.md):
  * these lock in the plans the engine is designed around, so a refactor
  * that silently de-broadcasts a dimension join, breaks scan pushdown,
  * or drops map-side partial aggregation fails CI — not a perf review.
  *
  * Queries run over sf0.001 (plan shape is scale-invariant; AQE join
  * choices are pinned by explicit broadcast()/hints in the operators,
  * not by size estimates).
  */
class PlanShapeSpec extends SparkSpecBase {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(FormattedMode)

  test("dimension joins broadcast: no sort-merge join in the revenue rollup") {
    val p = plan("r02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join fell back to SMJ:\n$p")
  }

  test("pixel-index scan pushes filters and prunes columns") {
    val p = plan("p01_pixel_indices")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    // tile filter (l_suppkey % 4 = 1) needs the IsNotNull guard at the scan
    assert(p.contains("IsNotNull"), s"expected IsNotNull pushdown in:\n$p")
    // projection needs neither returnflag nor linestatus: pruned ReadSchema
    assert(!p.contains("l_returnflag"), s"unpruned column l_returnflag in:\n$p")
    assert(!p.contains("l_linestatus"), s"unpruned column l_linestatus in:\n$p")
  }

  test("aggregations combine map-side: partial+final HashAggregate around one exchange") {
    val p = plan("q03_scene_stats")
    val nAgg = "HashAggregate".r.findAllIn(p).length
    assert(nAgg >= 2, s"expected partial+final HashAggregate pair in:\n$p")
    assert(p.contains("Exchange"), s"expected a keyed exchange in:\n$p")
  }

  test("native cosine runs in one scan: no exchange below the ranking window") {
    // the pure-native bench variant (the declared v04 entry adds the
    // exact re-rank stage on top; its prune stage shares this shape)
    val p = ops.SimOps.simTopkNative(spark, d)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("graft_cosine"), s"native expression missing from:\n$p")
    // the only exchange allowed is the per-qid window partitioning
    val widx = p.indexOf("Window")
    assert(widx >= 0, s"ranking Window node missing from:\n$p")
    val beforeWindow = p.substring(0, widx)
    // strict `i#<exprId>` pattern: a bare "(i" prefix would also match
    // any column whose name starts with 'i'
    assert(!"hashpartitioning\\(i#\\d".r.findFirstIn(beforeWindow).isDefined,
      s"cosine path shuffled on the flattened index:\n$p")
  }

  test("pipeline analytics sort once: no mid-DAG range exchange under the aggregates") {
    // the cube's chronological orderBy is presentation-only (Result.cube);
    // p05/p06 aggregate from Result.cubeRaw. EliminateSorts does NOT
    // remove a sort under a float avg, so consuming the sorted relation
    // would re-introduce a range-partitioning exchange + global sort of
    // the full merged cube below the groupBy — the single allowed range
    // exchange is each query's final ORDER BY.
    // p06's detector window already collapses the day series to a single
    // partition, so its final sort needs no range exchange at all — the
    // bound is "at most the final one", which the removed regression
    // (a SECOND range exchange below the groupBy) still violates.
    for (q <- Seq("p05_pipeline_summary", "p06_pipeline_events")) {
      val p = plan(q)
      val nRange = "rangepartitioning".r.findAllIn(p).length
      assert(nRange <= 1,
        s"$q: expected at most the final presentation sort, found $nRange range exchanges in:\n$p")
    }
  }

  test("label-pair stats run on the packed arrays: no explode, no pair-key shuffle") {
    val p = plan("v03_label_sim_stats")
    assert(p.contains("graft_cosine"), s"native expression missing from:\n$p")
    // the 64-way posexplode form shows up as a Generate node; the packed
    // form has none, and never exchanges on the (qid, cid) pair key —
    // the only hash exchange is the label-pair aggregate
    assert(!p.contains("Generate"), s"packed cosine path regressed to explode:\n$p")
    assert(!p.contains("hashpartitioning(qid"),
      s"pair-key shuffle crept below the label aggregate:\n$p")
  }

  test("near-dup BUILD joins shuffle on the bucket key: corpus never broadcast") {
    // v06 now serves from the materialized pair table, so the scale
    // contract moves to the BUILD plan (what neardup_build executes);
    // executed plan after an action so AQE cannot have silently swapped
    // the strategy back to broadcast
    val df = graft.ops.SimOps.nearDupPairsPlan(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      s"near-dup candidate join broadcasts the corpus:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"expected a shuffled bucket-key join in:\n$p")
    // the BANDED form: vectors explode into per-band (band, key) rows
    // (a Generate node) and candidates join on the composite band+key
    // bucket — not a single fixed-width bucket whose pair fan-out grows
    // n²/buckets with the corpus
    assert(p.contains("Generate"),
      s"banded bucketing regressed to a single fixed bucket:\n$p")
    assert(p.contains("hashpartitioning(band"),
      s"candidate join no longer keyed on the (band, key) bucket:\n$p")
  }

  test("near-dup SERVE paths are artifact scans of the warehouse") {
    for (q <- Seq("v06_embed_neardup", "v12_embed_bucket_audit")) {
      val df = SparkEntry.queries(q)(spark, d)
      assert(df.inputFiles.nonEmpty &&
        df.inputFiles.forall(_.contains("neardup@")),
        s"$q does not serve from the near-dup artifact: ${df.inputFiles.toSeq.take(3)}")
      // no Generate (banding) and no graft_cosine: the lineage ran at
      // build time, not per query
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Generate") && !p.contains("graft_cosine"),
        s"$q re-derives the near-dup lineage per query:\n$p")
    }
    val keep = SparkEntry.queries("v14_embed_keep")(spark, d)
    assert(keep.inputFiles.exists(_.contains("neardup@")),
      "v14 does not consume the pair artifact")
  }

  test("v06 band bits grow with the corpus, integer-exactly") {
    import graft.ops.SimOps.bandBits
    assert(bandBits(0L) == 4 && bandBits(500L) == 4)
    // 64·2^4 = 1024 vectors is the last corpus 4 bits cover at the
    // ~64-members/bucket target; one vector more needs a 5th bit
    assert(bandBits(64L * 16) == 4)
    assert(bandBits(64L * 16 + 1) == 5)
    assert(bandBits(64L * 1024) == 10)
    // 10^11 docs (the 100 TB posture) -> 2^31 buckets per band, each
    // still ~64 expected members
    assert(bandBits(100L * 1000 * 1000 * 1000) == 31)
  }

  test("textdup BUILD verify stage never broadcasts a corpus-derived relation") {
    // t08 now serves from the materialized verify table, so the scale
    // contract moves to the BUILD plan (what textdup_build executes):
    // every relation in the verify stage (candidates, candidate docs,
    // pruned shingles, sizes) derives from the corpus, so candidate
    // volume — and with it every build side — scales with the near-dup
    // rate; a broadcast that fits at sf0.1 is a driver OOM at 100 TB.
    // Executed plan after an action so an AQE runtime swap is caught.
    val df = graft.ops.TextOps.jaccardVerifyPlan(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      s"verify build broadcasts a corpus-derived relation:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"verify build broadcasts a corpus-derived relation:\n$p")
  }

  test("textdup BUILD mining reads the signature artifact, expands pairs in-row") {
    val df = graft.ops.TextOps.minhashPairsPlan(spark, d)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("/sig@"),
      s"pair mining does not read the signature index:\n$p")
    // the signature derivation (per-shingle md5 array fold) must not
    // appear — that is the sig build's job
    assert(!p.contains("array_min"),
      s"pair mining re-derives signatures:\n$p")
    // in-row bucket expansion: the only joins in the contracted mining
    // are rep-keyed (the exact-dup census against the sig artifact) —
    // never a self-join of the banded relation on (band, key), which
    // is the O(bucket²)-rows regression this pins against
    assert(!p.contains("Join [band") && !p.contains("Join [key"),
      s"pair mining regressed to a banded self-join:\n$p")
    // the census join must not broadcast either side: both are
    // corpus-derived (distinct texts scale with the corpus)
    assert(!p.contains("BroadcastHashJoin"),
      s"pair mining broadcasts a corpus-derived relation:\n$p")
  }

  test("AOI clip broadcasts the one-row bounds, never the grid") {
    val df = SparkEntry.queries("c06_aoi_clip")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the cross join against the single-row AOI box must be a broadcast
    // nested-loop with the box on the build side; the grid side feeds the
    // tile aggregate without an intermediate join shuffle
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"AOI bounds join lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"AOI clip fell back to a cartesian product:\n$p")
  }

  test("fingerprint computes in-row: no gram ever shuffles") {
    // the explode + min/count-distinct form shuffled every gram twice;
    // the array-HOF form keeps the per-doc kernel in-row, so the only
    // exchanges are ROW-sized: the final range sort plus (on a narrow
    // single-split scan) the Par.widen round-robin that spreads the
    // CPU-heavy kernel — never a hash exchange of exploded grams
    val p = plan("t04_fingerprint")
    val nEx = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(nEx <= 2, s"fingerprint regressed to a shuffling plan:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"fingerprint shuffles grams on a hash key:\n$p")
    assert(!p.contains("Generate"), s"fingerprint regressed to explode:\n$p")
  }

  test("text near-dup SERVE paths are artifact scans of the warehouse") {
    // t06/t08/t12 read exactly their artifact table; t11/t13 aggregate
    // the label table — none re-derives banding, verification, or the
    // iterative CC at query time
    for (q <- Seq("t06_dedup_minhash", "t07_dedup_simhash", "t08_ngram_jaccard",
        "t11_dedup_components", "t12_bucket_audit", "t13_component_audit")) {
      val df = SparkEntry.queries(q)(spark, d)
      assert(df.inputFiles.nonEmpty &&
        df.inputFiles.forall(_.contains("textdup@")),
        s"$q does not serve from the textdup artifact: ${df.inputFiles.toSeq.take(3)}")
      val p = df.queryExecution.sparkPlan.toString
      assert(!p.contains("Generate") && !p.contains("array_min"),
        s"$q re-derives the near-dup lineage at query time:\n$p")
    }
  }

  test("decontamination broadcasts the eval n-grams, streams the corpus") {
    val p = plan("t14_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"eval n-gram join is not broadcast:\n$p")
    // the build side must be the eval-filtered branch, bounded by the
    // eval suite — never the training corpus
    val bx = p.indexOf("BroadcastExchange")
    assert(bx >= 0, s"no BroadcastExchange in:\n$p")
    assert(p.indexOf("doc_id#", bx) >= 0 && p.contains("< 20"),
      s"broadcast side is not the eval-filtered branch:\n$p")
  }

  test("sequence packing: the per-document window is range-partitioned, never global") {
    val p = plan("t15_sequence_pack")
    // the corpus-sized cumulative sum must exchange on the coarse range
    // key; a SinglePartition exchange under a corpus Window would be the
    // single-reducer prefix-sum trap
    assert("hashpartitioning\\(rng#\\d".r.findFirstIn(p).isDefined,
      s"per-doc cumsum is not partitioned by range:\n$p")
    assert("Window".r.findAllIn(p).length >= 2,
      s"expected the range-offset and per-doc windows:\n$p")
    // every SinglePartition exchange must sit above an aggregate (the
    // range-offsets window input / the shard census), never above a raw
    // document scan — that would be the single-reducer prefix-sum trap
    p.split("Exchange SinglePartition").drop(1).foreach { after =>
      // section text up to the next exchange describes this branch input
      val branch = after.split("Exchange ").head
      assert(branch.contains("HashAggregate") || !branch.contains("Scan"),
        s"a raw scan feeds a single-partition exchange:\n$p")
    }
  }

  test("chunk pack: the per-chunk window is range-partitioned, never global") {
    // the t15 lock, over the composed chunk→pack lineage: the
    // corpus-sized cumulative sum exchanges on the coarse range key and
    // only aggregate-sized relations reach a single partition
    val p = plan("t25_chunk_pack")
    assert("hashpartitioning\\(rng#\\d".r.findFirstIn(p).isDefined,
      s"per-chunk cumsum is not partitioned by range:\n$p")
    assert("Window".r.findAllIn(p).length >= 2,
      s"expected the range-offset and per-chunk windows:\n$p")
    p.split("Exchange SinglePartition").drop(1).foreach { after =>
      val branch = after.split("Exchange ").head
      assert(branch.contains("HashAggregate") || !branch.contains("Scan"),
        s"a raw scan feeds a single-partition exchange:\n$p")
    }
  }

  test("residual census computes in-row: model broadcast, one cell-keyed exchange") {
    val p = plan("v13_residual_error")
    // the corpus must never flatten or shuffle: the only exchanges are
    // the broadcast of the model-sized centroid arrays, the final
    // k-cell census aggregate, and presentation ordering
    assert(p.contains("BroadcastExchange"),
      s"centroid arrays lost their broadcast:\n$p")
    val nEx = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(nEx <= 2, s"expected ≤2 keyed exchanges (census + order), got $nEx:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"model lookup fell back to a corpus-shuffling SMJ:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"census aggregate lost its map-side partial:\n$p")
  }

  test("quantization census computes in-row: no flatten, one map-side-combined label agg") {
    // r16: the per-vector int8 error census is the native Q8Err
    // projection — the corpus never explodes and never joins back for
    // its per-vector scale; the only exchanges are the label aggregate
    // and presentation ordering
    val p = plan("v11_quantize_error")
    assert(p.contains("graft_q8_err"), s"census not on the native expression:\n$p")
    assert(!"\\(\\d+\\) Generate".r.findFirstIn(p).isDefined,
      s"census regressed to a corpus flatten:\n$p")
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).length >= 2,
      s"label aggregate lost its map-side partial:\n$p")
    val nEx = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(nEx <= 3, s"expected ≤3 exchanges (widen + census + order), got $nEx:\n$p")
    assert(!p.contains("SortMergeJoin"), s"an unexpected corpus join appeared:\n$p")
  }

  test("IVF serve prunes the inverted file to the probed cells statically") {
    // the broadcast-join spelling relied on runtime DPP, and the
    // executed plan carried dynamicpruningexpression(true) — pruning
    // dropped, every cell scanned (a full index scan per query batch
    // at 100 TB). The serve now pushes the collected probed-cell set
    // as a literal isin, which must surface as a STATIC partition
    // filter on the cells/ scan.
    for (q <- Seq("v05_sim_ivf", "v07_sim_ivf_probe2")) {
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the cells/ scan is the only partitioned relation in the plan;
      // its Location path truncates in toString, so key on the
      // PartitionFilters attribute itself
      val scan = p.split("\n").find(_.contains("PartitionFilters: ["))
      assert(scan.isDefined, s"$q: no partitioned cells/ scan in:\n$p")
      // the literal IN list must sit in PartitionFilters itself —
      // runtime DPP may still be planned alongside (harmless and
      // redundant), but the static filter is what guarantees the
      // probed-cells-only scan at any scale
      assert("PartitionFilters: \\[[^\\]]*cell#\\d+ IN".r
        .findFirstIn(scan.get).isDefined,
        s"$q: probed-cell set is not a static partition filter:\n${scan.get}")
    }
  }

  test("fact-fact joins build on the orders side, push filters, keep range predicates in the join") {
    // r18/r13 sf1 plan audit (round 13): both join lineitem (the larger
    // fact) with orders. Under the 64 MB broadcast threshold the orders
    // side broadcasts through sf1 (measured 6.9 s / 2.5 s at sf1) and
    // AQE's size estimate degrades the plan to a sort-merge join once
    // orders outgrows it — the right scale behavior, so the pinned
    // invariants are the scale-safe ones: if anything broadcasts it is
    // ORDERS (never the lineitem side), r18's discount filter reaches
    // the scan, and r13's interval bounds ride INSIDE the join (a lost
    // range predicate would explode the join output 90-days-to-all).
    for ((q, pushed) <- Seq(
        "r18_sql_api" -> "GreaterThan(l_discount,0.05)",
        "r13_range_join" -> "IsNotNull(l_shipdate)")) {
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(pushed), s"$q lost its scan pushdown:\n$p")
      // every broadcast subtree (child prints directly under the node)
      // must hash the orders relation, never lineitem
      p.split("BroadcastExchange").drop(1).foreach { sub =>
        val child = sub.take(600)
        assert(!child.contains("lineitem.parquet"),
          s"$q broadcasts the lineitem fact side:\n$p")
      }
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q fell off the equi-join path:\n$p")
    }
    val r13 = SparkEntry.queries("r13_range_join")(spark, d)
    r13.collect()
    val p13 = r13.queryExecution.executedPlan.toString
    // the interval predicate must sit INSIDE a Join node's condition —
    // a bare contains() over the whole plan would match partition
    // counts/stats and let the invariant silently rot
    val joinLines = p13.split("\n").filter(_.contains("Join"))
    assert(joinLines.exists(l => l.contains("l_shipdate") &&
      (l.contains("INTERVAL") || l.contains("date_add"))),
      s"r13 range bounds left the join condition:\n$p13")
  }

  test("whole-stage codegen covers the band-math expression block") {
    // codegen spans only materialize in the AQE-finalized executed plan,
    // where they render as the `*(n)` stage prefix
    val df = SparkEntry.queries("p01_pixel_indices")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"band math fell out of codegen:\n$p")
  }

  test("funnel stages 3-5 evaluate flags behind the pin barrier on a duplicate-heavy corpus") {
    // the survivor restriction is load-bearing only if Catalyst cannot
    // push the flag predicates back onto the documents scan: a bare
    // semi-join spelling gets undone (pushdown has no expression-cost
    // model — measured at 100×: full 500k-doc regex pass either way),
    // so stages 3-5 must derive from the PINNED survivor rows. The pin
    // hook sees each stage's pre-checkpoint plan; k3/k4 may contain no
    // documents file scan at all, and k5's single one is the eval-head
    // scan with the doc_id < EvalDocs filter pushed down.
    //
    // The pinned-survivor arm is SHAPE-DISPATCHED (funnelPinPays):
    // force it with a corpus where exact dedup absorbs 90% of the
    // docs — the 100× probe shape (500k docs → 17.8k survivors).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-pin").toString
    val base = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel",
      "india juliet kilo lima mike november oscar papa",
      "quebec romeo sierra tango uniform victor whiskey xray",
      "yankee zulu apple banana cherry damson elder fig",
      "grape honeydew iris jasmine kiwi lemon mango nectar",
      "olive peach quince raspberry strawberry tomato ugli vanilla",
      "walnut xigua yam zucchini acorn barley clover dill",
      "endive fennel garlic hyssop inula jicama kale leek")
    (0L until 80L).map(i => (i, base((i % 8).toInt), "en", "srcP", 48L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val pins = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    try {
      graft.ops.TextOps.funnelStages(spark, dir, pin = { df =>
        plans += df.queryExecution.sparkPlan.toString
        val (out, p) = graft.ops.Checkpoints.pin(df)
        pins += p
        out
      })
      // pin arrival order: k1-exact, k2-near, k2-docs, k3-quality,
      // k4-repetition, k5-decontam
      assert(plans.size == 6, s"expected 6 pinned stages, saw ${plans.size}")
      val Seq(k3, k4, k5) = plans.slice(3, 6).toSeq
      for ((p, name) <- Seq(k3 -> "k3-quality", k4 -> "k4-repetition"))
        assert(!p.contains("FileScan") && !p.contains("documents"),
          s"$name stage re-reads the corpus below the pin barrier:\n$p")
      val k5Scans = "FileScan".r.findAllIn(k5).length
      assert(k5Scans == 1 &&
        k5.contains(s"LessThan(doc_id,${graft.ops.TextOps.EvalDocs})"),
        s"k5-decontam must scan documents once, pruned to the eval head:\n$k5")
    } finally {
      pins.foreach(graft.ops.Checkpoints.release)
      graft.ops.Warehouse.invalidateDataset(dir)
    }
  }

  test("funnel falls back to full-scan flag evaluation on a low-duplicate corpus") {
    // survivors ≈ corpus here (sf0.001 is dup-free), so pinning them
    // would double-store the text payload for no flag work saved: the
    // dispatch must take the full-scan arm — no k2-docs pin (5 pinned
    // stages, not 6) and the k3/k4 flag relations read the documents
    // scan directly.
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val pins = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    try {
      graft.ops.TextOps.funnelStages(spark, d, pin = { df =>
        plans += df.queryExecution.sparkPlan.toString
        val (out, p) = graft.ops.Checkpoints.pin(df)
        pins += p
        out
      })
      assert(plans.size == 5,
        s"expected 5 pinned stages (no k2-docs pin), saw ${plans.size}")
      val Seq(k3, k4) = plans.slice(2, 4).toSeq
      for ((p, name) <- Seq(k3 -> "k3-quality", k4 -> "k4-repetition"))
        assert(p.contains("FileScan"),
          s"$name must evaluate its flag over the corpus scan here:\n$p")
    } finally pins.foreach(graft.ops.Checkpoints.release)
  }

  test("funnel pin dispatch: pin survivors only when near-dedup halves the corpus") {
    import graft.ops.TextOps.funnelPinPays
    assert(funnelPinPays(17800L, 500000L),
      "the 100× probe shape (17.8k stage-2 survivors) must pin")
    assert(!funnelPinPays(499200L, 500000L),
      "a low-duplicate corpus must evaluate flags full-scan, unpinned")
    assert(funnelPinPays(250000L, 500000L) && !funnelPinPays(250001L, 500000L),
      "threshold must sit at FunnelPinMaxFraction × docs inclusive")
  }

  test("textdup mining dispatch: contract only when replicas absorb half the corpus") {
    import graft.ops.TextOps.contractionPays
    assert(!contractionPays(499200L, 500000L),
      "the 100× probe shape (499.2k distinct texts) must mine doc-level")
    assert(contractionPays(5000L, 500000L),
      "a replica-dominated corpus must mine rep-level")
    assert(contractionPays(250000L, 500000L) && !contractionPays(250001L, 500000L),
      "threshold must sit at RepMineMaxFraction × docs inclusive")
  }

  test("chunk windows: one corpus scan, one explode, no keyed shuffle") {
    // the 100 TB claim is 'embarrassingly parallel map': the only
    // exchanges allowed are Par.widen's round-robin and the output sort
    val p = plan("t22_chunk_windows")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length == 1, s"extra corpus scan:\n$p")
    assert("\\(\\d+\\) Generate".r.findAllIn(p).length >= 1, s"explode missing:\n$p")
    assert(!p.contains("hashpartitioning"), s"chunking shuffled on a key:\n$p")
    assert(!p.contains("Join"), s"unexpected join in a per-row map:\n$p")
  }

  test("doc keywords: artifact serve — no corpus text, shuffled df join, doc-keyed rank") {
    // serving reads the keywords@ artifact; the corpus token pass ran
    // at build time (census lock below). The df join is pinned
    // shuffle-hash on term — vocabulary scales with the corpus, never
    // broadcast, and a JOIN on the Zipfian term key is
    // AQE-skew-splittable where the r15 term-partitioned Window (the
    // r15 verdict's one `weak`) physically forced every row of the
    // hottest term into one task. The only window partitions by doc_id
    // with its top-k capped before the sort.
    val p = plan("t23_doc_keywords")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length == 2,
      s"expected exactly the tf/ and df/ artifact scans:\n$p")
    assert("\\btext#\\d".r.findFirstIn(p).isEmpty,
      s"serve touches the corpus text column:\n$p")
    assert(!p.contains("Generate"), s"serve re-exploded the corpus:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"df join not pinned shuffled:\n$p")
    assert("windowspecdefinition\\(term".r.findFirstIn(p).isEmpty,
      s"term-partitioned window crept back:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rank top-k not pushed:\n$p")
  }

  test("keywords census: one corpus scan, one explode, map-side-combined aggregate") {
    // the build's single corpus pass (the serve above never re-scans):
    // explode_outer → (doc_id, term) keyed count with partial+final
    // HashAggregate around its one exchange
    val p = ops.TextOps.keywordsCensusPlan(spark, d)
      .queryExecution.explainString(FormattedMode)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length == 1,
      s"census must read the corpus exactly once:\n$p")
    assert("\\(\\d+\\) Generate".r.findAllIn(p).length == 1,
      s"census must explode exactly once:\n$p")
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).length >= 2,
      s"census aggregate lost its map-side combine:\n$p")
  }

  test("mixture rebalance: census broadcasts, corpus never shuffles on source") {
    val p = plan("t24_mixture_rebalance")
    // two corpus scans: the census pass and the doc projection — the
    // agg+crossJoin total spelling cost a third
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length == 2,
      s"census totals recomputed the corpus scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"census join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the census join:\n$p")
  }

  test("IVF-ADC serve prunes the inverted-file read to the probed cells statically") {
    // the composed v17 tier touches probed cells only: since the r16
    // in-row Sq8Code quantize (no norm flatten), the cell-partitioned
    // artifact is scanned exactly ONCE, with the probed set as a
    // LITERAL partition filter (the v05 lesson — DPP dropped at runtime
    // and the whole index scanned); the integer top-k caps before its
    // one exchange and the query codes broadcast
    val p = plan("v17_ivf_adc")
    val pruned = p.split("\n").filter(_.contains("PartitionFilters: ["))
      .count(l => "cell#\\d+ IN".r.findFirstIn(l).isDefined)
    assert(pruned == 1,
      s"expected exactly the one cell-pruned candidate scan, got $pruned:\n$p")
    assert(p.contains("graft_sq8_code") && p.contains("graft_adc_dot"),
      s"quantize/score not on the native in-row expressions:\n$p")
    assert(p.contains("WindowGroupLimit"), s"integer top-k not pushed:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the IVF-ADC serve:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"query codes not broadcast:\n$p")
  }

  test("ADC top-k: broadcast query codes, local integer top-k, survivors-only rerank explode") {
    // since r16 the quantize is the native in-row Sq8Code projection
    // and the score the codegen'd AdcDot — the corpus never flattens
    // for norms and never evaluates an interpreted HOF lambda; the lock
    // pins the serve shape: the query side broadcasts, the integer
    // ranking caps locally before its one window exchange, no
    // cartesian/corpus-broadcast strategy appears, and exactly ONE
    // Generate exists — the ≤ k·queries survivor rerank. A second
    // means either the norm flatten crept back or the corpus explodes
    // per query.
    val p = plan("v16_adc_topk")
    assert("\\(\\d+\\) Generate".r.findAllIn(p).length == 1,
      s"unexpected explode count in the ADC serve:\n$p")
    assert(p.contains("graft_sq8_code") && p.contains("graft_adc_dot"),
      s"quantize/score not on the native in-row expressions:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query codes not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian strategy in the ADC serve:\n$p")
    assert(p.contains("WindowGroupLimit"), s"integer top-k not pushed:\n$p")
  }

  test("quota sample: no per-source corpus window — census thresholds + bounded bucket rank") {
    // exact per-group selection without the per-group sort: the ONLY
    // corpus-side window partitions by (source, u16) — cells bounded at
    // ~n_src/2^16 under any source skew — while a window partitioned by
    // source alone and ORDERED by (u16, doc_id) (the oracle's spelling)
    // would put a whole source into one undividable task. In formatted
    // plans partition columns carry no sort direction, so the bounded
    // cell window renders `windowspecdefinition(source#, u16#, doc_id# ASC`
    // and the forbidden corpus sort `source#, u16# ASC ..., doc_id# ASC`
    // (the census's legitimate per-source cumsum windows order by u16
    // ALONE over the census-sized aggregate — allowed).
    val p = plan("t26_quota_sample")
    assert("windowspecdefinition\\(source#\\d+, u16#\\d+ ASC[^,]*, doc_id#\\d+L? ASC".r
      .findFirstIn(p).isEmpty,
      s"per-source corpus-sort window crept in:\n$p")
    assert("windowspecdefinition\\(source#\\d+, u16#\\d+, doc_id#\\d+L? ASC".r
      .findFirstIn(p).isDefined,
      s"bounded (source, u16) bucket window missing:\n$p")
    // census pass + tag pass, like t24; thresholds and census-below
    // join back as broadcasts, never shuffling the corpus on source
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).length == 2,
      s"expected exactly the census and tag scans:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled on source:\n$p")
    // the census aggregate keeps its map-side combine
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).length >= 2,
      s"census aggregate lost its map-side combine:\n$p")
  }
}
