package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): run every declared query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with total + per-query secs.
  * The same line is also written to SPARK_GRAFT_BENCH_OUT (default
  * ./BENCH_run.json, untracked) — stdout through the driver has been
  * observed to truncate mid-stream, losing per-query families from the
  * artifact. The default deliberately does NOT overwrite
  * BENCH_local.json (the committed rolling baseline the gate reads):
  * r16's driver runs clobbered the baseline in the working tree, which
  * then got committed over the real min-of-runs numbers. Refreshing
  * the baseline is now an explicit act (benchmin.py or
  * SPARK_GRAFT_BENCH_OUT=BENCH_local.json), never a side effect.
  *
  * Noise robustness: this box is co-tenant, and a single-sample gate
  * false-fires on CPU contention (round 6 shipped `pass:false` with 7
  * "regressions" a clean re-run measured at or below baseline). So any
  * query the gate flags after the first pass is re-run up to
  * [[MaxReruns]] more times and scored by its MINIMUM across runs — the
  * min is the least-contended sample and the best estimate of what the
  * plan actually costs. Only flagged queries pay the extra runs; a
  * clean pass stays one-sample cheap. The same treatment covers the
  * one-time build steps (their caches are cleared so a re-run is a real
  * rebuild). The artifact records the re-run counts, so "flagged then
  * cleared on re-run" (machine noise) is distinguishable from "never
  * flagged" and from a genuine regression that survives the re-runs. */
object Bench {

  /** Extra timing runs granted to a gate-flagged query. */
  val MaxReruns = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // Warm the JVM/session on the smallest SF so per-query timings measure
    // the plan, not first-query classloading. The index builds deserve
    // the same treatment — ivf_build runs first and would otherwise
    // absorb the one-time janino/encoder cost of the decimal-window and
    // packed-array codegen paths no pixel query touches — so the warm-up
    // also trains the smallest SF's quantizer (its artifacts persist for
    // sf0.001 and are not the measured dataset's).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // the smallest-SF sibling of the measured dataset (the warm-up
    // corpus), derived from the SF-dir convention rather than hardcoded
    val warmDir = scala.util.Try(
      java.nio.file.Paths.get(sfDir).getParent.resolve("sf0.001"))
      .filter(java.nio.file.Files.isDirectory(_))
      .map(_.toString).getOrElse("/root/testdata/sf0.001")
    if (sfDir != warmDir) {
      // force a REAL tiny build (a warehouse hit would skip the code
      // paths the warm-up exists to compile) — against a BENCH-PRIVATE
      // throwaway warehouse root, so warming never invalidates the
      // shared warehouse's sf0.001 artifacts out from under a
      // concurrent session serving them
      val prevRoot = sys.props.get("graft.warehouse")
      try {
        sys.props("graft.warehouse") = java.nio.file.Files
          .createTempDirectory("graft-bench-warm").toString
        ops.SimOps.clearIvfCaches()
        ops.SimOps.buildIvf(spark, warmDir)
      } catch { case _: Throwable => () }
      finally {
        prevRoot match {
          case Some(v) => sys.props("graft.warehouse") = v
          case None => sys.props -= "graft.warehouse"
        }
        // drop memo entries pointing into the throwaway root
        ops.SimOps.clearIvfCaches()
      }
    }

    // A query/build that THROWS must be visibly broken in the artifact,
    // not a fast-looking ~0.07 s "pass" (that is exactly how 10
    // analysis-broken queries hid in BENCH_r10.json): record −1 as its
    // time and the exception in the `errors` map. A −1 never trips the
    // gate (BenchGate.check requires t > factor·prev > 0) and never
    // poisons a future baseline (prev ≥ floor excludes it).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timed(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        errors(name) = (e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("")).replaceAll("\\s+", " ").take(200)
        -1.0
      }
    }
    def runQuery(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t = timed(name) { fn(spark, sfDir).count(); () }
      // queries may cache intermediates for intra-query reuse; release
      // them so later queries are measured without inherited memory
      // pressure
      spark.catalog.clearCache()
      t
    }

    // Builds persist in the warehouse across processes (the reuse a
    // production session wants); the BENCH build numbers must measure
    // REAL builds, so the artifacts for this dataset are invalidated
    // first — a warm warehouse would report near-zero builds and make
    // the artifact incomparable across rounds.
    ops.Warehouse.invalidateDataset(sfDir)

    // Build every artifact family up front (the CREATE INDEX step):
    // the serve queries (v05/v07, t06…, p05/p06/p08, x08) then measure
    // SERVING — which is what repeats at query time. The one-time build
    // costs are not hidden: each is its own `<family>_build` field,
    // gated below like any query (with build-sized bounds). The
    // [[Families]] registry owns the build order (dependencies: sig →
    // textdup → funnel) and each family's cold-reset for the re-runs.
    // Dev bisection knobs (never set by the driver): skip named build
    // families / query names to attribute session-global drift — a
    // slowdown that vanishes when one build is skipped is that build's
    // JVM/session residue, not the measured queries' plans.
    val skipFams = sys.env.get("SPARK_GRAFT_BENCH_SKIP_FAMILIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val skipQs = sys.env.get("SPARK_GRAFT_BENCH_SKIP_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val fams = Families.all.filterNot(f => skipFams(f.name))

    val buildTimes = scala.collection.mutable.LinkedHashMap(
      fams.map { fam =>
        fam.field -> timed(fam.field)(fam.build(spark, sfDir))
      }: _*)

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skipQs(n) }
    val times = scala.collection.mutable.LinkedHashMap(
      ordered.map { case (name, fn) => name -> runQuery(name, fn) }: _*)

    // regression gate vs the previous round's artifact (BenchGate):
    // catches a per-query wall-time blowup the correctness/plan gates
    // cannot see; reported inside the contract line either way
    val gateMode = sys.env.getOrElse("SPARK_GRAFT_BENCH_GATE", "warn")
    val allow = sys.env.get("SPARK_GRAFT_BENCH_GATE_ALLOW")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val artifact =
      if (gateMode == "off") None else BenchGate.previousArtifact(".", sfDir)
    val prevQ = artifact.map(a => BenchGate.parseQueries(a._2))
      .getOrElse(Map.empty[String, Double])
    val prevB = artifact.map(a => BenchGate.parseBuilds(a._2))
      .getOrElse(Map.empty[String, Double])

    def qFlagged(name: String, t: Double): Boolean =
      BenchGate.check(prevQ, Map(name -> t), allow).nonEmpty
    def bFlagged(name: String, t: Double): Boolean =
      BenchGate.check(prevB, Map(name -> t), allow, BenchGate.BuildFactor,
        BenchGate.BuildFloorSec, BenchGate.BuildDeltaSec).nonEmpty

    // Second chance for anything the first pass flagged: re-run, keep
    // the min, stop as soon as the measurement clears the gate
    // (BenchGate.settle). The builds clear their in-JVM caches AND
    // warehouse artifacts first so a re-run is a real rebuild, not a
    // cache hit.
    val reruns = scala.collection.mutable.LinkedHashMap[String, Int]()
    val byName = ordered.toMap
    for ((name, _) <- ordered) {
      val (best, n) = BenchGate.settle(times(name), qFlagged(name, _),
        () => runQuery(name, byName(name)), MaxReruns)
      times(name) = best
      if (n > 0) reruns(name) = n
    }
    for (fam <- fams) {
      val (best, n) = BenchGate.settle(buildTimes(fam.field),
        bFlagged(fam.field, _),
        () => { fam.cold(sfDir)
          timed(fam.field)(fam.build(spark, sfDir)) }, MaxReruns)
      buildTimes(fam.field) = best
      if (n > 0) reruns(fam.field) = n
    }

    // A transient rerun crash must not mark a measurement broken when a
    // valid sample exists: settle keeps the valid minimum (negative rerun
    // samples are ignored there), so any name whose final time is ≥ 0 had
    // a real measurement — drop its error entry rather than exiting 4.
    val finalBuilds = buildTimes.toMap
    for ((name, t) <- times if t >= 0) errors -= name
    for ((name, t) <- finalBuilds if t >= 0) errors -= name

    val qRegs = BenchGate.check(prevQ, times.toMap, allow)
    val bRegs = BenchGate.check(prevB, finalBuilds, allow,
      BenchGate.BuildFactor, BenchGate.BuildFloorSec, BenchGate.BuildDeltaSec)
    val gate = BenchGate.report(artifact.map(_._1), qRegs, bRegs, reruns.toMap)

    // keys escape through Json.str like the values: a query/build name
    // with a quote or backslash (none today, but names are data here)
    // must not emit invalid JSON
    val qs = times.toSeq.map { case (k, v) => Json.str(k) + ":" + v }
      .mkString("{", ",", "}")
    // errored queries carry time −1 in `queries`; keep them out of the
    // headline total (a sum with −1s would under-report, hiding breakage)
    val total = times.values.filter(_ >= 0).sum
    val errs = errors.toSeq.map { case (k, v) =>
      Json.str(k) + ":" + Json.str(v)
    }.mkString("{", ",", "}")
    // trailing comma carried here: with every build family skipped (the
    // drift-bisection knob) an empty builds block must not emit `,,`
    val bs = buildTimes.toSeq.map { case (k, v) => Json.str(k) + ":" + v + "," }
      .mkString
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$bs"errors":$errs,"sf":"$sfDir","gate":$gate}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_run.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"bench artifact write failed ($out): $e") }
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"bench errors: ${errors.size} quer" +
        s"${if (errors.size == 1) "y" else "ies"}/builds threw instead " +
        "of completing: " + errors.keys.mkString(", "))
      if (gateMode == "strict") sys.exit(4)
    }
    val regs = qRegs ++ bRegs
    if (regs.nonEmpty) {
      System.err.println(s"bench gate: ${regs.size} quer" +
        s"${if (regs.size == 1) "y" else "ies"} regressed >" +
        s"${BenchGate.Factor}x (after $MaxReruns re-runs) vs " +
        s"${artifact.map(_._1).getOrElse("?")}: " +
        regs.toSeq.sortBy(_._1).map { case (n, (p, c)) =>
          f"$n $p%.2f->$c%.2f" }.mkString(", "))
      if (gateMode == "strict") sys.exit(3)
    }
  }
}
