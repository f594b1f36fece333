package graft

/** In-round bench regression gate: compares the current run's per-query
  * wall-times against the previous round's BENCH artifact and flags any
  * query that got more than [[Factor]]× slower. Round 5 shipped a 7×
  * per-query regression with every correctness/plan gate green — plans
  * were locked, wall-time was not; this closes that hole.
  *
  * The comparison is pure and unit-tested ([[check]]); [[Bench]] wires
  * it to artifact discovery and reports the verdict inside its JSON
  * contract line. Modes (env `SPARK_GRAFT_BENCH_GATE`): `warn` (default
  * — report, exit 0, because co-tenant CPU noise produces multi-×
  * outliers and the driver's artifact must not be held hostage to
  * them), `strict` (non-zero exit on regression — the local pre-commit
  * setting), `off`.
  */
object BenchGate {

  /** A query counts as regressed when it exceeds Factor× its previous
    * time AND the previous time is above the noise floor (sub-Floor
    * queries flip multi-× on scheduler jitter alone) AND the absolute
    * slowdown exceeds DeltaSec (a 0.25→0.55 s flutter is co-tenant
    * noise even though both bounds above pass; a real regression of the
    * r5 kind costs whole seconds). */
  val Factor = 2.0
  val FloorSec = 0.2
  val DeltaSec = 0.5

  /** One-time index builds (ivf_build / sig_build) get their own, looser
    * bounds: a build is a multi-job driver-bound step whose wall-time is
    * noisier than any single query, and a real build regression (an
    * extra shuffle, a lost cache) costs whole seconds, not fractions. */
  val BuildFactor = 2.0
  val BuildFloorSec = 0.5
  val BuildDeltaSec = 2.0

  /** Re-run policy for a flagged measurement: while `flagged` holds for
    * the best (minimum) time seen so far, take another sample, up to
    * `maxReruns` extra runs. Returns (best, rerunsTaken). The min across
    * runs is the least-contended sample — on a co-tenant box it is the
    * honest estimate of what the plan costs, and a regression that
    * survives it is real, not scheduler noise. Pure so the spec can
    * drive it with scripted samples. */
  def settle(first: Double, flagged: Double => Boolean,
      rerun: () => Double, maxReruns: Int = 2): (Double, Int) = {
    var best = first
    var n = 0
    while (n < maxReruns && flagged(best)) {
      val r = rerun()
      // a rerun that THROWS reports −1 (Bench.timed); it must not clobber
      // a valid earlier sample — one transient rerun crash would
      // otherwise mark the artifact broken despite a real timing existing
      best = if (r < 0) best else if (best < 0) r else math.min(best, r)
      n += 1
    }
    (best, n)
  }

  /** Regressions as name -> (previousSec, currentSec). `allow` names
    * queries exempted deliberately (a feature that is known to cost). */
  def check(prev: Map[String, Double], curr: Map[String, Double],
      allow: Set[String], factor: Double = Factor,
      floor: Double = FloorSec,
      delta: Double = DeltaSec): Map[String, (Double, Double)] =
    curr.collect {
      case (name, t) if !allow.contains(name) &&
          prev.get(name).exists(p => p >= floor && t > factor * p &&
            t - p > delta) =>
        name -> (prev(name), t)
    }

  /** Pull the per-query map out of a BENCH artifact. Primary path: the
    * `"queries":{...}` object of the contract line (flat string-to-
    * number, so a regex scan is exact). Fallback for the driver's
    * tail-truncated BENCH_r<N>.json artifacts: any `"name":sec` pair
    * whose name has the declared-query shape (`x NN _ ...`) anywhere in
    * the text — a partial baseline still gates the queries it covers. */
  def parseQueries(raw: String): Map[String, Double] = {
    // the driver's artifact embeds the contract line as an escaped JSON
    // string field; unescape so the pair regex sees plain quotes
    val json = raw.replace("\\\"", "\"")
    val at = json.indexOf("\"queries\"")
    val body =
      if (at < 0) json
      else {
        val open = json.indexOf('{', at)
        val close = json.indexOf('}', open)
        if (open < 0 || close < 0) json else json.substring(open + 1, close)
      }
    "\"([a-z][0-9][0-9]_[A-Za-z0-9_]+)\"\\s*:\\s*(-?[0-9][0-9.eE+-]*)".r
      .findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** The one-time build timings of a BENCH artifact (`ivf_build`,
    * `sig_build`, `textdup_build`, `funnel_build`, `neardup_build`, `cube_build`,
    * `gcache_build`) — top-level fields of the contract line, not
    * members of the queries object, so [[parseQueries]] never sees
    * them. */
  def parseBuilds(raw: String): Map[String, Double] = {
    val json = raw.replace("\\\"", "\"")
    // Scan only the segment between the close of the "queries" object and
    // the "errors" map (falling back to "gate" for pre-errors artifacts):
    // build fields sit exactly there in the contract line. The gate
    // section re-mentions build names inside `"builds":{...}` pairs and
    // `"reruns":{"cube_build":2}` COUNTS — and `.toMap` keeps the last
    // match, so an unbounded scan would adopt a rerun count as the
    // baseline time (the r10 poisoned-baseline bug). The errors map is
    // excluded too: its free-text messages pass through the same
    // unescaping, so a message containing `"gate":` or a quoted
    // `<name>_build":<number>` shape must not shift the boundary or
    // fabricate a baseline entry.
    val qAt = json.indexOf("\"queries\"")
    val start =
      if (qAt < 0) 0 // driver tail truncated from the front — scan from 0
      else {
        val open = json.indexOf('{', qAt)
        val close = if (open < 0) -1 else json.indexOf('}', open)
        if (close < 0) qAt else close + 1
      }
    val end = Seq(json.indexOf("\"errors\":", start),
      json.indexOf("\"gate\":", start)).filter(_ >= 0)
      .minOption.getOrElse(json.length)
    val body = json.substring(start, end)
    ("\"((?:" + Families.nameAlternation +
      ")_build)\"\\s*:\\s*(-?[0-9][0-9.eE+-]*)").r
      .findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** A baseline only gates a run at the SAME scale factor: the artifact
    * records either the full sf dir (contract line, quoted string) or
    * the bare scale-factor NUMBER (the driver's BENCH_r<N>.json writes
    * `"sf": 0.1` unquoted, with the contract line quote-escaped inside
    * its `tail` field — so unescape first, like [[parseQueries]]). */
  private[graft] def sfMatches(json: String, sfDir: String): Boolean = {
    val text = json.replace("\\\"", "\"")
    "\"sf\"\\s*:\\s*\"?([^\",}\\s]+)\"?".r.findFirstMatchIn(text).exists { m =>
      val v = m.group(1)
      // exact dir, or the bare scale factor as a full "sf<v>" path
      // segment — a bare-suffix match would cross scale factors
      // ("sf0.1".endsWith("1") is true for an sf1 baseline)
      v == sfDir || sfDir == "sf" + v || sfDir.endsWith("/sf" + v)
    }
  }

  /** The freshest usable baseline for `sfDir`: an explicit
    * `SPARK_GRAFT_BENCH_PREV` path, else BENCH_local.json (the
    * COMMITTED rolling baseline — since r17 a Bench run writes its own
    * line to BENCH_run.json by default and never refreshes this file;
    * devtools/benchmin.py does, explicitly), else the highest
    * BENCH_r<N>.json — skipping any whose scale factor differs or whose
    * per-query map comes up empty. */
  def previousBaseline(dir: String, sfDir: String): Option[(String, Map[String, Double])] =
    previousArtifact(dir, sfDir).map { case (name, text) =>
      (name, parseQueries(text)) }

  /** Same discovery as [[previousBaseline]] but returns the artifact's
    * raw text, so a caller can pull out both the per-query map and the
    * build timings without re-reading the file. */
  def previousArtifact(dir: String, sfDir: String): Option[(String, String)] = {
    import java.nio.file.{Files, Path, Paths}
    val explicit = sys.env.get("SPARK_GRAFT_BENCH_PREV")
      .map(Paths.get(_)).filter(Files.exists(_)).toSeq
    // BENCH_SF1.json is the sf1 round's rolling baseline (devtools/
    // sf1.sh); it sits in the same candidate chain because sfMatches
    // already keeps every artifact scoped to its own scale factor — an
    // sf0.1 run skips it and an sf1 run skips the sf0.1 artifacts.
    val local = Seq(Paths.get(dir, "BENCH_local.json"),
      Paths.get(dir, "BENCH_SF1.json")).filter(Files.exists(_))
    val rx = "BENCH_r(\\d+)\\.json".r
    val rounds: Seq[Path] = {
      val d = Paths.get(dir)
      if (!Files.isDirectory(d)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        val stream = Files.list(d)
        try stream.iterator().asScala.toSeq
          .flatMap(p => rx.findFirstMatchIn(p.getFileName.toString)
            .map(m => (m.group(1).toInt, p)))
          .sortBy(-_._1).map(_._2)
        finally stream.close()
      }
    }
    (explicit ++ local ++ rounds).iterator.flatMap { p =>
      // an unreadable or corrupt candidate must not abort the bench
      // (the gate is advisory; the timing artifact matters more): a
      // truncated value like `"p01":5e` throws NumberFormatException
      // out of parseQueries, not just IOException — skip on anything
      // non-fatal
      try {
        val text = new String(Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        if (parseQueries(text).nonEmpty && sfMatches(text, sfDir))
          Some((p.getFileName.toString, text))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption()
  }

  /** JSON fragment for the contract line: previous artifact, per-query
    * regressions (after any re-runs), build-step regressions, how many
    * extra runs each flagged query took to clear (a non-empty `reruns`
    * with empty `regressions` is the signature of machine noise), and
    * the verdict. */
  def report(prevFile: Option[String],
      regressions: Map[String, (Double, Double)],
      builds: Map[String, (Double, Double)] = Map.empty,
      reruns: Map[String, Int] = Map.empty): String = {
    def pairs(m: Map[String, (Double, Double)]) =
      m.toSeq.sortBy(_._1).map { case (n, (p, c)) =>
        s""""$n":[$p,$c]"""
      }.mkString("{", ",", "}")
    val rr = reruns.toSeq.sortBy(_._1).map { case (n, k) => s""""$n":$k""" }
      .mkString("{", ",", "}")
    val prev = prevFile.map("\"" + _ + "\"").getOrElse("null")
    s"""{"prev":$prev,"factor":$Factor,"regressions":${pairs(regressions)},"builds":${pairs(builds)},"reruns":$rr,"pass":${regressions.isEmpty && builds.isEmpty}}"""
  }
}
