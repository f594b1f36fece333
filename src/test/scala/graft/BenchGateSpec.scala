package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's pure comparison logic: what counts as a
  * regression, what the noise floor and allowlist exempt, and that the
  * artifact parsing reads the driver's contract line. */
class BenchGateSpec extends AnyFunSuite {

  test("check flags >2x regressions above the floor, nothing else") {
    val prev = Map("a" -> 1.0, "b" -> 0.5, "c" -> 0.1, "d" -> 4.0, "f" -> 0.25)
    val curr = Map(
      "a" -> 2.5,  // 2.5x and +1.5s -> regression
      "b" -> 0.9,  // 1.8x -> fine
      "c" -> 1.0,  // 10x but prev below the noise floor -> exempt
      "d" -> 3.0,  // faster -> fine
      "e" -> 9.0,  // new query, no baseline -> exempt
      "f" -> 0.6)  // 2.4x but only +0.35s -> sub-delta flutter, exempt
    val r = BenchGate.check(prev, curr, allow = Set.empty)
    assert(r == Map("a" -> (1.0, 2.5)), s"wrong regressions: $r")
  }

  test("allowlist exempts a named query") {
    val prev = Map("a" -> 1.0, "b" -> 1.0)
    val curr = Map("a" -> 5.0, "b" -> 5.0)
    val r = BenchGate.check(prev, curr, allow = Set("a"))
    assert(r == Map("b" -> (1.0, 5.0)))
  }

  test("parseQueries reads the BENCH contract line and the truncated driver tail") {
    val line = """{"metric":"total","value":80.17,"unit":"sec",""" +
      """"queries":{"q01_agg":1.25,"v05_sim_ivf":8.54,"t12_bucket_audit":0.0,"neg":-1.0E-2},""" +
      """"sf":"/root/testdata/sf0.1"}"""
    val q = BenchGate.parseQueries(line)
    // only declared-query-shaped names count; stray keys ("neg", and in
    // the tail fallback "value"/"cpus") never pollute the baseline
    assert(q == Map("q01_agg" -> 1.25, "v05_sim_ivf" -> 8.54,
      "t12_bucket_audit" -> 0.0), s"parsed: $q")
    assert(BenchGate.parseQueries("{}").isEmpty)
    assert(BenchGate.parseQueries("""{"queries":{}}""").isEmpty)
    // the driver's BENCH_r<N>.json keeps only a truncated stdout tail —
    // no "queries" key; the query-shaped pairs still parse
    val tail = """{"n":"5","cpus":"32","tail":"stats\":0.64,\"q04_quality_neighbor\":0.38,""" +
      """\"q05_quality_filter_applied\":1.58},\"sf\":\"/root/testdata/sf0.1\"}"}"""
    val t = BenchGate.parseQueries(tail)
    assert(t == Map("q04_quality_neighbor" -> 0.38,
      "q05_quality_filter_applied" -> 1.58), s"parsed tail: $t")
  }

  test("sfMatches pins the baseline to the same scale factor") {
    assert(BenchGate.sfMatches("""{"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1"))
    assert(BenchGate.sfMatches("""{"sf":"0.1"}""", "/root/testdata/sf0.1"))
    assert(!BenchGate.sfMatches("""{"sf":"0.01"}""", "/root/testdata/sf0.1"))
    assert(!BenchGate.sfMatches("""{"metric":"total"}""", "/root/testdata/sf0.1"))
    // bare-number suffixes must not match across scale factors
    assert(!BenchGate.sfMatches("""{"sf":"1"}""", "/root/testdata/sf0.1"))
    assert(!BenchGate.sfMatches("""{"sf":"0.1"}""", "/root/testdata/sf0.01"))
    // the driver's BENCH_r<N>.json writes sf as a bare NUMBER and
    // quote-escapes the contract line inside its tail field — both
    // forms must match, so a cross-round baseline is actually found
    assert(BenchGate.sfMatches("""{"n": 5, "sf": 0.1, "tail": "..."}""",
      "/root/testdata/sf0.1"))
    assert(!BenchGate.sfMatches("""{"n": 5, "sf": 0.01, "tail": "..."}""",
      "/root/testdata/sf0.1"))
    assert(BenchGate.sfMatches(
      """{"n": 5, "tail": "...,\"sf\":\"/root/testdata/sf0.1\"}"}""",
      "/root/testdata/sf0.1"))
  }

  test("report emits a verdict the contract line can embed") {
    val pass = BenchGate.report(Some("BENCH_r05.json"), Map.empty)
    assert(pass.contains("\"pass\":true") && pass.contains("BENCH_r05.json"))
    val fail = BenchGate.report(None, Map("a" -> (1.0, 2.5)))
    assert(fail.contains("\"pass\":false") && fail.contains("\"a\":[1.0,2.5]"))
  }

  test("settle re-runs a flagged measurement and keeps the min") {
    val flagged = (t: Double) => t > 2.0
    // contended first sample, second re-run comes back clean -> cleared
    val s1 = Iterator(8.5, 1.2)
    assert(BenchGate.settle(9.0, flagged, () => s1.next()) == (1.2, 2))
    // clears on the first re-run -> stops early, later samples unused
    val s2 = Iterator(0.5, 99.0)
    assert(BenchGate.settle(9.0, flagged, () => s2.next()) == (0.5, 1))
    // never flagged -> zero extra runs, the thunk must not fire
    assert(BenchGate.settle(1.0, flagged,
      () => fail("must not re-run an unflagged query")) == (1.0, 0))
    // a genuine regression survives every re-run and stays at its min
    val s4 = Iterator(9.1, 9.2)
    assert(BenchGate.settle(9.0, flagged, () => s4.next()) == (9.0, 2))
    // the min is kept even when a later sample is WORSE than the first
    val s5 = Iterator(12.0, 2.5)
    assert(BenchGate.settle(3.0, flagged, () => s5.next()) == (2.5, 2))
    // a rerun that THROWS (reported as −1 by Bench.timed) must not
    // clobber a valid earlier sample: one transient crash would
    // otherwise mark the artifact broken despite a real timing
    val s6 = Iterator(-1.0, 2.4)
    assert(BenchGate.settle(3.0, flagged, () => s6.next()) == (2.4, 2))
    val s7 = Iterator(-1.0, -1.0)
    assert(BenchGate.settle(3.0, flagged, () => s7.next()) == (3.0, 2))
    // ...and a valid rerun RECOVERS a broken first sample (−1 is never
    // flagged by the gate, but settle must still prefer real over −1)
    val s8 = Iterator(1.5)
    assert(BenchGate.settle(-1.0, _ < 0, () => s8.next()) == (1.5, 1))
  }

  test("parseBuilds reads the one-time build fields, not the queries") {
    val line = """{"metric":"total","value":51.7,""" +
      """"queries":{"t06_dedup_minhash":0.86},""" +
      """"ivf_build":8.17,"sig_build":1.53,"funnel_build":4.13,""" +
      """"sf":"/root/testdata/sf0.1"}"""
    val b = BenchGate.parseBuilds(line)
    assert(b == Map("ivf_build" -> 8.17, "sig_build" -> 1.53,
      "funnel_build" -> 4.13), s"parsed: $b")
    assert(BenchGate.parseBuilds("{}").isEmpty)
    // the driver's quote-escaped tail form parses too
    val tail = """{"tail":"...,\"ivf_build\":9.66,\"sig_build\":2.27,..."}"""
    assert(BenchGate.parseBuilds(tail) ==
      Map("ivf_build" -> 9.66, "sig_build" -> 2.27))
    // and builds never leak into the query baseline
    assert(!BenchGate.parseQueries(line).contains("ivf_build"))
  }

  test("parseBuilds ignores the artifact's own gate section (reruns are counts, not times)") {
    // a prior artifact whose bench run itself gated: the gate report
    // re-mentions build names as regression pairs and RERUN COUNTS —
    // neither may become a baseline time for the next run
    val line = """{"metric":"total","value":66.8,""" +
      """"queries":{"q02_granule_gate":0.76},""" +
      """"ivf_build":6.45,"cube_build":18.36,"neardup_build":1.84,""" +
      """"sf":"/root/testdata/sf0.1",""" +
      """"gate":{"prev":"BENCH_r09.json","factor":2.0,"regressions":{},""" +
      """"builds":{"cube_build":[5.08,18.36]},""" +
      """"reruns":{"cube_build":2,"ivf_build":1,"neardup_build":1},""" +
      """"pass":false}}"""
    val b = BenchGate.parseBuilds(line)
    assert(b == Map("ivf_build" -> 6.45, "cube_build" -> 18.36,
      "neardup_build" -> 1.84), s"parsed: $b")
    // same when the whole line arrives quote-escaped inside a tail field
    val tail = "{\"tail\":\"" + line.replace("\"", "\\\"") + "\"}"
    assert(BenchGate.parseBuilds(tail)("cube_build") == 18.36)
    // and a gated artifact still yields a clean query baseline
    assert(BenchGate.parseQueries(line) == Map("q02_granule_gate" -> 0.76))
  }

  test("parseBuilds is immune to key-shaped text in the errors map") {
    // free-text error messages are unescaped by the same pass that
    // unescapes the tail; one containing the literal "gate": or a quoted
    // build-pair shape must neither shift the scan boundary nor
    // fabricate a baseline entry
    val line = """{"metric":"total","value":12.3,""" +
      """"queries":{"q02_granule_gate":0.76},""" +
      """"ivf_build":6.45,"cube_build":18.36,""" +
      """"errors":{"v05_sim_ivf":"IllegalStateException: parse near """ +
      """\"gate\": token; expected \"cube_build\":99.0 here"},""" +
      """"sf":"/root/testdata/sf0.1",""" +
      """"gate":{"prev":"x","factor":2.0,"regressions":{},""" +
      """"builds":{},"reruns":{"cube_build":2},"pass":true}}"""
    val b = BenchGate.parseBuilds(line)
    assert(b == Map("ivf_build" -> 6.45, "cube_build" -> 18.36), s"parsed: $b")
    // same when quote-escaped inside a driver tail field
    val tail = "{\"tail\":\"" + line.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\"}"
    assert(BenchGate.parseBuilds(tail)("cube_build") == 18.36)
  }

  test("report carries builds and reruns; a build regression fails the gate") {
    val r = BenchGate.report(Some("BENCH_local.json"), Map.empty,
      builds = Map("ivf_build" -> (8.0, 40.0)),
      reruns = Map("t08_ngram_jaccard" -> 2))
    assert(r.contains("\"pass\":false"), r)
    assert(r.contains("\"builds\":{\"ivf_build\":[8.0,40.0]}"), r)
    assert(r.contains("\"reruns\":{\"t08_ngram_jaccard\":2}"), r)
    // flagged-then-cleared is machine noise: reruns recorded, gate passes
    val noise = BenchGate.report(Some("x"), Map.empty, Map.empty,
      Map("c02_extract_metadata" -> 1))
    assert(noise.contains("\"pass\":true"), noise)
  }

  test("previousArtifact finds BENCH_SF1.json for an sf1 run, never cross-scale") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-gate-spec")
    def write(name: String, sf: String): Unit =
      Files.writeString(dir.resolve(name),
        s"""{"metric":"total","value":1.0,"queries":{"t01_text_stats":0.5},"sf":"$sf","gate":{}}""")
    try {
      write("BENCH_local.json", "/root/testdata/sf0.001")
      write("BENCH_SF1.json", "/tmp/graft-sf1/sf1")
      // an sf1 run skips the sf0.001 local artifact and adopts BENCH_SF1
      val sf1 = BenchGate.previousArtifact(dir.toString, "/tmp/graft-sf1/sf1")
      assert(sf1.map(_._1).contains("BENCH_SF1.json"), sf1.map(_._1))
      // an sf0.001 run adopts the local artifact, not the sf1 one
      val local =
        BenchGate.previousArtifact(dir.toString, "/root/testdata/sf0.001")
      assert(local.map(_._1).contains("BENCH_local.json"), local.map(_._1))
      // a third scale factor matches neither
      assert(BenchGate.previousArtifact(dir.toString,
        "/root/testdata/sf0.1").isEmpty)
    } finally {
      Files.list(dir).forEach(p => Files.delete(p))
      Files.delete(dir)
    }
  }

  test("the Families registry round-trips through the contract line parser") {
    // Bench serializes `<name>_build` fields from the registry and
    // parseBuilds' allowlist regex is generated from the same registry —
    // this locks the round trip so a new family cannot ship half-wired
    // (timed and emitted but silently dropped from the baseline).
    val names = Families.all.map(_.name)
    assert(names.distinct == names, s"duplicate family names: $names")
    val sigIdx = names.indexOf("sig")
    assert(sigIdx >= 0 && sigIdx < names.indexOf("textdup") &&
      names.indexOf("textdup") < names.indexOf("funnel"),
      s"dependency order sig -> textdup -> funnel violated: $names")
    val line = """{"metric":"total","value":1.0,"queries":{"q":0.1},""" +
      Families.all.zipWithIndex.map { case (f, i) =>
        s""""${f.field}":${i + 1}.5""" }.mkString(",") +
      ""","errors":{},"sf":"/x","gate":{}}"""
    val parsed = BenchGate.parseBuilds(line)
    assert(parsed == Families.all.zipWithIndex.map { case (f, i) =>
      f.field -> (i + 1.5) }.toMap, s"parsed: $parsed")
  }
}
