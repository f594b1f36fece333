package graft

import java.sql.Date
import graft.ops.Events

/** Window/event-detection semantics on the hand-authored scene series of
  * FIXTURES.md §B2 (reference quality.py:124-165): each classification
  * branch, the no-next-scene edge, and the first-scene edge. */
class EventsSpec extends SparkSpecBase {
  import spark.implicits._

  private def series(vals: (String, Double)*) =
    vals.map { case (d, v) => (Date.valueOf(d), v) }.toDF("day", "vmean")

  test("abrupt drop with recovery classifies transient_anomaly") {
    // 50 -> 44 (drop -6) -> 49 (recovery +5 > 2)
    val out = Events.detectDrops(series(
      "2024-01-01" -> 50.0, "2024-01-02" -> 44.0, "2024-01-03" -> 49.0))
      .select("date", "type").as[(String, String)].collect().toSeq
    assert(out == Seq("2024-01-02" -> "transient_anomaly"))
  }

  test("abrupt drop without recovery classifies possible_fire_or_harvest") {
    // 50 -> 44 -> 44.5 (recovery +0.5 < 2)
    val out = Events.detectDrops(series(
      "2024-01-01" -> 50.0, "2024-01-02" -> 44.0, "2024-01-03" -> 44.5))
      .select("date", "type").as[(String, String)].collect().toSeq
    assert(out == Seq("2024-01-02" -> "possible_fire_or_harvest"))
  }

  test("drop at the final scene classifies recent_event (quality.py:147-154)") {
    val out = Events.detectDrops(series(
      "2024-01-01" -> 50.0, "2024-01-02" -> 44.0))
      .select("date", "type", "value_after")
      .as[(String, String, Option[Double])].collect().toSeq
    assert(out == Seq(("2024-01-02", "recent_event", None)))
  }

  test("first scene never fires (no previous to diff against)") {
    val out = Events.detectDrops(series("2024-01-01" -> 10.0, "2024-01-02" -> 60.0))
      .count()
    assert(out == 0)
  }

  test("drop exactly at the threshold does not fire (strict <)") {
    val out = Events.detectDrops(series(
      "2024-01-01" -> 50.0, "2024-01-02" -> 47.0)) // diff == -3.0 == threshold
      .count()
    assert(out == 0)
  }

  test("value_before/during/after and drop are reported per the reference record shape") {
    val out = Events.detectDrops(series(
      "2024-01-01" -> 50.0, "2024-01-02" -> 40.0, "2024-01-03" -> 48.0))
      .select("value_before", "value_during", "value_after", "drop")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq((50.0, 40.0, 48.0, -10.0)))
  }

  test("linear gap-fill interpolates between neighbors, LOCF/NOCB at the edges") {
    val rows = Events.gapfillInterpQ(spark, "/root/testdata/sf0.01")
      .as[(String, Option[Double], Option[Double], Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    // kept days pass through untouched; every day is filled
    rows.foreach { case (day, kept, interp, isGap) =>
      assert(interp.isDefined, s"$day unfilled")
      if (!isGap) assert(kept == interp, s"$day kept value altered")
    }
    // each gap value lies within [min, max] of its surrounding kept
    // values — linear interpolation cannot overshoot its neighbors
    val keptIdx = rows.zipWithIndex.filter(!_._1._4).map(_._2)
    rows.zipWithIndex.filter(_._1._4).foreach { case ((day, _, Some(v), _), i) =>
      val prev = keptIdx.filter(_ < i).lastOption.map(j => rows(j)._3.get)
      val next = keptIdx.find(_ > i).map(j => rows(j)._3.get)
      val bounds = Seq(prev, next).flatten
      assert(v >= bounds.min - 1e-9 && v <= bounds.max + 1e-9,
        s"$day interpolated $v outside neighbor range $bounds")
    }
  }
}
