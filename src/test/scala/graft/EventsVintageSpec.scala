package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The driver's `events.parquet` has shipped in two physical vintages:
  * INT64 TIMESTAMP(NANOS) (rounds ≤9's testdata; surfaces as epoch-nanos
  * LongType under `spark.sql.legacy.parquet.nanosAsLong`) and plain
  * `timestamp[us]` (the round-10 regeneration; surfaces as TIMESTAMP_NTZ
  * or TIMESTAMP depending on reader config). [[Tables.events]] must
  * yield the IDENTICAL frame from either — this spec is the regression
  * test for that adaptivity and the early warning for the next testdata
  * regeneration. It writes the same logical rows in all three loaded
  * shapes the loader can encounter (LongType nanos, TimestampType µs,
  * TimestampNTZType µs) and asserts value-identical results.
  */
class EventsVintageSpec extends SparkSpecBase {

  // 2021-03-04T05:06:07.123456 UTC in epoch-micros, plus a zero-of-day
  // and a sub-second-boundary neighbour — enough to catch a truncation
  // or timezone shift in any branch.
  private val micros = Seq(1614834367123456L, 1614816000000000L, 1614834367999999L)

  private def writeVintage(dir: String, tsType: DataType): Unit = {
    val mkTs: Long => Any = tsType match {
      case LongType => us => us * 1000L // epoch-nanos long (legacy vintage)
      case _: TimestampNTZType =>
        us => java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case _ => us => java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
    }
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, mkTs(us), (i % 2).toLong, s"type$i", i * 1.5, s"""{"k":$i}""")
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("Tables.events yields the identical frame from every ts vintage") {
    val base = Files.createTempDirectory("graft-vintage").toString
    val shapes = Seq[(String, DataType)](
      ("nanoslong", LongType),          // what the INT64-nanos vintage loads as
      ("micros", TimestampType),        // timestamp[us], isAdjustedToUTC
      ("microsntz", TimestampNTZType))  // timestamp[us] NTZ (round-10 driver data)
    val loaded = shapes.map { case (tag, tpe) =>
      val d = s"$base/$tag"
      writeVintage(d, tpe)
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType, s"$tag: ts dtype")
      assert(df.schema("ts_ns").dataType == LongType, s"$tag: ts_ns dtype")
      tag -> df.orderBy("event_id").collect().toSeq
    }
    val (refTag, ref) = loaded.head
    for ((tag, rows) <- loaded.tail)
      assert(rows == ref, s"$tag differs from $refTag")
    // and the loaded instants are the written ones, not a tz-shifted copy
    // (rows are ordered by event_id, which is the index into `micros`)
    assert(ref.map(r => r.getLong(2)) == micros.map(_ * 1000L))
    assert(ref.map(r => r.getTimestamp(1).toInstant.toEpochMilli) ==
      micros.map(_ / 1000L))
  }

  test("the driver's current testdata loads and the flagship smoke passes") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    assert(df.limit(5).count() > 0)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
