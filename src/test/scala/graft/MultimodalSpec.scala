package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal binary plumbing: the mapPartitions decode kernel agrees
  * with the SQL metadata projection wherever they overlap, handles NULL
  * payloads, and is deterministic. */
class MultimodalSpec extends SparkSpecBase {

  private def media = {
    val rows = Seq(
      Row(1L, "image", "hello world".getBytes("UTF-8")),
      Row(2L, "video", ("x" * 700).getBytes("UTF-8")),
      Row(3L, "audio", null)
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decode kernel produces stub dimensions matching the SQL arithmetic") {
    val got = Multimodal.decode(media).orderBy("media_id").collect()
    // n=11: width 64+11=75, height 64+77=141, image => 1 frame
    assert(got(0) == Row(1L, "image", 11, 75, 141, 1,
      "hello world".getBytes("UTF-8").zipWithIndex.map {
        case (b, i) => (b & 0xff).toLong * (i + 1) }.sum))
    // n=700: width 64+123=187, height 64+(4900%417)=64+310=374, video frames 1+700%240=221
    assert(got(1).getInt(3) == 64 + 700 % 577)
    assert(got(1).getInt(4) == 64 + (700 * 7) % 417)
    assert(got(1).getInt(5) == 1 + 700 % 240)
    // NULL payload decodes as empty
    assert(got(2) == Row(3L, "audio", 0, 64, 64, 1, 0L))
  }

  test("decode is deterministic across runs and partitionings") {
    val a = Multimodal.decode(media).orderBy("media_id").collect().toSeq
    val b = Multimodal.decode(media.repartition(5)).orderBy("media_id").collect().toSeq
    assert(a == b)
  }

  test("metadata projection drops the payload before any wide op (column pruning)") {
    val m = media
    val meta = m.select(col("media_id"), col("media_type"),
      octet_length(col("payload")).as("n_bytes"))
    assert(!meta.schema.fieldNames.contains("payload"))
    assert(meta.count() == 3)
  }
}
