package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.ops.Num.r6

/** Multimodal (opaque-binary) column handling (SURVEY.md §2.11): media
  * payloads travel as `binary` columns with typed metadata alongside; the
  * decode / feature-extract step is a per-partition kernel over the
  * binary bytes.
  *
  * The decode itself is a STUB — deterministic arithmetic on the payload
  * bytes standing in for a real image/audio codec (none is available in
  * this environment). Everything around it is real Spark plumbing: binary
  * column schema, partition-parallel `mapPartitions` kernel with an
  * explicit output Encoder, and a relational metadata projection that the
  * DuckDB oracle checks bit-for-bit.
  *
  * Scale posture: decode is embarrassingly parallel per row; the binary
  * column never shuffles (metadata-only projections prune it at the scan,
  * and the kernel output drops the payload before any wide operation).
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Media-record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Decoded-feature schema produced by [[decodeStub]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Deterministic stand-in for a media decoder: derives "dimensions",
    * "frame count" and a byte checksum from the payload. A real codec
    * drops in here without touching the surrounding plumbing — the
    * kernel's batch shape (Iterator[Row] => Iterator[Row], one partition
    * per task, payload pruned from the output) is the part that matters
    * at 100 TB. */
  def decodeStub(rows: Iterator[Row]): Iterator[Row] = rows.map { r =>
    val id = r.getLong(0)
    val mt = r.getString(1)
    val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
    val width = 64 + (n % 577)
    val height = 64 + ((n * 7) % 417)
    val frames = if (mt == "video") 1 + (n % 240) else 1
    Row(id, mt, n, width, height, frames, sum)
  }

  /** Library entry: decode a media DataFrame (schema [[mediaSchema]])
    * into per-item features, partition-parallel. */
  def decode(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("media_id", "media_type", "payload").mapPartitions(decodeStub)(enc)
  }

  /** Build a media relation from `documents` (text bytes as the opaque
    * payload — deterministic, so the oracle can reproduce it). */
  def mediaFromDocuments(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  // ---------------------------------------------------------------- x01
  /** Metadata projection over the binary payload — the SQL-expressible
    * face of the decode pipeline (byte length, digest, stub dimensions).
    * Matches [[decode]]'s arithmetic where the two overlap (n_bytes,
    * width, height, n_frames) — asserted by MultimodalSpec. */
  val mediaMeta: Q = (s, d) => {
    val m = mediaFromDocuments(s, d)
    m.select(
        col("media_id"), col("media_type"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"))
      .withColumn("width", lit(64) + col("n_bytes") % 577)
      .withColumn("height", lit(64) + (col("n_bytes") * 7) % 417)
      .withColumn("n_frames",
        when(col("media_type") === "video", lit(1) + col("n_bytes") % 240).otherwise(lit(1)))
      .orderBy("media_id")
  }

  val mediaMetaSql: String =
    """SELECT media_id, media_type, n_bytes, digest,
      |  64 + n_bytes % 577 AS width,
      |  64 + (n_bytes * 7) % 417 AS height,
      |  CASE WHEN media_type = 'video' THEN 1 + n_bytes % 240 ELSE 1 END AS n_frames
      |FROM (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |    md5(text) AS digest
      |  FROM documents)
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- x02
  /** Per-type feature aggregation over the decoded relation shape (what a
    * training-data curation job runs after decode). */
  val mediaTypeStats: Q = (s, d) => {
    val m = mediaFromDocuments(s, d)
      .select(col("media_id"), col("media_type"),
        octet_length(col("payload")).as("n_bytes"))
    m.groupBy("media_type")
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        r6(avg("n_bytes")).as("avg_bytes"),
        min("n_bytes").as("min_bytes"),
        max("n_bytes").as("max_bytes"))
      .orderBy("media_type")
  }

  val mediaTypeStatsSql: String =
    """SELECT media_type, count(*) AS n_items,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  0.0 + round(avg(n_bytes), 6) AS avg_bytes,
      |  min(n_bytes) AS min_bytes,
      |  max(n_bytes) AS max_bytes
      |FROM (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(octet_length(encode(text)) AS INT) AS n_bytes
      |  FROM documents)
      |GROUP BY media_type
      |ORDER BY media_type""".stripMargin

  // ---------------------------------------------------------------- x03
  /** Frame sampling: every 30th frame of each video expands to one row
    * with its frame index and byte range — the row shape a frame decoder
    * (mapPartitions kernel, [[decodeStub]]'s sibling) consumes. The
    * generated `sequence` is built and exploded inside the row (nothing
    * wide rides along), so the fan-out is shuffle-free and proportional
    * to the sampled—not total—frame count. */
  val frameSample: Q = (s, d) => {
    val m = mediaFromDocuments(s, d)
      .select(col("media_id"), col("media_type"),
        octet_length(col("payload")).as("n_bytes"))
      .filter(col("media_type") === "video")
      .withColumn("n_frames", lit(1) + col("n_bytes") % 240)
      .withColumn("frame_bytes", col("n_bytes") * 3)
    m.select(col("media_id"), col("n_frames"), col("frame_bytes"),
        explode(expr("sequence(0, n_frames - 1, 30)")).as("frame_idx"))
      .select(
        col("media_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx").cast("long") * col("frame_bytes")).as("byte_start"),
        ((col("frame_idx") + 1).cast("long") * col("frame_bytes") - 1).as("byte_end"))
      .orderBy("media_id", "frame_idx")
  }

  val frameSampleSql: String =
    """SELECT media_id, n_frames, CAST(g.f AS INT) AS frame_idx,
      |  CAST(g.f * frame_bytes AS BIGINT) AS byte_start,
      |  CAST((g.f + 1) * frame_bytes - 1 AS BIGINT) AS byte_end
      |FROM (
      |  SELECT doc_id AS media_id,
      |    1 + CAST(octet_length(encode(text)) AS INT) % 240 AS n_frames,
      |    CAST(octet_length(encode(text)) AS INT) * 3 AS frame_bytes
      |  FROM documents
      |  WHERE ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] = 'video'),
      |LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 30)) AS f) g
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- x04
  /** Resize planning: aspect-preserving fit of each image's stub
    * dimensions into a 224×224 training box — scale factor, output dims,
    * letterbox padding. The arithmetic half of a resize kernel (the
    * pixel-pushing half drops into [[decodeStub]]'s mapPartitions slot);
    * doing it relationally means the planner can batch/partition resize
    * work by output shape before any decoder runs. */
  val resizeDims: Q = (s, d) => {
    val m = mediaFromDocuments(s, d)
      .filter(col("media_type") === "image")
      .select(col("media_id"), octet_length(col("payload")).as("n_bytes"))
      .withColumn("width", lit(64) + col("n_bytes") % 577)
      .withColumn("height", lit(64) + (col("n_bytes") * 7) % 417)
    val scale = least(lit(224.0) / col("width"), lit(224.0) / col("height"))
    m.select(
        col("media_id"), col("width"), col("height"),
        r6(scale).as("scale"),
        round(col("width") * scale).cast("int").as("out_w"),
        round(col("height") * scale).cast("int").as("out_h"))
      .withColumn("pad_x", (lit(224) - col("out_w")) / lit(2).cast("int"))
      .withColumn("pad_y", (lit(224) - col("out_h")) / lit(2).cast("int"))
      .select(col("media_id"), col("width"), col("height"), col("scale"),
        col("out_w"), col("out_h"),
        col("pad_x").cast("int").as("pad_x"), col("pad_y").cast("int").as("pad_y"))
      .orderBy("media_id")
  }

  val resizeDimsSql: String =
    """SELECT media_id, width, height,
      |  0.0 + round(least(224.0 / width, 224.0 / height), 6) AS scale,
      |  CAST(round(width * least(224.0 / width, 224.0 / height)) AS INT) AS out_w,
      |  CAST(round(height * least(224.0 / width, 224.0 / height)) AS INT) AS out_h,
      |  CAST((224 - CAST(round(width * least(224.0 / width, 224.0 / height)) AS INT)) // 2 AS INT) AS pad_x,
      |  CAST((224 - CAST(round(height * least(224.0 / width, 224.0 / height)) AS INT)) // 2 AS INT) AS pad_y
      |FROM (
      |  SELECT doc_id AS media_id,
      |    64 + n_bytes % 577 AS width,
      |    64 + (n_bytes * 7) % 417 AS height
      |  FROM (
      |    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes
      |    FROM documents
      |    WHERE ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] = 'image'))
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- x05
  /** Training-sample manifest — the artifact a curation pipeline actually
    * ships: one row per training sample joining the text record (with
    * its exact-dedup keep flag), the media record (type + payload size),
    * and the embedding (with its L2 norm). The norm is a per-row
    * left-fold over the packed array (`aggregate` HOF — no explode, no
    * shuffle; both engines fold the same element order, so the double is
    * bit-identical). At 100 TB the three relations co-partition on the
    * sample id (bucketed tables), so the manifest builds with zero
    * repartitioning; here the joins are plain equi-joins on doc_id. */
  val trainingManifest: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (row_number().over(w) === 1).as("kept"))
    val media = mediaFromDocuments(s, d)
      .select(col("media_id").as("doc_id"), col("media_type"),
        octet_length(col("payload")).as("n_bytes"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"),
        r6(sqrt(expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
          .as("emb_norm"))
    docs.join(media, "doc_id").join(emb, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("media_type"),
        col("n_bytes"), col("kept"), col("emb_norm"))
      .orderBy("doc_id")
  }

  val trainingManifestSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS kept
      |  FROM documents
      |), media AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(octet_length(encode(text)) AS INT) AS n_bytes
      |  FROM documents
      |), emb AS (
      |  SELECT vec_id AS doc_id,
      |    0.0 + round(sqrt(list_reduce(
      |      list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (a, b) -> a + b)), 6) AS emb_norm
      |  FROM embeddings
      |)
      |SELECT d.doc_id, d.lang, d.n_chars, m.media_type, m.n_bytes, d.kept, e.emb_norm
      |FROM docs d
      |JOIN media m ON d.doc_id = m.doc_id
      |JOIN emb e ON d.doc_id = e.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- x06
  /** Deterministic train/val split assignment — the step after the x05
    * manifest and before shard writing: bucket = the first two hex
    * digits of md5(doc_id || salt) → 0..255, val = bucket < 26 (~10%).
    * Hash-based, so the assignment is stable under reprocessing,
    * independent of row order/partitioning, and re-saltable for a fresh
    * split — the properties a resumable 100 TB pipeline needs (a random()
    * split has none of them). Pure per-row projection: no shuffle. */
  def withSplit(docs: DataFrame, salt: String = "v1"): DataFrame =
    docs
      .withColumn("bucket", expr(
        s"CAST(conv(substring(md5(CAST(concat(CAST(doc_id AS STRING), ':$salt') AS BINARY)), 1, 2), 16, 10) AS INT)"))
      .withColumn("split", when(col("bucket") < 26, "val").otherwise("train"))

  /** Declared form: per-(language, split) stratification report — doc
    * count and within-language share, the table a curator reads to
    * confirm the hash split is proportional in every stratum before
    * shipping shards. The only exchanges are the small keyed aggregate
    * and the per-language window over (langs × 2) rows. */
  val trainValSplit: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    withSplit(Tables.documents(s, d))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        r6(col("n_docs").cast("double") /
          sum("n_docs").over(Window.partitionBy("lang"))))
      .orderBy("lang", "split")
  }

  val trainValSplitSql: String = {
    // hex→int spelled via instr (DuckDB has no conv): for digits d1 d2,
    // instr1*16 + instr2 - 17 = (d1)*16 + d2 — identical to Spark's conv
    def hexAt(i: Int) =
      s"instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || ':v1'), $i, 1))"
    s"""WITH tagged AS (
       |  SELECT lang,
       |    CASE WHEN ${hexAt(1)} * 16 + ${hexAt(2)} - 17 < 26
       |      THEN 'val' ELSE 'train' END AS split
       |  FROM documents
       |), counts AS (
       |  SELECT lang, split, count(*) AS n_docs FROM tagged GROUP BY lang, split
       |)
       |SELECT lang, split, n_docs,
       |  0.0 + round(CAST(n_docs AS DOUBLE)
       |        / sum(n_docs) OVER (PARTITION BY lang), 6) AS share
       |FROM counts
       |ORDER BY lang, split""".stripMargin
  }

  // ---------------------------------------------------------------- x07
  /** Exact media dedup by content digest — the t05/t09 dedup story
    * extended to the binary family: one digest per payload, lowest
    * media_id wins, copy count carried for the audit. Only the 16-byte
    * digest ever shuffles — at 100 TB, media dedup moves hashes, never
    * payload bytes (the digest projection prunes the binary column at
    * the scan, like every metadata query in this family). */
  val mediaDedup: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val m = mediaFromDocuments(s, d)
      .select(col("media_id"), col("media_type"),
        md5(col("payload")).as("digest"))
    m.withColumn("rn",
        row_number().over(Window.partitionBy("digest").orderBy("media_id")))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("digest")))
      .filter(col("rn") === 1)
      .select("media_id", "media_type", "digest", "n_copies")
      .orderBy("media_id")
  }

  val mediaDedupSql: String =
    """SELECT media_id, media_type, digest, n_copies FROM (
      |  SELECT media_id, media_type, digest,
      |    row_number() OVER (PARTITION BY digest ORDER BY media_id) AS rn,
      |    count(*) OVER (PARTITION BY digest) AS n_copies
      |  FROM (
      |    SELECT doc_id AS media_id,
      |      ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |      md5(text) AS digest
      |    FROM documents))
      |WHERE rn = 1
      |ORDER BY media_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "x07_media_dedup" -> mediaDedup,
    "x06_train_val_split" -> trainValSplit,
    "x01_media_meta" -> mediaMeta,
    "x02_media_type_stats" -> mediaTypeStats,
    "x03_frame_sample" -> frameSample,
    "x04_resize_dims" -> resizeDims,
    "x05_training_manifest" -> trainingManifest)

  val oracle: Map[String, String] = Map(
    "x07_media_dedup" -> mediaDedupSql,
    "x06_train_val_split" -> trainValSplitSql,
    "x01_media_meta" -> mediaMetaSql,
    "x02_media_type_stats" -> mediaTypeStatsSql,
    "x03_frame_sample" -> frameSampleSql,
    "x04_resize_dims" -> resizeDimsSql,
    "x05_training_manifest" -> trainingManifestSql)
}
