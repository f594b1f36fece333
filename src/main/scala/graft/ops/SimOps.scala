package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Num._

/** Similarity search over the `embeddings` table (`array<float>`, dim 64;
  * SURVEY.md §2.11 ext_sim_topk): brute-force cosine top-k as the
  * correctness baseline, a sign-bit LSH-bucketed variant as the scale
  * path, and label-level similarity statistics.
  *
  * Determinism: dot products and norms accumulate in DECIMAL(38,18)
  * (ops/Num.xsumHi) — order-independent and bit-identical across engines,
  * so the ranking (ORDER BY cosine DESC) cannot flip on a last-ulp
  * difference between Spark and the DuckDB oracle.
  *
  * Scale posture: the query side is broadcast (small k×dim relation), so
  * the big corpus scan never shuffles for the join; per-pair partial
  * aggregation combines map-side. The LSH variant prunes the candidate
  * space by sign-bucket equality before any arithmetic — the standard
  * random-hyperplane trick with coordinate hyperplanes.
  */
object SimOps {

  type Q = (SparkSession, String) => DataFrame

  /** Flattened (vec_id, i, v) oracle relation; i is 1-based, v double.
    * SQL-only: the Spark side works on the packed arrays throughout. */
  private val flatSql: String =
    """SELECT vec_id, g.i AS i, CAST(embedding[g.i] AS DOUBLE) AS v
      |FROM embeddings,
      |LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g""".stripMargin

  private val normsSql: String =
    s"""SELECT vec_id, sqrt(${xsumHiSql("v * v")}) AS nrm FROM f GROUP BY vec_id"""

  /** Oracle CTEs: DECIMAL-exact cosine of all (query, corpus) pairs for
    * queries `vec_id < nq`. */
  private def cosinesSql(nq: Int): String =
    s"""f AS (
       |$flatSql
       |), n AS (
       |$normsSql
       |), q AS (SELECT vec_id AS qid, i, v AS qv FROM f WHERE vec_id < $nq
       |), dots AS (
       |  SELECT q.qid, f.vec_id AS cid, ${xsumHiSql("q.qv * f.v")} AS dot
       |  FROM f JOIN q ON f.i = q.i AND f.vec_id <> q.qid
       |  GROUP BY q.qid, f.vec_id
       |), cos AS (
       |  SELECT dots.qid, dots.cid, dots.dot / (nq.nrm * nc.nrm) AS cosine
       |  FROM dots JOIN n nq ON dots.qid = nq.vec_id
       |            JOIN n nc ON dots.cid = nc.vec_id
       |)""".stripMargin

  /** DECIMAL-exact cosine over a candidate-pair relation carrying the two
    * packed arrays as `ea`/`eb`: zip, explode, accumulate dot and both
    * norms in DECIMAL(38,18) — the same float→double→decimal element
    * values the oracle sums, so the result is bit-identical to the
    * relational form at any parallelism. Run this on PRUNED pairs only;
    * the native graft_cosine prune upstream is what keeps the exploded
    * row count proportional to survivors, not the corpus. */
  private def exactCosine(pairs: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    pairs
      .select(keys :+ explode(arrays_zip(col("ea"), col("eb"))).as("z"): _*)
      .select(keys :+ col("z.ea").cast("double").as("va")
        :+ col("z.eb").cast("double").as("vb"): _*)
      .groupBy(keys: _*)
      .agg(
        xsumHi(col("va") * col("vb")).as("dot"),
        xsumHi(col("va") * col("va")).as("na"),
        xsumHi(col("vb") * col("vb")).as("nb"))
      .withColumn("cosine", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .drop("dot", "na", "nb")
  }

  // ---------------------------------------------------------------- v01
  /** Brute-force cosine top-5 per query vector (first 20 vectors).
    *
    * Two-stage exact top-k: the codegen'd native cosine ranks all
    * candidates in one broadcast pass over the packed arrays (the v04
    * hot path), a 3-candidate margin absorbs any double-vs-DECIMAL
    * rank jitter (accumulation gap ~1e-15 — a flip past the margin
    * would need 4 candidates within that gap), and the DECIMAL-exact
    * re-rank of the survivors reproduces the oracle's ranking bit for
    * bit. The corpus is never exploded dim× — only survivors are. */
  val simTopk: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("ea"))
    val wN = Window.partitionBy("qid").orderBy(col("ncos").desc, col("cid").asc)
    val cand = emb.select(col("vec_id").as("cid"), col("embedding").as("eb"))
      .crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("ncos", expr("graft_cosine(ea, eb)"))
      .withColumn("nrk", row_number().over(wN))
      .filter(col("nrk") <= 8)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    exactCosine(cand.select("qid", "cid", "ea", "eb"), Seq("qid", "cid"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), r6(col("cosine")).as("cosine"))
      .orderBy("qid", "rk")
  }

  val simTopkSql: String =
    s"""WITH ${cosinesSql(20)}
       |SELECT qid, rk, cid, 0.0 + round(cosine, 6) AS cosine FROM (
       |  SELECT qid, cid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
       |  FROM cos) t
       |WHERE rk <= 5
       |ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------- v02
  /** Sign-bit LSH top-3: bucket on the signs of coordinates (1, 8, 22) —
    * three coordinate hyperplanes — and rank only within the bucket. */
  val simLsh: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // Same two-stage shape as v01/v05: prune to the query's sign bucket,
    // rank with the native cosine over packed arrays (margin past k),
    // DECIMAL-exact re-rank of survivors only.
    val emb = Tables.embeddings(s, d)
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      (when(element_at(col("embedding"), 1) > 0f, 4).otherwise(0)
        + when(element_at(col("embedding"), 8) > 0f, 2).otherwise(0)
        + when(element_at(col("embedding"), 22) > 0f, 1).otherwise(0)).as("bucket"))
    val q = bucketed.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("bucket"), col("embedding").as("ea"))
    val wN = Window.partitionBy("qid").orderBy(col("ncos").desc, col("cid").asc)
    val cand = bucketed.select(col("vec_id").as("cid"), col("bucket"), col("embedding").as("eb"))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("ncos", expr("graft_cosine(ea, eb)"))
      .withColumn("nrk", row_number().over(wN))
      .filter(col("nrk") <= 6)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    exactCosine(cand.select("qid", "cid", "ea", "eb"), Seq("qid", "cid"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("rk"), col("cid"), r6(col("cosine")).as("cosine"))
      .orderBy("qid", "rk")
  }

  val simLshSql: String =
    s"""WITH b AS (
       |  SELECT vec_id,
       |    (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END)
       |    + (CASE WHEN embedding[8] > 0 THEN 2 ELSE 0 END)
       |    + (CASE WHEN embedding[22] > 0 THEN 1 ELSE 0 END) AS bucket
       |  FROM embeddings
       |), f0 AS (
       |$flatSql
       |), f AS (SELECT f0.vec_id, f0.i, f0.v, b.bucket FROM f0 JOIN b ON f0.vec_id = b.vec_id
       |), n AS (SELECT vec_id, sqrt(${xsumHiSql("v * v")}) AS nrm FROM f0 AS f GROUP BY vec_id
       |), q AS (SELECT vec_id AS qid, bucket, i, v AS qv FROM f WHERE vec_id < 20
       |), dots AS (
       |  SELECT q.qid, f.vec_id AS cid, ${xsumHiSql("q.qv * f.v")} AS dot
       |  FROM f JOIN q ON f.bucket = q.bucket AND f.i = q.i AND f.vec_id <> q.qid
       |  GROUP BY q.qid, f.vec_id
       |), cos AS (
       |  SELECT dots.qid, dots.cid, dots.dot / (nq.nrm * nc.nrm) AS cosine
       |  FROM dots JOIN n nq ON dots.qid = nq.vec_id
       |            JOIN n nc ON dots.cid = nc.vec_id
       |)
       |SELECT qid, rk, cid, 0.0 + round(cosine, 6) AS cosine FROM (
       |  SELECT qid, cid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
       |  FROM cos) t
       |WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------- v03
  /** Near-duplicate / similarity statistics per label pair (embedding
    * cosine near-dup shape): pair counts and max/avg cosine, plus the
    * count above a near-dup threshold.
    *
    * One codegen'd pass: the small query side (50 vectors + labels) is
    * broadcast against the packed corpus arrays and `graft_cosine`
    * evaluates per pair — no 64× posexplode, no (qid, cid) shuffle of
    * n·q·dim rows; the only exchange is the 100-group label aggregate,
    * map-side combined. Stats need every pair, so there is no prune
    * stage; determinism rests on the same contract v04 proved against
    * v01's DECIMAL oracle: the native double accumulation sits ~1e-15
    * from the oracle's exact cosine, far inside round-to-6 and the 0.35
    * threshold gap observed in the data. */
  val labelSimStats: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("label").as("label_a"),
        col("embedding").as("ea"))
    emb.select(col("vec_id").as("cid"), col("label").as("label_b"),
        col("embedding").as("eb"))
      .crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("ncos", expr("graft_cosine(ea, eb)"))
      .groupBy("label_a", "label_b")
      .agg(count(lit(1)).as("n_pairs"),
        r6(avg("ncos")).as("avg_cos"),
        r6(max("ncos")).as("max_cos"),
        sum(when(col("ncos") > 0.35, 1L).otherwise(0L)).as("n_near_dup"))
      .orderBy("label_a", "label_b")
  }

  val labelSimStatsSql: String =
    s"""WITH ${cosinesSql(50)}
       |SELECT la.label AS label_a, lb.label AS label_b,
       |  count(*) AS n_pairs,
       |  0.0 + round(avg(cosine), 6) AS avg_cos,
       |  0.0 + round(max(cosine), 6) AS max_cos,
       |  CAST(sum(CASE WHEN cosine > 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup
       |FROM cos
       |JOIN embeddings la ON cos.qid = la.vec_id
       |JOIN embeddings lb ON cos.cid = lb.vec_id
       |GROUP BY la.label, lb.label
       |ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------- v04
  /** Native-expression top-5: same semantics as v01 but through the
    * codegen'd graft_cosine Catalyst expression over the packed float
    * arrays — no explode, no join-key shuffle, one scan. This pure-native
    * scan is the bench/spec variant: SimSpec asserts its ranking agrees
    * with v01's DECIMAL pipeline. The declared v04 query entry is
    * [[simTopkNativeExact]], which hardens it with the same margin +
    * exact re-rank as v01 so the oracle hash cannot flip on a cosine
    * within ~1e-15 of a 6th-decimal rounding boundary. */
  val simTopkNative: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr("graft_cosine(qe, embedding)").as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), r6(col("cosine")).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** Oracle-declared form of the native path: hardening v04 with v01's
    * margin + DECIMAL-exact re-rank makes it the SAME two-stage plan, so
    * it is deliberately an alias rather than a copy — v01 already IS the
    * native prune + exact re-rank since round 3. The pure one-scan
    * native variant stays [[simTopkNative]], spec-compared against this
    * plan by SimSpec (ranking agreement) and available as the
    * no-re-rank latency reference. */
  val simTopkNativeExact: Q = simTopk

  // ---------------------------------------------------------------- v05
  /** IVF-style ANN, parameterized on `nprobe`: coarse-quantize every
    * vector to its nearest of 8 fixed centroids (vectors 100-107,
    * deterministic), then search the query's `nprobe` nearest cells —
    * the inverted-file scale path: the full-corpus scan happens once for
    * assignment; each query then touches ~nprobe/8 of the corpus. Cell
    * ranks use the native cosine (centroid gaps ~1e-2 dwarf the ~1e-15
    * native accumulation gap, so they cannot flip vs the oracle's exact
    * ranking); candidates get the native-rank margin + DECIMAL-exact
    * re-rank. A corpus vector lives in exactly one cell, so the probe
    * join cannot duplicate a (qid, cid) pair. */
  private def simIvfN(nprobe: Int): Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val cent = emb.filter(col("vec_id").between(100, 107))
      .select(col("vec_id").as("ccid"), col("embedding").as("ce"))
    val wA = Window.partitionBy("vec_id").orderBy(col("cosc").desc, col("ccid").asc)
    val ranked = emb.crossJoin(broadcast(cent))
      .withColumn("cosc", expr("graft_cosine(embedding, ce)"))
      .withColumn("arn", row_number().over(wA))
    val assigned = ranked.filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("ccid").as("cell"))
    val qprobe = ranked.filter(col("vec_id") < 20 && col("arn") <= nprobe)
      .select(col("vec_id").as("qid"), col("ccid").as("cell"),
        col("embedding").as("ea"))
    val wN = Window.partitionBy("qid").orderBy(col("ncos").desc, col("cid").asc)
    val cand = assigned.select(col("vec_id").as("cid"), col("cell"), col("embedding").as("eb"))
      .join(broadcast(qprobe), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("ncos", expr("graft_cosine(ea, eb)"))
      .withColumn("nrk", row_number().over(wN))
      .filter(col("nrk") <= 6)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    exactCosine(cand.select("qid", "cid", "ea", "eb"), Seq("qid", "cid"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("rk"), col("cid"), r6(col("cosine")).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** Oracle template for [[simIvfN]]: the same cell ranking (exact
    * DECIMAL cosines, row_number with the cid tie-break) and top-3. */
  private def simIvfNSql(nprobe: Int): String =
    s"""WITH f AS (
       |$flatSql
       |), n AS (
       |$normsSql
       |), cent AS (
       |  SELECT vec_id AS cid, i, v AS cv FROM f WHERE vec_id BETWEEN 100 AND 107
       |), adots AS (
       |  SELECT f.vec_id, cent.cid, ${xsumHiSql("f.v * cent.cv")} AS dot
       |  FROM f JOIN cent ON f.i = cent.i
       |  GROUP BY f.vec_id, cent.cid
       |), acos AS (
       |  SELECT adots.vec_id, adots.cid,
       |    adots.dot / (nv.nrm * nc.nrm) AS cosc
       |  FROM adots JOIN n nv ON adots.vec_id = nv.vec_id
       |             JOIN n nc ON adots.cid = nc.vec_id
       |), acr AS (
       |  SELECT vec_id, cid, row_number()
       |    OVER (PARTITION BY vec_id ORDER BY cosc DESC, cid ASC) AS arn
       |  FROM acos
       |), assign AS (
       |  SELECT vec_id, cid AS cell FROM acr WHERE arn = 1
       |), qcells AS (
       |  SELECT vec_id AS qid, cid AS cell FROM acr WHERE vec_id < 20 AND arn <= $nprobe
       |), fc AS (
       |  SELECT f.vec_id, f.i, f.v, assign.cell
       |  FROM f JOIN assign ON f.vec_id = assign.vec_id
       |), q AS (
       |  SELECT qc.qid, qc.cell, f.i, f.v AS qv
       |  FROM qcells qc JOIN f ON f.vec_id = qc.qid
       |), dots AS (
       |  SELECT q.qid, fc.vec_id AS cid, ${xsumHiSql("q.qv * fc.v")} AS dot
       |  FROM fc JOIN q ON fc.cell = q.cell AND fc.i = q.i AND fc.vec_id <> q.qid
       |  GROUP BY q.qid, fc.vec_id
       |), cos AS (
       |  SELECT dots.qid, dots.cid, dots.dot / (nq.nrm * nc.nrm) AS cosine
       |  FROM dots JOIN n nq ON dots.qid = nq.vec_id
       |            JOIN n nc ON dots.cid = nc.vec_id
       |)
       |SELECT qid, rk, cid, 0.0 + round(cosine, 6) AS cosine FROM (
       |  SELECT qid, cid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
       |  FROM cos) t
       |WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin

  val simIvf: Q = simIvfN(1)
  val simIvfSql: String = simIvfNSql(1)

  // ---------------------------------------------------------------- v07
  /** IVF ANN with nprobe=2 — the recall knob of the inverted-file path:
    * the query searches its TWO nearest centroid cells, trading ~2×
    * candidate arithmetic for recall on queries near a cell boundary.
    * Same pipeline as v05 ([[simIvfN]]), one parameter apart. */
  val simIvfProbe2: Q = simIvfN(2)
  val simIvfProbe2Sql: String = simIvfNSql(2)

  // ---------------------------------------------------------------- v06
  /** Embedding-cosine near-duplicate pairs over the WHOLE corpus: 4-bit
    * sign-LSH bucketing (16 buckets) prunes to same-bucket pairs before
    * any arithmetic — ~n²/16 candidate pairs instead of n² — then the
    * DECIMAL-exact cosine keeps pairs above the near-dup threshold,
    * keyed keeper-first (lower vec_id). This is the dedup-mining shape
    * (emit the pair list for a downstream keep/drop pass) where v02/v05
    * are the query-time ANN shapes; at 100 TB the bucket count scales
    * with corpus size and banding replaces single-probe bucketing. */
  val embedNearDup: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val sign = (c: Int, bit: Int) =>
      when(element_at(col("embedding"), c) > 0f, bit).otherwise(0)
    val bucketed = emb.select(col("vec_id"), col("label"), col("embedding"),
      (sign(1, 8) + sign(8, 4) + sign(22, 2) + sign(40, 1)).as("bucket"))
    // Prune: SHUFFLED same-bucket self-join on the PACKED arrays (both
    // sides exchange on the bucket key — neither side is ever broadcast,
    // so the corpus can be arbitrarily large; each reducer sees one
    // bucket's members and the codegen'd native cosine evaluates per
    // pair with no explode). The 1e-9 epsilon guard dwarfs the
    // double-vs-DECIMAL accumulation gap (~1e-15), so no true near-dup
    // can be pruned; false survivors die in the exact stage below.
    val cands = bucketed
      .join(bucketed.select(col("vec_id").as("dup_id"),
        col("label").as("label_b"), col("embedding").as("eb"),
        col("bucket")).hint("shuffle_hash"), Seq("bucket"))
      .filter(col("vec_id") < col("dup_id"))
      .filter(expr("graft_cosine(embedding, eb)") > 0.4 - 1e-9)
      .select(col("vec_id").as("keep_id"), col("dup_id"),
        (col("label") === col("label_b")).as("same_label"),
        col("embedding").as("ea"), col("eb"))
    // Verify: DECIMAL-exact cosine on the handful of survivors only —
    // the same element values (float → double → decimal(38,18)) the
    // oracle accumulates, so the >0.4 cut is bit-identical.
    cands
      .select(col("keep_id"), col("dup_id"), col("same_label"),
        explode(arrays_zip(col("ea"), col("eb"))).as("z"))
      .select(col("keep_id"), col("dup_id"), col("same_label"),
        col("z.ea").cast("double").as("va"), col("z.eb").cast("double").as("vb"))
      .groupBy("keep_id", "dup_id", "same_label")
      .agg(
        xsumHi(col("va") * col("vb")).as("dot"),
        xsumHi(col("va") * col("va")).as("na"),
        xsumHi(col("vb") * col("vb")).as("nb"))
      .select(col("keep_id"), col("dup_id"),
        (col("dot") / (sqrt(col("na")) * sqrt(col("nb")))).as("cosine"),
        col("same_label"))
      .filter(col("cosine") > 0.4)
      .select(col("keep_id"), col("dup_id"), r6(col("cosine")).as("cosine"),
        col("same_label"))
      .orderBy("keep_id", "dup_id")
  }

  val embedNearDupSql: String =
    s"""WITH b AS (
       |  SELECT vec_id, label,
       |    (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END)
       |    + (CASE WHEN embedding[8] > 0 THEN 4 ELSE 0 END)
       |    + (CASE WHEN embedding[22] > 0 THEN 2 ELSE 0 END)
       |    + (CASE WHEN embedding[40] > 0 THEN 1 ELSE 0 END) AS bucket
       |  FROM embeddings
       |), f0 AS (
       |$flatSql
       |), f AS (SELECT f0.vec_id, f0.i, f0.v, b.bucket FROM f0 JOIN b ON f0.vec_id = b.vec_id
       |), n AS (SELECT vec_id, sqrt(${xsumHiSql("v * v")}) AS nrm FROM f0 AS f GROUP BY vec_id
       |), dots AS (
       |  SELECT a.vec_id, c.vec_id AS bid, ${xsumHiSql("a.v * c.v")} AS dot
       |  FROM f a JOIN f c ON a.bucket = c.bucket AND a.i = c.i AND a.vec_id < c.vec_id
       |  GROUP BY a.vec_id, c.vec_id
       |), cos AS (
       |  SELECT dots.vec_id AS keep_id, dots.bid AS dup_id,
       |    dots.dot / (na.nrm * nb.nrm) AS cosine
       |  FROM dots JOIN n na ON dots.vec_id = na.vec_id
       |            JOIN n nb ON dots.bid = nb.vec_id
       |)
       |SELECT keep_id, dup_id, 0.0 + round(cosine, 6) AS cosine,
       |  la.label = lb.label AS same_label
       |FROM cos
       |JOIN embeddings la ON cos.keep_id = la.vec_id
       |JOIN embeddings lb ON cos.dup_id = lb.vec_id
       |WHERE cosine > 0.4
       |ORDER BY keep_id, dup_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "v06_embed_neardup" -> embedNearDup,
    "v01_sim_topk" -> simTopk,
    "v02_sim_lsh" -> simLsh,
    "v03_label_sim_stats" -> labelSimStats,
    "v04_sim_topk_native" -> simTopkNativeExact,
    "v05_sim_ivf" -> simIvf,
    "v07_sim_ivf_probe2" -> simIvfProbe2)

  val oracle: Map[String, String] = Map(
    "v06_embed_neardup" -> embedNearDupSql,
    "v01_sim_topk" -> simTopkSql,
    "v02_sim_lsh" -> simLshSql,
    "v03_label_sim_stats" -> labelSimStatsSql,
    "v04_sim_topk_native" -> simTopkSql,
    "v05_sim_ivf" -> simIvfSql,
    "v07_sim_ivf_probe2" -> simIvfProbe2Sql)
}
