package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Contract pins for the round-15 text-pipeline additions: t22's
  * chunking geometry (window starts/sizes, tail handling, null/empty
  * degenerates), t23's integer ranking key, and t24's integer-exact
  * keep predicate (re-derived from md5 outside Spark, so the test
  * catches either engine drifting from the salted-hash contract). */
class TextQuerySpec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-textq").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t22 chunk windows: stride geometry, short tail kept, degenerates") {
    val words80 = (1 to 80).map(i => s"w$i").mkString(" ")
    val words5 = (1 to 5).map(i => s"w$i").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, words80, "en", "s", 80L),
      (1L, words5, "en", "s", 5L),
      (2L, "", "en", "s", 0L),
      (3L, null, "en", "s", 0L)))
    val out = TextOps.chunkWindows(spark, dir)
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq

    // 80 tokens at stride 24: starts 1,25,49,73; full windows except
    // the 8-token tail (which must be KEPT, not dropped)
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.map(_._3) == Seq(1, 25, 49, 73), s"wrong starts: $d0")
    assert(d0.map(_._4) == Seq(32, 32, 32, 8), s"wrong sizes: $d0")
    // consecutive windows overlap by ChunkTokens - ChunkStride tokens
    val (a, b) = (d0(0)._5.split(" "), d0(1)._5.split(" "))
    assert(a.takeRight(TextOps.ChunkTokens - TextOps.ChunkStride).toSeq ==
      b.take(TextOps.ChunkTokens - TextOps.ChunkStride).toSeq,
      "overlap tokens differ between consecutive chunks")
    // chunks cover every token exactly: new tokens per chunk sum to n
    assert(d0.head._4 + d0.tail.map(c =>
      c._4 - (TextOps.ChunkTokens - TextOps.ChunkStride)).sum == 80)

    // a doc shorter than one window is one (short) chunk
    assert(out.filter(_._1 == 1L) == Seq((1L, 0, 1, 5, words5)))
    // empty text splits to one empty token — one 1-token chunk
    assert(out.filter(_._1 == 2L) == Seq((2L, 0, 1, 1, "")))
    // null text emits no chunks (matches the oracle's unnest-of-null)
    assert(!out.exists(_._1 == 3L), "null-text doc must emit no chunks")
  }

  test("t23 keywords: integer ranking key (tf desc, df asc, term asc)") {
    // d0's terms all tf=1 with distinct corpus df: rank must follow
    // rarity then term text, never the float tfidf
    val dir = writeDocs(Seq(
      (0L, "common mid rare", "en", "s", 15L),
      (1L, "common mid", "en", "s", 10L),
      (2L, "common common zz zz zz", "en", "s", 22L)))
    val out = TextOps.docKeywords(spark, dir)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    // df: common=3, mid=2, rare=1, zz=1
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.map(_._3) == Seq("rare", "mid", "common"),
      s"rarity tie-break violated: $d0")
    // d2: zz bursts (tf=3) above common (tf=2) regardless of df
    val d2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(t => (t._3, t._4)) == Seq(("zz", 3L), ("common", 2L)),
      s"tf must dominate the ranking: $d2")
    // annotation matches the smoothed formula at N=3 docs
    val rare = d0.head
    val want = BigDecimal(1.0 * math.log(4.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rare._6 == want, s"tfidf annotation ${rare._6} != $want")
    // never more than TopK rows per doc, ranks contiguous from 1
    out.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.size <= TextOps.KeywordTopK)
      assert(rows.map(_._2).sorted == (1 to rows.size), s"ranks broken for $id")
    }
  }

  test("t24 mixture rebalance: integer-exact keep predicate, under-budget keeps all") {
    // source A: 10 docs x 100 tokens (over equal share -> downsample);
    // source B: 10 docs x 10 tokens (under share -> keep everything)
    val tokA = (1 to 100).map(i => s"a$i").mkString(" ")
    val tokB = (1 to 10).map(i => s"b$i").mkString(" ")
    val rows = (0L until 10L).map(i => (i, tokA, "en", "A", 500L)) ++
      (10L until 20L).map(i => (i, tokB, "en", "B", 50L))
    val dir = writeDocs(rows)
    val out = TextOps.mixtureRebalance(spark, dir)
      .as[(Long, String, Int, Double, Boolean)].collect().toSeq
    assert(out.size == 20)

    // re-derive the contract outside Spark: u16 = first 4 hex digits of
    // md5("<doc_id>:mix-v1"); kept iff u16*nsrc*src_tokens < 65536*tot
    def u16(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:mix-v1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(4), 16)
    }
    val (tot, nsrc) = (1100L, 2L)
    out.foreach { case (id, src, u, w, kept) =>
      assert(u == u16(id), s"doc $id hash mismatch: $u != ${u16(id)}")
      val srcTokens = if (src == "A") 1000L else 100L
      assert(kept == (u.toLong * nsrc * srcTokens < 65536L * tot),
        s"doc $id keep verdict drifted from the integer contract")
      val wantW = BigDecimal(tot.toDouble / (nsrc * srcTokens))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(w == wantW, s"doc $id mix_weight $w != $wantW")
    }
    // the under-budget source must keep every document
    assert(out.filter(_._2 == "B").forall(_._5),
      "under-budget source lost documents")
    // the over-budget source sheds at least one on this fixed hash set
    assert(out.filter(_._2 == "A").exists(!_._5),
      "over-budget source kept everything — threshold dead")
  }

  test("t25 chunk pack: shards account for every t22 window, in order") {
    val words80 = (1 to 80).map(i => s"w$i").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, words80, "en", "s", 80L),
      (1L, "x y z", "en", "s", 5L),
      (2L, null, "en", "s", 0L)))
    val chunks = TextOps.chunkWindows(spark, dir)
      .agg(count(lit(1)), sum("n_chunk_tokens")).head()
    val shards = TextOps.chunkPack(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // every window lands in exactly one shard; token mass conserved
    assert(shards.map(_._2).sum == chunks.getLong(0),
      s"chunk count drifted through the packer: $shards")
    assert(shards.map(_._3).sum == chunks.getLong(1),
      s"token mass lost through the packer: $shards")
    // shard ids contiguous from 0, doc spans monotone
    assert(shards.map(_._1) == shards.indices.map(_.toLong),
      s"shard ids not contiguous: $shards")
    assert(shards.sliding(2).forall {
      case Seq(a, b) => a._5 <= b._4 || a._4 <= b._4
      case _ => true
    }, s"shard doc spans out of order: $shards")
  }

  test("t18/t24 census skips null texts like SQL sum (legacy sizeOfNull guard)") {
    // one null-text doc per source: without the isNotNull guard Spark's
    // size(split(NULL)) = -1 would subtract one token per null doc from
    // the census while DuckDB's sum skips the NULL row entirely
    val tok4 = "a b c d"
    val dir = writeDocs(Seq(
      (0L, tok4, "en", "A", 7L), (1L, tok4, "en", "A", 7L),
      (2L, null, "en", "A", 0L),
      (3L, "x y", "en", "B", 3L), (4L, null, "en", "B", 0L)))
    val mix = TextOps.sourceMixture(spark, dir)
      .select("source", "n_docs", "n_tokens")
      .as[(String, Long, Long)].collect()
      .map { case (s, nd, nt) => s -> ((nd, nt)) }.toMap
    assert(mix("A") == ((3L, 8L)), s"source A census drifted: $mix")
    assert(mix("B") == ((2L, 2L)), s"source B census drifted: $mix")
    val out = TextOps.mixtureRebalance(spark, dir)
      .as[(Long, String, Int, Double, Boolean)].collect().toSeq
    // every doc (null texts included) gets a verdict row, and the
    // mix_weight derives from the NULL-skipping census: tot=10, nsrc=2,
    // A=8 tokens, B=2 tokens
    assert(out.size == 5, s"null-text docs dropped from the verdict: $out")
    assert(out.filter(_._2 == "A").forall(_._4 == 0.625), s"A weight: $out")
    assert(out.filter(_._2 == "B").forall(_._4 == 2.5), s"B weight: $out")
  }

  /** t26's salted 16-bit uniform, re-derived outside Spark (the t24
    * pattern: the test catches either engine drifting from the hash
    * contract, not just the two agreeing with each other). */
  private def quotaU16(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:quota-v1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(hex.take(4), 16)
  }

  test("t26 quota sample: exact per-source quota, boundary cut inside a collision bucket") {
    // big source: 2000 docs — at 2^16 hash values that corpus carries
    // ~30 u16-collision pairs, so multi-doc buckets exist. Place the
    // quota ON the first collision bucket's FIRST member (and not its
    // second): the threshold bucket then has >1 doc and the residual
    // keeps a strict subset of it, exercising the doc_id tie-break arm
    // (u16 == t && brn <= resid), not just the u16 < t bulk arm.
    val bigIds = (0L until 2000L).toSeq
    val ordered = bigIds.map(id => (quotaU16(id), id)).sorted
    val secondIdx = ordered.indices.drop(1)
      .find(i => ordered(i)._1 == ordered(i - 1)._1)
      .getOrElse(sys.error("no u16 collision in 2000 ids — salt drifted?"))
    val quota = secondIdx // = 1-based rank of the bucket's FIRST member
    assert(quota < 2000, "collision cut must land strictly inside big")
    val smallIds = (100000L until (100000L + quota)).toSeq
    val dir = writeDocs((bigIds.map((_, "big")) ++ smallIds.map((_, "small")))
      .map { case (id, src) => (id, s"doc $id", "en", src, 6L) })

    val out = TextOps.quotaSample(spark, dir)
      .as[(Long, String, Int, Long, Long)].collect().toSeq
    assert(out.forall(_._5 == quota), s"quota column wrong: ${out.take(3)}")

    // brute-force expectation: per source, the quota smallest (u16, id)
    def expect(ids: Seq[Long], src: String) =
      ids.map(id => (quotaU16(id), id)).sorted.take(quota).zipWithIndex
        .map { case ((u, id), i) => (id, src, u, (i + 1).toLong, quota.toLong) }
    val want = (expect(bigIds, "big") ++ expect(smallIds, "small"))
      .sortBy(_._1)
    assert(out.sortBy(_._1) == want,
      s"kept set drifted: got ${out.size} rows, want ${want.size}")
    // the small source (the minimum) keeps everything; big keeps quota
    assert(out.count(_._2 == "small") == quota)
    assert(out.count(_._2 == "big") == quota)
    // the boundary bucket really was multi-doc and really was split
    val t = ordered(secondIdx)._1
    val bucketAll = bigIds.count(quotaU16(_) == t)
    val bucketKept = out.count(r => r._2 == "big" && r._3 == t)
    assert(bucketAll >= 2 && bucketKept >= 1 && bucketKept < bucketAll,
      s"boundary bucket not split: all=$bucketAll kept=$bucketKept")
  }
}
