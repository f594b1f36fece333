package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass k-permutation MinHash signature as a typed Aggregator — the
  * custom-UDAF form of ops/TextOps.signatures (which spells the same
  * computation as 8 built-in min() aggregates). One pass hashes each
  * shingle once and folds all k window minima in a single buffer, halving
  * the aggregation columns and keeping the whole signature build inside
  * one partial-aggregate pass at 100 TB (SURVEY.md §2.11: extension
  * operators are where custom Aggregators first become justified).
  *
  * Semantics are identical to the SQL form (TextOpsAggSpec asserts it):
  * permutation i is the lexicographic min over shingles of the 16-char
  * window of md5 hex starting at offset 2*i.
  */
object MinHashAgg extends Aggregator[String, Array[String], Array[String]] {

  val K = 8

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def zero: Array[String] = Array.fill(K)(null)

  override def reduce(b: Array[String], shingle: String): Array[String] = {
    if (shingle != null) {
      val h = md5hex(shingle)
      var i = 0
      while (i < K) {
        val w = h.substring(i * 2, i * 2 + 16)
        if (b(i) == null || w < b(i)) b(i) = w
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < K) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(r: Array[String]): Array[String] = r

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
