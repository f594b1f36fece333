package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the 8-permutation MinHash signature behind the
  * sig@ artifact — one in-row pass over the text: tokenize on single
  * spaces, md5 each 3-token shingle once, and track the minima of the
  * eight overlapping 16-hex-char digest windows (offset 2i, the
  * engine's cheap-permutation scheme). Returns
  * struct(s0..s7: string), each NULL when no complete shingle exists
  * (documents under 3 tokens — the relational form's OOB
  * try_element_at made such shingles NULL and array_min skipped them).
  *
  * Bit-identical to the replaced spelling — transform(sequence(...))
  * building the md5 array, then EIGHT more interpreted
  * array_min(transform(substring)) passes per row: same shingle
  * strings (space-joined tokens), same lowercase-hex md5, and min over
  * ASCII hex substrings is plain byte-lexicographic order on both
  * paths. One native loop replaces nine interpreted HOF evaluations
  * per document.
  *
  * `pinned = true` — the Sq8Code non-determinism pin (single
  * evaluation; consumers pre-filter their inputs).
  */
case class MinHash8(child: Expression, pinned: Boolean = false)
    extends UnaryExpression {

  override lazy val deterministic: Boolean = !pinned

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash8 requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = StructType(
    (0 until 8).map(i => StructField(s"s$i", StringType, nullable = true)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash8"

  override protected def nullSafeEval(a: Any): Any =
    MinHash8.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHash8.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MinHash8 =
    copy(child = newChild, pinned = pinned)
}

object MinHash8 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** Shared eval/codegen kernel (non-null input): struct of 8 window
    * minima, fields null when the doc has no complete 3-token shingle. */
  def compute(text: UTF8String): InternalRow = {
    val ts = text.toString.split(" ", -1)
    val n = ts.length
    val mins = new Array[String](8)
    val digest = md.get()
    var g = 0
    val lastStart = n - 3
    while (g <= lastStart) {
      digest.reset()
      val d = digest.digest((ts(g) + " " + ts(g + 1) + " " + ts(g + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = HexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = HexChars(d(b) & 0xf)
        b += 1
      }
      var i = 0
      while (i < 8) {
        val w = new String(hex, i * 2, 16)
        if (mins(i) == null || w.compareTo(mins(i)) < 0) mins(i) = w
        i += 1
      }
      g += 1
    }
    new GenericInternalRow(mins.map(m =>
      if (m == null) null else UTF8String.fromString(m): Any))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHash8].getName, "graft_minhash8")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_minhash8 takes exactly 1 argument")
    MinHash8(args.head)
  }
}
