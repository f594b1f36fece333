package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the per-document 16-bit SimHash behind t07 and
  * the textdup artifact's `simhash/` table — one in-row pass over the
  * text: tokenize on single spaces (trailing empties kept, the
  * split-at-limit−1 contract), md5 each token occurrence, vote ±1 per
  * hex nibble of the first 8 digest bytes (+1 when the nibble's high
  * bit is set — the '8'..'f' rule), emit Σ (vote_j > 0 ? 1<<j : 0).
  *
  * Bit-identical to the relational spelling it replaces
  *
  *   explode(toks) → md5(tok) → groupBy(doc_id)
  *     agg(Σ_j when(sum(±1 by substring(h, j+1, 1)) > 0, 1<<j))
  *
  * because md5 of the token's UTF-8 bytes and the nibble test are the
  * same arithmetic, and the per-doc vote sums are plain integer
  * addition. NULL text returns NULL (the exploded form simply produced
  * no rows for such docs — consumers filter the NULLs to keep the row
  * set identical). Removes the corpus-token explode and the doc-keyed
  * aggregation exchange from the build/append paths: the table becomes
  * a pure projection.
  *
  * `pinned = true` — the Sq8Code non-determinism pin (single
  * evaluation; no substitution into pushed-down filters).
  */
case class SimHash16(child: Expression, pinned: Boolean = false)
    extends UnaryExpression {

  override lazy val deterministic: Boolean = !pinned

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash16"

  override protected def nullSafeEval(a: Any): Any =
    SimHash16.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash16.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild, pinned = pinned)
}

object SimHash16 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared eval/codegen kernel (non-null input). */
  def compute(text: UTF8String): Int = {
    val s = text.toString
    val digest = md.get()
    val acc = new Array[Int](16)
    val n = s.length
    var from = 0
    var done = false
    while (!done) {
      val idx = s.indexOf(' ', from)
      val end = if (idx < 0) n else idx
      digest.reset()
      val d = digest.digest(
        s.substring(from, end).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 16) {
        val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
        if (nib >= 8) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      if (idx < 0) done = true else from = idx + 1
    }
    var r = 0
    var j = 0
    while (j < 16) { if (acc(j) > 0) r |= 1 << j; j += 1 }
    r
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash16].getName, "graft_simhash16")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_simhash16 takes exactly 1 argument")
    SimHash16(args.head)
  }
}
