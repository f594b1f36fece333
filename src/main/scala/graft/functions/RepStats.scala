package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the per-document repetition census behind t16 /
  * the funnel's k4 gate — one in-row pass over the text computing
  *
  *   n_tri   = count of trigrams          (token count − 2)
  *   n_tri_d = count of DISTINCT trigrams
  *   n_big   = count of bigrams           (token count − 1)
  *   top_big = occurrences of the most frequent bigram
  *
  * as a struct, NULL for NULL text or documents under 3 tokens (the
  * relational form's `len(ts) >= 3` gram filters plus its tri ⋈ big
  * inner join dropped exactly those docs).
  *
  * The replaced r15 plan exploded every document into its gram rows and
  * paid two token-count-sized keyed exchanges — (doc_id) for the
  * trigram distinct and (doc_id, gram) for the bigram top count. The
  * r15 scaladoc's measured rejection of the in-row HOF spelling (3.7×
  * worse at the 100× probe) was about CodegenFallback lambda
  * interpretation, not in-row evaluation: this expression runs the
  * tokenize + hash-census loop natively, so the whole gate becomes one
  * projection with zero exchanges.
  *
  * Exactness: grams here are the same space-joined token strings the
  * relational form concatenated (tokens cannot contain the join char,
  * so string identity == token-tuple identity); counts are plain longs.
  * Tokenization is `split(text, ' ')` with trailing empties kept —
  * Java's split(regex, -1), the same contract as Spark's StringSplit
  * at limit −1.
  *
  * `pinned = true` (the DataFrame path) marks the instance
  * non-deterministic so the optimizer can neither substitute the heavy
  * census into pushed-down filters nor inline it once per consuming
  * column (the Sq8Code pattern — see that scaladoc); evaluation is in
  * fact pure.
  */
case class RepStats(child: Expression, pinned: Boolean = false)
    extends UnaryExpression {

  override lazy val deterministic: Boolean = !pinned

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("n_tri_d", LongType, nullable = false),
    StructField("n_big", LongType, nullable = false),
    StructField("top_big", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_rep_stats"

  override protected def nullSafeEval(a: Any): Any =
    RepStats.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("rep")
      s"""
         |InternalRow $r = graft.functions.RepStats.compute($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild, pinned = pinned)
}

object RepStats {
  /** Shared eval/codegen kernel; null for < 3 tokens. */
  def compute(text: UTF8String): InternalRow = {
    val ts = text.toString.split(" ", -1)
    val n = ts.length
    if (n < 3) return null
    val tri = new java.util.HashSet[String]((n * 2) max 16)
    var i = 0
    while (i <= n - 3) {
      tri.add(ts(i) + " " + ts(i + 1) + " " + ts(i + 2))
      i += 1
    }
    val big = new java.util.HashMap[String, Integer]((n * 2) max 16)
    var top = 0
    i = 0
    while (i <= n - 2) {
      val c = big.merge(ts(i) + " " + ts(i + 1), Integer.valueOf(1),
        (x, y) => Integer.valueOf(x.intValue() + y.intValue()))
      if (c.intValue() > top) top = c.intValue()
      i += 1
    }
    new GenericInternalRow(Array[Any](
      (n - 2).toLong, tri.size.toLong, (n - 1).toLong, top.toLong))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RepStats].getName, "graft_rep_stats")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_rep_stats takes exactly 1 argument")
    RepStats(args.head)
  }
}
