package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expression: EXACT decimal-accumulated dot product of two
  * packed vectors, returned as double — the in-row spelling of
  * `xsumHi(v * c)` (ops/Num.scala).
  *
  * Bit-for-bit contract with the relational form the oracles compute:
  * each element pair multiplies in IEEE double, casts to DECIMAL(38,18)
  * exactly as Spark's double→decimal cast does (`BigDecimal.valueOf`,
  * i.e. `Double.toString`, then scale-18 HALF_UP), accumulates through
  * exact BigDecimal addition (order-independent, no precision cap —
  * a plain SQL higher-order `aggregate` can NOT express this: decimal
  * `+` is statically capped at (38,17), silently dropping the 18th
  * digit), and converts once at the end via `BigDecimal.doubleValue`
  * (correctly rounded, the same path as Spark's Decimal→double cast).
  * So `graft_dot_exact(x, y)` == `CAST(SUM(CAST(x_i*y_i AS
  * DECIMAL(38,18))) AS DOUBLE)` over the flattened pairs, at any row
  * order and any parallelism — without the explode, join, aggregation
  * exchange and window the flattened form pays.
  *
  * Null semantics mirror graft_cosine: NULL if either array is NULL or
  * lengths differ; element NULLs contribute nothing (SUM skips the
  * NULL-valued product rows in the relational form). A product that the
  * double→DECIMAL(38,18) cast cannot represent — non-finite, or ≥1e20
  * in magnitude so its scale-18 decimal exceeds 38 digits — likewise
  * contributes nothing (the relational form's non-ANSI cast yields NULL
  * for it and SUM skips the row; engine vectors are unit-scale floats,
  * so this only triggers on user-supplied pathological input, which must
  * degrade like the SQL spelling instead of throwing). If NO pair
  * contributes (empty arrays, all-null, all unrepresentable) the result
  * is NULL — SUM over zero rows.
  *
  * Not codegen'd (CodegenFallback): consumers evaluate it O(margin)
  * times per row on model-pruned candidates — the hot full-k loop stays
  * with the codegen'd [[CosineSimilarity]] prune.
  */
case class ExactDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_exact requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_exact"

  private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private val leftIsFloat = () =>
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private val rightIsFloat = () =>
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = leftIsFloat()
    val yf = rightIsFloat()
    var sum: java.math.BigDecimal = java.math.BigDecimal.ZERO.setScale(18)
    var terms = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val p = elem(x, xf, i) * elem(y, yf, i)
        if (java.lang.Double.isFinite(p)) {
          val d = java.math.BigDecimal.valueOf(p)
            .setScale(18, java.math.RoundingMode.HALF_UP)
          // precision > 38 == the (38,18) cast overflows → NULL → skipped
          if (d.precision <= 38) { sum = sum.add(d); terms += 1 }
        }
      }
      i += 1
    }
    if (terms == 0) null else sum.doubleValue()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactDot =
    copy(left = newLeft, right = newRight)
}

object ExactDot {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ExactDot].getName, "graft_dot_exact")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_dot_exact takes exactly 2 arguments")
    ExactDot(args.head, args(1))
  }
}
