package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expression: the pure-integer ADC dot of two SQ8 code arrays —
  * the codegen'd spelling of
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)`.
  *
  * The SQL higher-order form evaluates an interpreted lambda per element
  * per candidate×query pair — the exact non-codegen hot-path cost the
  * ADC serve exists to avoid (v16 scores every corpus row against every
  * query). This expression runs the multiply-accumulate loop inside
  * whole-stage codegen over the packed `array<bigint>`s.
  *
  * Bit-for-bit contract with the HOF spelling it replaces: NULL if
  * either array is NULL; NULL if the lengths differ (zip_with pads the
  * shorter side with NULLs, the null product poisons the fold) or any
  * element is NULL (same poisoning); otherwise the sum of products in
  * Java long arithmetic (wrapping, like Spark's non-ANSI Multiply/Add);
  * two empty arrays fold to the initial 0.
  */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_adc_dot requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)
}

object AdcDot {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[AdcDot].getName, "graft_adc_dot")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_adc_dot takes exactly 2 arguments")
    AdcDot(args.head, args(1))
  }
}

/** Native expression: SQ8 quantization codes at the fixed scale 127 —
  * the one-pass in-row spelling of the v16 code derivation
  *
  *   nrm  = sqrt(graft_dot_exact(e, e))     -- exact DECIMAL(38,18) norm
  *   code = transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / nrm,
  *                                       0) AS BIGINT))
  *   ... kept only where nrm > 0
  *
  * collapsed into a single native loop: NULL when the norm is NULL (no
  * contributing element — the flatten form's inner join dropped such
  * rows) or not strictly positive (the nrm > 0 gate), so the consumer
  * filters `isNotNull` instead of joining a norm relation back. The
  * norm accumulates per element through the identical path as
  * [[ExactDot]] (IEEE double square → BigDecimal.valueOf → scale-18
  * HALF_UP → exact add → doubleValue), and each code replicates Spark's
  * Round(double, 0) (NaN/Infinity pass through; else
  * BigDecimal.valueOf(x).setScale(0, HALF_UP).toDouble) followed by the
  * non-ANSI double→long cast. Element NULLs quantize to NULL (transform
  * maps NULL to NULL) while contributing nothing to the norm (the
  * flattened SUM skipped them).
  *
  * This removes the corpus posexplode, the norm aggregation exchange
  * and the norm join-back from the ADC scan — the quantize step becomes
  * a pure projection over the packed array.
  *
  * `pinned = true` (the DataFrame path's instance) marks the expression
  * non-deterministic so the optimizer cannot substitute it into a
  * pushed-down `IS NOT NULL` filter — which would evaluate the whole
  * BigDecimal loop TWICE per corpus row, once below and once above the
  * parallelism exchange (the guide's duplicated-UDF trap). The
  * evaluation is in fact pure; the flag only pins it to its projection.
  * Consumers must pre-filter their input relation (not the code column)
  * since deterministic predicates no longer push below this projection.
  */
case class Sq8Code(child: Expression, pinned: Boolean = false)
    extends UnaryExpression {

  override lazy val deterministic: Boolean = !pinned

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_code requires array<float|double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq8_code"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    Sq8Code.compute(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sq8")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.Sq8Code.compute($a, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Code =
    copy(child = newChild, pinned = pinned)
}

object Sq8Code {
  /** Shared eval/codegen kernel; returns null for the no-norm/zero-norm
    * rows the relational spelling dropped. */
  def compute(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var sum: java.math.BigDecimal = java.math.BigDecimal.ZERO.setScale(18)
    var terms = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val p = v * v
        if (java.lang.Double.isFinite(p)) {
          val d = java.math.BigDecimal.valueOf(p)
            .setScale(18, java.math.RoundingMode.HALF_UP)
          // precision > 38 == the (38,18) cast overflows → NULL → skipped
          if (d.precision <= 38) { sum = sum.add(d); terms += 1 }
        }
      }
      i += 1
    }
    if (terms == 0) return null
    val nrm = math.sqrt(sum.doubleValue())
    if (!(nrm > 0)) return null
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val r = v * 127.0 / nrm
        // Spark Round(double, 0): non-finite passes through; the
        // following non-ANSI double→long cast is the Java (long) cast
        val rounded =
          if (java.lang.Double.isNaN(r) || java.lang.Double.isInfinite(r)) r
          else java.math.BigDecimal.valueOf(r)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        out(i) = rounded.toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Sq8Code].getName, "graft_sq8_code")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_sq8_code takes exactly 1 argument")
    Sq8Code(args.head)
  }
}
