package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expression: the per-vector int8 round-trip error census
  * behind v11 (scalar quantization) and v13 (residual quantization) —
  * one in-row pass computing, over the element values `v_i` (one-arg
  * form: the array's float→double elements; two-arg form: the residual
  * `a_i − b_i` the v13 zip_with produced),
  *
  *   m    = max(abs(v_i))                     (nulls skipped)
  *   err_i = abs(v_i − round(v_i·127/m, 0)·m/127)
  *   dsum = SUM(CAST(err_i AS DECIMAL(38,18)))  (exact; nulls /
  *          unrepresentable skipped — the xsumHi contract)
  *   dmax = max(err_i)
  *   n    = element count (INCLUDING null elements — the flattened
  *          form's count(lit(1)) counted every exploded row)
  *
  * returned as struct(dsum, dmax, n), or NULL when m is NULL or ≤ 0
  * (the relational form's `m > 0` vector gate). Per-label / per-cell
  * aggregation then reduces these exact per-row partials:
  * SUM(dsum) == the flattened xsumHi total (decimal addition is exact
  * and associative), MAX(dmax) == max(err), SUM(n) == count(*).
  *
  * Replaces v11's flatten → per-vector max join-back → label join
  * (three corpus exchanges) and v13's transform/zip_with HOF chain +
  * err explode with a single projection; rounding replicates Spark's
  * Round(double, 0) exactly (BigDecimal.valueOf, HALF_UP; non-finite
  * passes through).
  *
  * `pinned = true` — the Sq8Code non-determinism pin (see that
  * scaladoc): the census must evaluate once per row, never be
  * substituted into pushed-down filters or inlined per consumer.
  */
case class Q8Err(children: Seq[Expression], pinned: Boolean = false)
    extends Expression with CodegenFallback {

  override lazy val deterministic: Boolean = !pinned

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (children.nonEmpty && children.length <= 2 &&
        children.forall(c => ok(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_q8_err takes 1-2 array<float|double> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = StructType(Seq(
    StructField("dsum", DecimalType(38, 18), nullable = true),
    StructField("dmax", DoubleType, nullable = true),
    StructField("n", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_q8_err"
  override def foldable: Boolean = false

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val a = children.head.eval(input)
    if (a == null) return null
    val x = a.asInstanceOf[ArrayData]
    val af = isFloat(children.head)
    // resolve the element values v_i (residual a_i - b_i when b given,
    // zip_with semantics: pad the shorter side with null)
    val (vals, n) = if (children.length == 1) {
      val n = x.numElements()
      val vs = new Array[java.lang.Double](n)
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i))
          vs(i) = if (af) x.getFloat(i).toDouble else x.getDouble(i)
        i += 1
      }
      (vs, n)
    } else {
      val b = children(1).eval(input)
      if (b == null) return null
      val y = b.asInstanceOf[ArrayData]
      val bf = isFloat(children(1))
      val n = math.max(x.numElements(), y.numElements())
      val vs = new Array[java.lang.Double](n)
      var i = 0
      while (i < n) {
        if (i < x.numElements() && i < y.numElements() &&
            !x.isNullAt(i) && !y.isNullAt(i)) {
          val xa = if (af) x.getFloat(i).toDouble else x.getDouble(i)
          val yb = if (bf) y.getFloat(i).toDouble else y.getDouble(i)
          vs(i) = xa - yb
        }
        i += 1
      }
      (vs, n)
    }
    // m = max(abs(v)) over non-null elements (array_max / max skip null)
    var m = java.lang.Double.NEGATIVE_INFINITY
    var any = false
    var i = 0
    while (i < n) {
      if (vals(i) != null) {
        val av = math.abs(vals(i).doubleValue())
        if (!any || av > m) { m = av; any = true }
      }
      i += 1
    }
    if (!any || !(m > 0)) return null
    var dsum: java.math.BigDecimal = null
    var dmax = java.lang.Double.NEGATIVE_INFINITY
    var anyErr = false
    i = 0
    while (i < n) {
      if (vals(i) != null) {
        val v = vals(i).doubleValue()
        val q = v * 127.0 / m
        val rq =
          if (java.lang.Double.isNaN(q) || java.lang.Double.isInfinite(q)) q
          else java.math.BigDecimal.valueOf(q)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        val err = math.abs(v - rq * m / 127.0)
        if (java.lang.Double.isFinite(err)) {
          val d = java.math.BigDecimal.valueOf(err)
            .setScale(18, java.math.RoundingMode.HALF_UP)
          if (d.precision <= 38) {
            dsum = if (dsum == null) d else dsum.add(d)
            if (!anyErr || err > dmax) dmax = err
            anyErr = true
          }
        } else if (!java.lang.Double.isNaN(err)) {
          // +Inf err: max keeps it, the decimal cast drops it (NULL)
          if (!anyErr || err > dmax) dmax = err
          anyErr = true
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      if (dsum == null) null else org.apache.spark.sql.types.Decimal(dsum, 38, 18),
      if (anyErr) java.lang.Double.valueOf(dmax) else null,
      n.toLong))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Q8Err =
    copy(children = newChildren, pinned = pinned)
}

object Q8Err {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Q8Err].getName, "graft_q8_err")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.nonEmpty && args.length <= 2,
      "graft_q8_err takes 1-2 arguments")
    Q8Err(args)
  }
}
