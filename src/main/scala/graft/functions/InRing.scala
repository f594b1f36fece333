package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: even-odd ray-casting point-in-ring test,
  * `graft_in_ring(lon, lat, ring)` with `ring` a GeoJSON outer ring
  * (`array<array<double>>` of [lon, lat] vertices, closed or open).
  *
  * This is the exact in-polygon refinement behind the AOI bounding-box
  * prefilter (the reference masks its grid with a shapely polygon,
  * processor.py via pipeline.load_aoi; c06 declares the bbox stage). The
  * loop runs inside whole-stage codegen over the packed ring — per the
  * engine's preference order, a native Expression beats any UDF on a
  * corpus-sized scan, and the ring rides along as a broadcast-joined or
  * literal value, never a lookup join.
  *
  * Null semantics: NULL if any argument is NULL, the ring has fewer than
  * 3 vertices, or any vertex is malformed (not a 2-element non-null
  * pair). Boundary points follow the standard PNPOLY asymmetry (a point
  * exactly on a lower/left edge counts inside, upper/right outside) —
  * consistent across engines because the arithmetic is fixed IEEE
  * doubles.
  */
case class InRing(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // Strict doubles (SQL callers CAST numeric literals — a bare 0.5
  // parses as DECIMAL); AbstractDataType is private[sql], so the
  // implicit-cast trait is not available to external expressions.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ringOk = third.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (first.dataType == DoubleType && second.dataType == DoubleType && ringOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_in_ring requires (double, double, array<array<double>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_in_ring"

  override protected def nullSafeEval(lonA: Any, latA: Any, ringA: Any): Any = {
    val lon = lonA.asInstanceOf[Double]
    val lat = latA.asInstanceOf[Double]
    val ring = ringA.asInstanceOf[ArrayData]
    val n = ring.numElements()
    def vertexOk(k: Int): Boolean = !ring.isNullAt(k) && {
      val p = ring.getArray(k)
      p.numElements() == 2 && !p.isNullAt(0) && !p.isNullAt(1)
    }
    if (n < 3) return null
    // the first iteration reads vertex n-1 as its predecessor, so it
    // must be validated BEFORE the loop; every other predecessor was
    // vertex i of the previous iteration
    if (!vertexOk(n - 1)) return null
    var in = false
    var i = 0
    var j = n - 1
    while (i < n) {
      if (!vertexOk(i)) return null
      val pi = ring.getArray(i)
      val pj = ring.getArray(j)
      val xi = pi.getDouble(0); val yi = pi.getDouble(1)
      val xj = pj.getDouble(0); val yj = pj.getDouble(1)
      if ((yi > lat) != (yj > lat) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) in = !in
      j = i
      i += 1
    }
    in
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, ring) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val in = ctx.freshName("in")
      val bad = ctx.freshName("bad")
      val pi = ctx.freshName("pi")
      val pj = ctx.freshName("pj")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj")
      val yj = ctx.freshName("yj")
      val pk = ctx.freshName("pk")
      // shared vertex check: null slot or wrong arity or null coordinate
      def badVertex(k: String): String =
        s"""($ring.isNullAt($k) ||
           |  ($pk = $ring.getArray($k)).numElements() != 2 ||
           |  $pk.isNullAt(0) || $pk.isNullAt(1))""".stripMargin
      s"""
         |final int $n = $ring.numElements();
         |boolean $in = false;
         |org.apache.spark.sql.catalyst.util.ArrayData $pk = null;
         |// vertex n-1 is the first iteration's predecessor: validate it
         |// before the loop like the interpreted path does
         |boolean $bad = $n < 3 || ${badVertex(s"($n - 1)")};
         |for (int $i = 0, $j = $n - 1; !$bad && $i < $n; $j = $i++) {
         |  if (${badVertex(i)}) { $bad = true; break; }
         |  final org.apache.spark.sql.catalyst.util.ArrayData $pi = $ring.getArray($i);
         |  final org.apache.spark.sql.catalyst.util.ArrayData $pj = $ring.getArray($j);
         |  final double $xi = $pi.getDouble(0); final double $yi = $pi.getDouble(1);
         |  final double $xj = $pj.getDouble(0); final double $yj = $pj.getDouble(1);
         |  if ((($yi > $lat) != ($yj > $lat)) &&
         |      $lon < ($xj - $xi) * ($lat - $yi) / ($yj - $yi) + $xi) $in = !$in;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $in;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): InRing =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object InRing {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[InRing].getName, "graft_in_ring")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, "graft_in_ring takes exactly 3 arguments")
    InRing(args.head, args(1), args(2))
  }
}

/** Even-odd point-in-polygon over a full ring SET,
  * `graft_in_rings(lon, lat, rings)` with `rings` an
  * `array<array<array<double>>>` — every ring of a GeoJSON Polygon
  * (outer + interior holes) or the flattened rings of a MultiPolygon.
  *
  * Crossing parity accumulates across ALL rings: a point inside the
  * outer ring and inside a hole crosses an odd number of outer edges
  * plus an odd number of hole edges → even total → outside. This is
  * shapely's even-odd semantics for valid GeoJSON geometries (holes
  * nested in their polygon, members disjoint), which is what the
  * reference's `shape(aoi)` mask honors (pipeline.py:78-84) and the
  * single-ring [[InRing]] cannot express.
  *
  * Null semantics match [[InRing]], applied per ring: NULL if any
  * argument is NULL, the ring set is empty, any ring has fewer than 3
  * vertices, or any vertex is malformed.
  */
case class InRings(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ringsOk = third.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    if (first.dataType == DoubleType && second.dataType == DoubleType && ringsOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_in_rings requires (double, double, array<array<array<double>>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_in_rings"

  override protected def nullSafeEval(lonA: Any, latA: Any, ringsA: Any): Any = {
    val lon = lonA.asInstanceOf[Double]
    val lat = latA.asInstanceOf[Double]
    val rings = ringsA.asInstanceOf[ArrayData]
    val m = rings.numElements()
    if (m == 0) return null
    var in = false
    var r = 0
    while (r < m) {
      if (rings.isNullAt(r)) return null
      val ring = rings.getArray(r)
      val n = ring.numElements()
      def vertexOk(k: Int): Boolean = !ring.isNullAt(k) && {
        val p = ring.getArray(k)
        p.numElements() == 2 && !p.isNullAt(0) && !p.isNullAt(1)
      }
      if (n < 3) return null
      if (!vertexOk(n - 1)) return null
      var i = 0
      var j = n - 1
      while (i < n) {
        if (!vertexOk(i)) return null
        val pi = ring.getArray(i)
        val pj = ring.getArray(j)
        val xi = pi.getDouble(0); val yi = pi.getDouble(1)
        val xj = pj.getDouble(0); val yj = pj.getDouble(1)
        if ((yi > lat) != (yj > lat) &&
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) in = !in
        j = i
        i += 1
      }
      r += 1
    }
    in
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, rings) => {
      val m = ctx.freshName("m")
      val r = ctx.freshName("r")
      val ring = ctx.freshName("ring")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val in = ctx.freshName("in")
      val bad = ctx.freshName("bad")
      val pi = ctx.freshName("pi")
      val pj = ctx.freshName("pj")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj")
      val yj = ctx.freshName("yj")
      val pk = ctx.freshName("pk")
      def badVertex(k: String): String =
        s"""($ring.isNullAt($k) ||
           |  ($pk = $ring.getArray($k)).numElements() != 2 ||
           |  $pk.isNullAt(0) || $pk.isNullAt(1))""".stripMargin
      s"""
         |final int $m = $rings.numElements();
         |boolean $in = false;
         |boolean $bad = $m == 0;
         |org.apache.spark.sql.catalyst.util.ArrayData $pk = null;
         |for (int $r = 0; !$bad && $r < $m; $r++) {
         |  if ($rings.isNullAt($r)) { $bad = true; break; }
         |  final org.apache.spark.sql.catalyst.util.ArrayData $ring =
         |    $rings.getArray($r);
         |  final int $n = $ring.numElements();
         |  if ($n < 3 || ${badVertex(s"($n - 1)")}) { $bad = true; break; }
         |  for (int $i = 0, $j = $n - 1; $i < $n; $j = $i++) {
         |    if (${badVertex(i)}) { $bad = true; break; }
         |    final org.apache.spark.sql.catalyst.util.ArrayData $pi = $ring.getArray($i);
         |    final org.apache.spark.sql.catalyst.util.ArrayData $pj = $ring.getArray($j);
         |    final double $xi = $pi.getDouble(0); final double $yi = $pi.getDouble(1);
         |    final double $xj = $pj.getDouble(0); final double $yj = $pj.getDouble(1);
         |    if ((($yi > $lat) != ($yj > $lat)) &&
         |        $lon < ($xj - $xi) * ($lat - $yi) / ($yj - $yi) + $xi) $in = !$in;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $in;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): InRings =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object InRings {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[InRings].getName, "graft_in_rings")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, "graft_in_rings takes exactly 3 arguments")
    InRings(args.head, args(1), args(2))
  }
}
