package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Indices

/** ScalaCheck properties from SURVEY.md §5 #3: clip bounds, masking
  * monotonicity, merge idempotence, union-order invariance. Generators
  * are sampled with fixed seeds (deterministic CI) and each batch is
  * evaluated through the real Column expressions — not a scalar
  * re-implementation — so the properties hold for the exact Catalyst
  * plans the queries use.
  */
class PropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling: n batches from g. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(40), Seed(42L + i)).toSeq)

  private val bandGen: Gen[List[(Option[Double], Option[Double], Option[Double], Int)]] =
    Gen.nonEmptyListOf(for {
      red <- Gen.option(Gen.chooseNum(-2000.0, 15000.0))
      nir <- Gen.option(Gen.chooseNum(-2000.0, 15000.0))
      blue <- Gen.option(Gen.chooseNum(-2000.0, 15000.0))
      fmask <- Gen.chooseNum(0, 5)
    } yield (red, nir, blue, fmask))

  private def pixelDf(rows: List[(Option[Double], Option[Double], Option[Double], Int)]): DataFrame =
    rows.toDF("red", "nir", "blue", "fmask")

  test("clip keeps NDVI in [-1,1] and EVI in [-3,3] or NULL, for any bands") {
    samples(bandGen, 8).foreach { rows =>
      val df = pixelDf(rows)
      val mask = Indices.combinedMask(col("red"), col("nir"), col("blue"), col("fmask"))
      val out = df.select(
        Indices.clip(Indices.maskToNull(Indices.ndvi(col("nir"), col("red")), mask), -1, 1).as("n"),
        Indices.clip(Indices.maskToNull(Indices.evi(col("nir"), col("red"), col("blue")), mask), -3, 3).as("e"))
      val bad = out.filter(
        (col("n").isNotNull && (col("n") < -1.0 || col("n") > 1.0)) ||
          (col("e").isNotNull && (col("e") < -3.0 || col("e") > 3.0))).count()
      assert(bad == 0L, s"clip escaped its bounds for rows=$rows")
    }
  }

  test("GeoTIFF encode/decode is the identity for arbitrary grids and payloads") {
    import graft.ops.{GeoTiff, GridSpec}
    val frameGen: Gen[(Int, Int, Double, Double, List[Float])] = for {
      w <- Gen.chooseNum(1, 12)
      h <- Gen.chooseNum(1, 12)
      west <- Gen.chooseNum(-179.0, 179.0)
      north <- Gen.chooseNum(-89.0, 89.0)
      vals <- Gen.listOfN(w * h, Gen.frequency(
        4 -> Gen.chooseNum(-1.0f, 1.0f),
        1 -> Gen.const(GeoTiff.Nodata)))
    } yield (w, h, west, north, vals)
    samples(frameGen, 12).foreach { case (w, h, west, north, vals) =>
      val grid = GridSpec(west, north, 0.00027, -0.00027, w, h)
      val ndvi = vals.toArray
      val evi = vals.map(v => if (v == GeoTiff.Nodata) v else -v).toArray
      val dec = GeoTiff.decode(
        GeoTiff.encode(grid, "2024-06-01", Seq("NDVI" -> ndvi, "EVI" -> evi)))
      assert(dec.width == w && dec.height == h)
      assert(dec.tieLon == west && dec.tieLat == north)
      assert(dec.pixelScaleX == 0.00027 && dec.pixelScaleY == 0.00027)
      assert(dec.epsg == 4326 && dec.nodata == "-9999")
      assert(dec.bands.head.toSeq == ndvi.toSeq, s"NDVI plane mismatch ($w x $h)")
      assert(dec.bands(1).toSeq == evi.toSeq, s"EVI plane mismatch ($w x $h)")
      assert(dec.metadataXml.contains(">2024-06-01<"))
    }
  }

  test("adding a mask term never increases the valid-pixel count") {
    samples(bandGen, 8).foreach { rows =>
      val df = pixelDf(rows)
      val weak = Indices.outsidePolygon(col("red"), col("nir"), col("blue"))
      val strong = Indices.combinedMask(col("red"), col("nir"), col("blue"), col("fmask"))
      val v = Indices.ndvi(col("nir"), col("red"))
      val nWeak = df.select(Indices.maskToNull(v, weak).as("x"))
        .filter(col("x").isNotNull).count()
      val nStrong = df.select(Indices.maskToNull(v, strong).as("x"))
        .filter(col("x").isNotNull).count()
      assert(nStrong <= nWeak, s"monotonicity broken: $nStrong > $nWeak")
    }
  }

  test("spatial merge of a single granule is the identity on pixel values") {
    val gridGen = Gen.nonEmptyListOf(for {
      y <- Gen.chooseNum(0, 5); x <- Gen.chooseNum(0, 5)
      v <- Gen.chooseNum(-1.0, 1.0)
    } yield (y, x, v))
    samples(gridGen, 6).foreach { rows =>
      // one observation per (y,x) key: avg over the group is the value
      val df = rows.toDF("y", "x", "v").groupBy("y", "x").agg(first("v").as("v"))
      val merged = df.groupBy("y", "x").agg(avg("v").as("v"))
      assert(merged.except(df).count() == 0L && df.except(merged).count() == 0L,
        "single-granule merge was not the identity")
    }
  }

  test("ngrams emit exactly max(0, len-n+1) windows of n tokens, for any text") {
    val textGen: Gen[List[String]] = Gen.nonEmptyListOf(
      Gen.chooseNum(0, 9).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("a", "b", "c", "dd")).map(_.mkString(" "))))
    samples(textGen, 6).foreach { texts =>
      val doc = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      Seq(2, 4).foreach { n =>
        val got = graft.ops.TextOps.ngrams(doc, n)
          .groupBy("doc_id").agg(count(lit(1)).as("c"))
          .as[(Long, Long)].collect().toMap
        texts.zipWithIndex.foreach { case (t, i) =>
          val len = t.split(" ", -1).length
          val expected = math.max(0, len - n + 1)
          assert(got.getOrElse(i.toLong, 0L) == expected,
            s"doc '$t' n=$n: ${got.getOrElse(i.toLong, 0L)} grams, want $expected")
          // every emitted gram is exactly n tokens
        }
        val badWidth = graft.ops.TextOps.ngrams(doc, n)
          .filter(size(split(col("s"), " ")) =!= n).count()
        assert(badWidth == 0L, s"an n=$n gram has the wrong width")
      }
    }
  }

  test("graft_dot_exact equals an independent BigDecimal reference for any finite vectors") {
    // the documented contract: each IEEE product cast to DECIMAL(38,18)
    // (Double.toString, scale-18 HALF_UP — Spark's double→decimal cast),
    // exact accumulation, one rounded conversion at the end; SUM
    // semantics on empties. Re-spelled here from the contract, not the
    // implementation, so a drift in either direction fails.
    def ref(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      val ds = a.zip(b).map { case (x, y) => x * y }
        .filter(java.lang.Double.isFinite)
        .map(p => java.math.BigDecimal.valueOf(p)
          .setScale(18, java.math.RoundingMode.HALF_UP))
        .filter(_.precision <= 38)
      if (ds.isEmpty) None
      else Some(ds.reduce(_.add(_)).doubleValue())
    }
    val vecGen: Gen[List[(List[Double], List[Double])]] =
      Gen.nonEmptyListOf(for {
        n <- Gen.chooseNum(0, 8)
        a <- Gen.listOfN(n, Gen.chooseNum(-1e12, 1e12))
        b <- Gen.listOfN(n, Gen.chooseNum(-1e12, 1e12))
      } yield (a, b))
    samples(vecGen, 6).foreach { rows =>
      val got = rows.toDF("a", "b")
        .selectExpr("graft_dot_exact(a, b)")
        .as[Option[Double]].collect().toSeq
      val want = rows.map { case (a, b) => ref(a, b) }
      assert(got == want, s"native=$got reference=$want")
    }
  }

  test("int8 quantization error stays below half a step for arbitrary vectors") {
    val vecGen: Gen[List[Array[Float]]] = Gen.nonEmptyListOf(
      Gen.listOfN(8, Gen.chooseNum(-4.0f, 4.0f)).map(_.toArray))
    samples(vecGen, 6).foreach { vecs =>
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
        .toDF("vec_id", "embedding")
      // the same arithmetic v11 runs, against a driver-side bound
      val bad = emb
        .select(col("vec_id"), explode(col("embedding")).as("vf"))
        .select(col("vec_id"), col("vf").cast("double").as("v"))
        .groupBy("vec_id").agg(max(abs(col("v"))).as("m"), collect_list("v").as("vs"))
        .filter(col("m") > 0)
        .select(col("m"), explode(col("vs")).as("v"))
        .select(col("m"),
          abs(col("v") - round(col("v") * 127.0 / col("m"), 0) * col("m") / 127.0).as("err"))
        .filter(col("err") > col("m") * 0.5 / 127.0 + 1e-12)
        .count()
      assert(bad == 0L, "a quantized element escaped the half-step bound")
    }
  }

  test("packed shards: assignment is monotone in doc_id and starts where the prefix ends") {
    val assigns = graft.ops.TextOps.packAssignments(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    var cum = 0L
    var prevShard = 0L
    assigns.foreach { case (docId, tok, shard) =>
      assert(shard == cum / graft.ops.TextOps.PackBudget,
        s"doc $docId: shard $shard, but prefix $cum says ${cum / graft.ops.TextOps.PackBudget}")
      assert(shard >= prevShard, s"doc $docId: shard regressed")
      prevShard = shard
      cum += tok
    }
  }

  test("union order does not change a sorted result") {
    val kvGen = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(0, 100); v <- Gen.chooseNum(-1e6, 1e6)
    } yield (k, v))
    samples(kvGen, 6).foreach { rows =>
      val (a, b) = rows.splitAt(rows.length / 2)
      val ab = a.toDF("k", "v").unionByName(b.toDF("k", "v")).orderBy("k", "v")
      val ba = b.toDF("k", "v").unionByName(a.toDF("k", "v")).orderBy("k", "v")
      assert(ab.collect().toSeq == ba.collect().toSeq,
        "sorted union result depended on input order")
    }
  }

  test("NetCDF writer refuses malformed payloads instead of corrupting the file") {
    import graft.ops.Netcdf._
    val schema = Schema(Seq(("time", 0), ("x", 2)), Nil, Seq(
      NcVar("time", Seq(0), NcInt, Nil),
      NcVar("x", Seq(1), NcDouble, Nil),
      NcVar("v", Seq(0, 1), NcFloat, Nil)))
    val xs = java.nio.ByteBuffer.allocate(16).putDouble(0.0).putDouble(1.0).array()
    def rec(n: Int) = Seq(
      java.nio.ByteBuffer.allocate(4).putInt(0).array(),
      new Array[Byte](n))
    def attempt(fixed: Map[String, Array[Byte]], nRecs: Int,
        recs: Seq[Seq[Array[Byte]]]): Unit = {
      val out = new java.io.ByteArrayOutputStream()
      write(out, schema, nRecs, fixed, recs.iterator)
    }
    // missing fixed payload
    intercept[IllegalArgumentException] {
      attempt(Map.empty, 1, Seq(rec(8)))
    }
    // wrong fixed payload size
    intercept[IllegalArgumentException] {
      attempt(Map("x" -> new Array[Byte](8)), 1, Seq(rec(8)))
    }
    // wrong record chunk size
    intercept[IllegalArgumentException] {
      attempt(Map("x" -> xs), 1, Seq(rec(5)))
    }
    // wrong chunk count per record
    intercept[IllegalArgumentException] {
      attempt(Map("x" -> xs), 1, Seq(Seq(rec(8).head)))
    }
    // record count must match the header's declaration
    intercept[IllegalArgumentException] {
      attempt(Map("x" -> xs), 2, Seq(rec(8)))
    }
    // single byte/char/short record variable: the classic spec omits
    // record padding for that shape; the writer rejects it rather than
    // silently emitting a file external readers misparse
    intercept[IllegalArgumentException] {
      val s1 = Schema(Seq(("time", 0)), Nil,
        Seq(NcVar("b", Seq(0), NcByte, Nil)))
      val out = new java.io.ByteArrayOutputStream()
      write(out, s1, 1, Map.empty, Iterator(Seq(Array[Byte](1))))
    }
  }

  test("NetCDF reader refuses data past 2 GiB instead of overflowing Int offsets") {
    import graft.ops.Netcdf._
    // hand-crafted header: one 1e9-element double variable → 8 GB slab,
    // legitimately writable as CDF-2 but unreadable by the round-trip
    // reader's 32-bit addressing — it must fail loudly, not wrap negative
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeBytes("CDF"); o.writeByte(1)
    o.writeInt(0)                      // numrecs
    o.writeInt(0x0A); o.writeInt(1)    // 1 dim: "x", 1e9
    o.writeInt(1); o.write('x'); o.write(0); o.write(0); o.write(0)
    o.writeInt(1000000000)
    o.writeInt(0); o.writeInt(0)       // global atts ABSENT
    o.writeInt(0x0B); o.writeInt(1)    // 1 var: "v" double over dim 0
    o.writeInt(1); o.write('v'); o.write(0); o.write(0); o.write(0)
    o.writeInt(1); o.writeInt(0)
    o.writeInt(0); o.writeInt(0)       // var atts ABSENT
    o.writeInt(NcDouble)
    o.writeInt(0)                      // vsize (reader ignores)
    o.writeInt(64)                     // begin
    o.flush()
    val e = intercept[IllegalArgumentException](read(bos.toByteArray))
    assert(e.getMessage.contains("2 GiB"), e.getMessage)
  }

  test("property: NetCDF codec round-trips any (dims, records, values) shape") {
    import graft.ops.Netcdf._
    val shapeGen = for {
      h <- Gen.chooseNum(1, 7)
      w <- Gen.chooseNum(1, 9)
      nRecs <- Gen.chooseNum(1, 5)
      cdf2 <- Gen.oneOf(true, false)
      vals <- Gen.listOfN(nRecs * h * w,
        Gen.oneOf(Gen.chooseNum(-9999f, 9999f), Gen.const(-9999f)))
    } yield (h, w, nRecs, cdf2, vals)
    samples(shapeGen, 12).foreach { case (h, w, nRecs, cdf2, vals) =>
      val schema = Schema(
        dims = Seq(("time", 0), ("y", h), ("x", w)),
        gatts = Seq("title" -> TextAtt(s"prop ${h}x$w")),
        vars = Seq(
          NcVar("time", Seq(0), NcInt, Nil),
          NcVar("y", Seq(1), NcDouble, Nil),
          NcVar("v", Seq(0, 1, 2), NcFloat,
            Seq("_FillValue" -> FloatAtt(Array(-9999f))))))
      def floats(a: Seq[Float]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        a.foreach(bb.putFloat); bb.array()
      }
      val ys = java.nio.ByteBuffer.allocate(h * 8)
      (0 until h).foreach(i => ys.putDouble(i * 0.5))
      val recs = (0 until nRecs).map { r =>
        Seq(java.nio.ByteBuffer.allocate(4).putInt(r * 10).array(),
          floats(vals.slice(r * h * w, (r + 1) * h * w)))
      }
      val out = new java.io.ByteArrayOutputStream()
      write(out, schema, nRecs, Map("y" -> ys.array()), recs.iterator,
        forceCdf2 = cdf2)
      val p = read(out.toByteArray)
      assert(p.numRecs == nRecs && p.s.dims == schema.dims)
      assert(p.s.gatts == schema.gatts)
      // structural var equality (FloatAtt wraps an Array, whose ==
      // is reference identity)
      assert(p.s.vars.map(v => (v.name, v.dimIds.toList, v.tpe)) ==
        schema.vars.map(v => (v.name, v.dimIds.toList, v.tpe)))
      val fill = p.s.vars.find(_.name == "v").get.atts.collectFirst {
        case ("_FillValue", FloatAtt(a)) => a.toSeq }
      assert(fill.contains(Seq(-9999f)), s"fill attr lost: $fill")
      val vb = java.nio.ByteBuffer.wrap(p.data("v"))
      val got = Array.fill(nRecs * h * w)(vb.getFloat()).toSeq
      // float equality is EXACT here: the payload is raw IEEE bytes
      assert(got == vals, s"values drifted for ${h}x$w x$nRecs cdf2=$cdf2")
      val tb = java.nio.ByteBuffer.wrap(p.data("time"))
      assert(Array.fill(nRecs)(tb.getInt()).toSeq == (0 until nRecs).map(_ * 10))
    }
  }
}
