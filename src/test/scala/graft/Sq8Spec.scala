package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Equivalence locks for the r16 native ADC expressions: the codegen'd
  * in-row spellings must be BIT-IDENTICAL to the relational/HOF
  * spellings they replaced (the v16/v17 oracle hashes depend on it).
  * Inputs cover the edge space the corpus never exercises: NULL arrays,
  * NULL elements, empty arrays, zero vectors, length mismatches,
  * non-finite values.
  */
class Sq8Spec extends SparkSpecBase {
  import spark.implicits._

  private def seededVecs(seed: Long, n: Int): Seq[(Long, Option[Seq[Option[Float]]])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v: Option[Seq[Option[Float]]] = i % 17 match {
        case 13 => None // NULL embedding
        case 14 => Some(Seq.empty) // empty array
        case 15 => Some(Seq.fill(8)(Some(0.0f))) // zero vector
        case 16 => Some(Seq.tabulate(8)(j => // NULL elements sprinkled
          if ((i + j) % 3 == 0) None else Some(rnd.nextFloat() * 2 - 1)))
        case _ => Some(Seq.fill(8)(Some(rnd.nextFloat() * 2 - 1)))
      }
      (i.toLong, v)
    }
  }

  private def vecDf(seed: Long, n: Int) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true)))
    val rows: Seq[Row] = seededVecs(seed, n).map { case (id, v) =>
      val arr: Seq[Any] =
        v.map(_.map(o => o.map(f => f: Any).getOrElse(null))).getOrElse(null)
      Row(id, arr)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("graft_sq8_code == the r15 relational spelling (flatten/norm/join + transform HOF)") {
    val emb = vecDf(42L, 200)
    // the replaced spelling, verbatim
    val f = emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"),
        col("col").cast("double").as("v"))
    val norms = f.groupBy("vec_id")
      .agg(sqrt(ops.Num.xsumHi(col("v") * col("v"))).as("nrm"))
    val old = emb.join(norms, "vec_id")
      .filter(col("nrm") > 0)
      .withColumn("code", expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / nrm, 0) AS BIGINT))"))
      .select("vec_id", "code")
    val neu = emb.withColumn("code", expr("graft_sq8_code(embedding)"))
      .filter(col("code").isNotNull)
      .select("vec_id", "code")
    val a = old.orderBy("vec_id").collect().toSeq
    val b = neu.orderBy("vec_id").collect().toSeq
    assert(a == b, s"sq8 codes diverge:\nold=${a.take(5)}\nnew=${b.take(5)}")
    assert(a.nonEmpty)
  }

  test("graft_q8_err reduces to the v11 flatten census and the v13 HOF census") {
    val emb = vecDf(99L, 300).withColumn("label",
      (col("vec_id") % 7).cast("string"))
    // v11's replaced relational spelling, verbatim
    val f = emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"),
        col("col").cast("double").as("v"))
    val m = f.groupBy("vec_id").agg(max(abs(col("v"))).as("m"))
    val old = f.join(m, "vec_id").filter(col("m") > 0)
      .select(col("vec_id"),
        abs(col("v") - round(col("v") * 127.0 / col("m"), 0) * col("m") / 127.0)
          .as("err"))
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("label")
      .agg(ops.Num.r6(ops.Num.xsumHi(col("err")) / count(lit(1))).as("avg_err"),
        ops.Num.r6(max(col("err"))).as("max_err"))
      .orderBy("label")
    val neu = emb.select(col("label"), expr("graft_q8_err(embedding)").as("q"))
      .filter(col("q").isNotNull)
      .groupBy("label")
      .agg(ops.Num.r6(sum(col("q.dsum")).cast("double") / sum(col("q.n"))).as("avg_err"),
        ops.Num.r6(max(col("q.dmax"))).as("max_err"))
      .orderBy("label")
    assert(old.collect().toSeq == neu.collect().toSeq, "v11 census spellings diverge")

    // v13's replaced HOF spelling over residuals, verbatim (cd = a
    // shifted copy so residuals are non-trivial)
    val cd = vecDf(123L, 300)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 0.5)").as("cd"),
        (col("vec_id") % 5).as("cell"))
    val j = emb.join(cd, "vec_id")
    val oldR = j
      .select(col("cell"),
        expr("zip_with(embedding, cd, (v, c) -> CAST(v AS DOUBLE) - c)").as("res"))
      .withColumn("mm", expr("array_max(transform(res, r -> abs(r)))"))
      .filter(col("mm") > 0)
      .select(col("cell"), explode(
        expr("transform(res, r -> abs(r - round(r * 127.0D / mm, 0) * mm / 127.0D))"))
        .as("err"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_components"),
        ops.Num.r6(ops.Num.xsumHi(col("err")) / count(lit(1))).as("avg_err"),
        ops.Num.r6(max(col("err"))).as("max_err"))
      .orderBy("cell")
    val neuR = j
      .select(col("cell"), expr("graft_q8_err(embedding, cd)").as("q"))
      .filter(col("q").isNotNull)
      .groupBy("cell")
      .agg(sum(col("q.n")).as("n_components"),
        ops.Num.r6(sum(col("q.dsum")).cast("double") / sum(col("q.n"))).as("avg_err"),
        ops.Num.r6(max(col("q.dmax"))).as("max_err"))
      .orderBy("cell")
    assert(oldR.collect().toSeq == neuR.collect().toSeq,
      "v13 residual census spellings diverge")
  }

  test("graft_adc_dot == aggregate(zip_with(...)) incl. null/length-mismatch poisoning") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 300).map { i =>
      def arr(n: Int): Seq[Any] =
        Seq.tabulate(n)(j => if ((i + j) % 23 == 11) null
          else java.lang.Long.valueOf(rnd.nextInt(255) - 127L))
      val na = if (i % 13 == 5) 7 else 8
      val a = if (i % 29 == 3) null else arr(na)
      val b = if (i % 31 == 4) null else arr(8)
      Row(i.toLong, a, b)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("code", ArrayType(LongType, containsNull = true), nullable = true),
      StructField("qcode", ArrayType(LongType, containsNull = true), nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val both = df.select(col("id"),
      expr("aggregate(zip_with(code, qcode, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("hof"),
      expr("graft_adc_dot(code, qcode)").as("nat"))
    val bad = both.filter(!(col("hof") <=> col("nat"))).collect()
    assert(bad.isEmpty, s"adc dot diverges: ${bad.take(5).toSeq}")
    // empty arrays fold to the initial 0 on both spellings
    val empty = spark.sql(
      "SELECT graft_adc_dot(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS nat, " +
        "aggregate(zip_with(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>), (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS hof")
      .collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }
}
