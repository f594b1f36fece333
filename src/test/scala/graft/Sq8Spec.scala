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
