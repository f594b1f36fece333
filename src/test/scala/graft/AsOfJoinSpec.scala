package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** Custom as-of join operator: the physical merge agrees with the
  * compositional (candidate-set + max_by) form, handles the no-prior
  * case with NULLs, and actually plans through AsOfJoinExec. */
class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def errors = Tables.events(spark, sf)
    .filter(col("event_type") === "error")
    .select(col("user_id"), col("event_id").as("err_id"),
      expr("ts_ns div 1000").as("err_us"))

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("user_id").as("p_user"), col("event_id").as("pur_id"),
      expr("ts_ns div 1000").as("pur_us"))

  test("physical as-of join matches the compositional max_by form") {
    val custom = AsOf.join(errors, purchases,
        "user_id", "p_user", "err_us", "pur_us")
      .filter(col("pur_id").isNotNull)
      .select(col("user_id"), col("err_id"), col("pur_id"))
      .as[(Long, Long, Long)].collect().toSet

    val compositional = errors.join(purchases,
        col("user_id") === col("p_user") && col("pur_us") <= col("err_us"))
      .groupBy("user_id", "err_id")
      .agg(expr("max_by(pur_id, pur_us)").as("pur_id"))
      .as[(Long, Long, Long)].collect().toSet

    assert(custom == compositional)
  }

  test("left rows with no prior right row come back NULL-extended") {
    val got = AsOf.join(errors, purchases,
        "user_id", "p_user", "err_us", "pur_us")
    // every error row survives exactly once (left-outer semantics)
    assert(got.count() == errors.count())
    val noPrior = got.filter(col("pur_id").isNull).count()
    val withPrior = got.filter(col("pur_id").isNotNull).count()
    assert(noPrior + withPrior == errors.count())
    assert(withPrior > 0)
  }

  test("the plan goes through AsOfJoinExec (custom strategy fired)") {
    val df = AsOf.join(errors, purchases, "user_id", "p_user", "err_us", "pur_us")
    df.count() // force planning through AQE
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("skewed right side: hot key exact, hash-distributed, partition-local sorts only") {
    import spark.implicits._
    // one hot key carrying 100x the cold keys' rows — the shape a
    // 100 TB as-of join degrades under if the exec demanded a global
    // sort or re-shuffled candidates. The required distribution is
    // hash-by-key (a key cannot split, so the hot key lands in one
    // partition and streams through the single merge pass); the sorts
    // EnsureRequirements plans must all be partition-local.
    val hot = 7L
    val right = spark.range(50000)
      .select(lit(hot).as("rk"), (col("id") * 2).as("rt"), col("id").as("rid"))
      .unionByName(spark.range(500).select((col("id") % 50 + 100).as("rk"),
        (col("id") * 10).as("rt"), (col("id") + 1000000).as("rid")))
    val left = spark.range(400).select(
      when(col("id") % 4 === 0, lit(hot))
        .otherwise(col("id") % 50 + 100).as("k"),
      (col("id") * 251 % 120000).as("lt"), col("id").as("lid"))
    val got = AsOf.join(left, right, "k", "rk", "lt", "rt")
    got.count() // force planning + execution through AQE
    val ps = got.queryExecution.executedPlan.toString
    assert(ps.contains("AsOfJoin"), "custom exec did not fire")
    assert(ps.contains("hashpartitioning"),
      "as-of children are not hash-distributed on the key")
    // SortExec prints `Sort [...], <global>, 0` — a `true` here would
    // mean a cluster-wide range sort (the scale killer), not the
    // per-partition (key, time) ordering the exec declares
    assert(!ps.contains("], true, 0"),
      s"global sort appeared in the as-of plan:\n$ps")
    val exp = left.join(right,
        col("k") === col("rk") && col("rt") <= col("lt"), "left")
      .groupBy("k", "lt", "lid").agg(expr("max_by(rid, rt)").as("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val gotM = got.select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(gotM.size == 400 && gotM == exp,
      "skewed as-of join diverged from the compositional form")
  }

  test("as-of tie at equal timestamps is inclusive (time <= left time)") {
    val l = Seq((1L, 100L, 10L)).toDF("k", "lt", "lid")
      .select(col("k"), col("lt"), col("lid"))
    val r = Seq((1L, 100L, 77L), (1L, 101L, 88L)).toDF("rk", "rt", "rid")
    val got = AsOf.join(l, r, "k", "rk", "lt", "rt")
      .select("rid").as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(77L)))
  }
}
