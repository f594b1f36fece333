package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family contributes a `queries` map (Spark side) and an
  * `oracle` map (equivalent ANSI SQL for the driver's DuckDB compare).
  * Column names/aliases are identical on both sides; every query ends in
  * a total ORDER BY; floating aggregates are rounded to 6 decimals and
  * sums routed through exact DECIMAL accumulation (ops/Num.scala) so the
  * hash compare is deterministic at any parallelism.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Abrupt-drop event detection — the reference's headline capability
    * (README.md:25; quality.py:127-154). */
  def entry(spark: SparkSession): DataFrame =
    ops.Events.abruptDrops(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ PixelOps.queries ++ Quality.queries ++
      Merge.queries ++ Stats.queries ++ Meta.queries ++ Events.queries ++
      TextOps.queries ++ SimOps.queries ++ Multimodal.queries ++
      Resample.queries ++ Pipeline.queries ++ Export.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ PixelOps.oracle ++ Quality.oracle ++
      Merge.oracle ++ Stats.oracle ++ Meta.oracle ++ Events.oracle ++
      TextOps.oracle ++ SimOps.oracle ++ Multimodal.oracle ++
      Resample.oracle ++ Pipeline.oracle ++ Export.oracle
}
