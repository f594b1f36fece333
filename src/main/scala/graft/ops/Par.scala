package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for CPU-heavy per-row maps.
  *
  * Parquet splits at row-group boundaries, so a small single-row-group
  * file scans as ONE task no matter what
  * `spark.sql.files.maxPartitionBytes` says — and a ~50M-token explode
  * or a per-shingle md5 pass then runs on one core of 32. At 100 TB the
  * corpus arrives in thousands of splits and this is a no-op (the guard
  * never fires ≥ half the cluster's parallelism, so no corpus-scale
  * bytes are ever shuffled just for parallelism); on a narrow scan it
  * pays one small exchange to spread the expensive map across the
  * cluster. Row values are untouched — only physical placement changes,
  * and every oracle-checked aggregate is order-independent by the
  * engine's determinism contract.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val para = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, para / 2)) df
    else df.repartition(para)
  }
}
