package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric-determinism helpers shared by every oracle-checked query.
  *
  * Floating sums are order-dependent; at 100 TB the summation order is
  * whatever the shuffle produced, so any query that must hash-match an
  * oracle routes per-row doubles through an exact DECIMAL accumulator
  * (order-independent, no precision loss at the declared scale) and only
  * converts back to double at the end. Averages/stddevs keep native double
  * accumulation (error is relative, absorbed by round-to-6).
  */
object Num {
  /** Exact, order-independent sum of a double expression. */
  def xsum(c: Column): Column = sum(c.cast("decimal(38,6)")).cast("double")

  /** Round for oracle comparison (absorbs cross-engine accumulation order). */
  def r6(c: Column): Column = round(c, 6)
  def r4(c: Column): Column = round(c, 4)
}
