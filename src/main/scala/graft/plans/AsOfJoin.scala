package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator as-of join (SURVEY.md §2.5 absent set; guide preference
  * (c)): for every left row, attach the latest right row of the same key
  * whose time is <= the left row's time, or NULLs if none.
  *
  * The compositional form (ops/Relational.asofJoin) materializes the full
  * (left × right-per-key) candidate set before aggregating it away; this
  * physical operator never does — both sides are hash-distributed on the
  * key and sorted by (key, time) (declared via requiredChildDistribution/
  * Ordering, so EnsureRequirements plans the exchanges and sorts), and a
  * single merge pass per partition keeps ONE buffered right row. At 100 TB
  * that is the difference between shuffling candidate pairs and shuffling
  * each input once.
  *
  * Contract: key and time expressions must be LongType (epoch micros for
  * times); right output columns come back nullable.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join requires LongType key and time expressions")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // hash both sides on the key; EnsureRequirements inserts the exchanges
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // and sorts each partition by (key, time)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(leftKey, left.output)
    val lTime = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(leftTime, left.output)
    val rKey = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(rightKey, right.output)
    val rTime = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(rightTime, right.output)
    val rArity = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val nullRight = new GenericInternalRow(rArity)
        private val joined = new JoinedRow
        private val rBuf = rIter.buffered
        // latest right row at or before the current left time, per key
        private var heldKey = 0L
        private var heldValid = false
        private var held: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey.eval(l).asInstanceOf[Long]
          val lt = lTime.eval(l).asInstanceOf[Long]
          if (heldValid && heldKey != lk) heldValid = false
          // advance the right side through all rows usable for (lk, lt)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKey.eval(r).asInstanceOf[Long]
            if (rk < lk) { rBuf.next() } // keys with no remaining left rows
            else if (rk == lk && rTime.eval(r).asInstanceOf[Long] <= lt) {
              held = rBuf.next().copy(); heldKey = rk; heldValid = true
            } else advancing = false
          }
          if (heldValid && heldKey == lk) joined(l, held) else joined(l, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** Planner strategy mapping the logical node to the exec (registered in
  * GraftExtensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
