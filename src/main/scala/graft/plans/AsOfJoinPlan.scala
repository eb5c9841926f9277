package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native sort-merge AS-OF join — whole-operator Catalyst extension tier (c),
  * like [[TopKPerGroup]]: custom `LogicalPlan` → `SparkStrategy` → `SparkPlan`.
  *
  * Semantics (backward, inclusive): for each left row, attach the right row of
  * the same key with the greatest `rightTime <= leftTime`; ties on rightTime go
  * to the greatest `rightTie`. Left rows with no prior right row keep nulls
  * (left-outer) — exactly the `join_asof` contract of [[graft.ops.AsOfJoin]].
  *
  * Physical shape: EnsureRequirements co-partitions both children on the key
  * (`ClusteredDistribution`) and sorts them (key, time[, tie]) — then ONE
  * streaming merge pass per partition attaches matches with O(1) state (the
  * last qualifying right row per key). Compared to the union-merge formulation
  * this avoids widening both inputs to a common payload schema and the window
  * machinery; compared to the naive equi-join + window it never materializes the
  * left × rights-per-key pair expansion. State per partition is ONE buffered
  * right row — at 100 TB the operator is shuffle-bound, never memory-bound.
  *
  * Requirements: single key expression per side (compose structs for compound
  * keys), identical key and time types across sides, orderable types.
  */
case class AsOfJoin(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin = copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, tie, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
    ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) ::
        SortOrder(rightTie, Ascending) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec = copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd =
      TypeUtils.getInterpretedOrdering(leftKey.dataType).asInstanceOf[Ordering[Any]]
    val timeOrd =
      TypeUtils.getInterpretedOrdering(leftTime.dataType).asInstanceOf[Ordering[Any]]
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // the last right row (copied — iterators reuse buffers) with
      // rt <= current left time, plus the key it belongs to
      var lastVal: InternalRow = null
      var lastKey: Any = null
      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        // null left key/time matches nothing and must not consume right rows
        // (nulls sort FIRST ascending — later left rows still need the stream)
        var done = lk == null || lt == null
        while (!done && rBuf.hasNext) {
          val h = rBuf.head
          val hk = rKeyB.eval(h)
          if (hk == null) { rBuf.next() } // null-keyed right rows match nothing
          else {
            val c = keyOrd.compare(hk, lk)
            if (c < 0) rBuf.next() // behind every remaining left key: discard
            else if (c > 0) done = true
            else {
              val ht = rTimeB.eval(h)
              if (ht == null) rBuf.next() // null time sorts first; unmatched
              else if (timeOrd.compare(ht, lt) <= 0) {
                lastVal = h.copy()
                // lk may alias the left iterator's reused row buffer — copy
                // buffer-backed values or a later row mutates our stored key
                lastKey = lk match {
                  case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
                  case r: InternalRow => r.copy()
                  case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
                  case b: Array[Byte] => b.clone()
                  case x => x
                }
                rBuf.next()
              } else done = true
            }
          }
        }
        val matched = lk != null && lt != null && lastVal != null &&
          lastKey != null && keyOrd.compare(lastKey, lk) == 0
        joined(l, if (matched) lastVal else nullRight)
      }
    }
  }

  override def simpleString(maxFields: Int): String = "AsOfJoinExec(backward, inclusive)"
}

/** User API: `AsOfNative.join(left, right, $"user_id", $"o_custkey", $"ts",
  * $"o_orderdate", $"o_orderkey")` — backward inclusive as-of, left-outer.
  * Registers [[AsOfStrategy]] on the session's experimental hook on first use. */
object AsOfNative {
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column, rightTie: Column): DataFrame = {
    val spark = leftDf.sparkSession
    ensureStrategy(spark)
    val (lk, rk) = (resolve(leftDf, leftKey), resolve(rightDf, rightKey))
    val (lt, rt) = (resolve(leftDf, leftTime), resolve(rightDf, rightTime))
    // orderings are built from the LEFT types; a mismatch (e.g. date vs
    // timestamp = Int vs Long internally) would otherwise surface as an
    // executor-side ClassCastException mid-job. Compare PHYSICAL types so
    // representation-equal pairs (timestamp vs timestamp_ntz) still pass.
    def phys(dt: org.apache.spark.sql.types.DataType) =
      org.apache.spark.sql.catalyst.types.PhysicalDataType(dt)
    require(phys(lk.dataType) == phys(rk.dataType),
      s"as-of key types differ: ${lk.dataType.simpleString} vs ${rk.dataType.simpleString}")
    require(phys(lt.dataType) == phys(rt.dataType),
      s"as-of time types differ: ${lt.dataType.simpleString} vs ${rt.dataType.simpleString}")
    Bridge.ofRows(spark, AsOfJoin(
      lk, rk, lt, rt, resolve(rightDf, rightTie),
      Bridge.logicalPlan(leftDf), Bridge.logicalPlan(rightDf)))
  }

  private def resolve(df: DataFrame, c: Column): Expression =
    Bridge.logicalPlan(df.select(c)) match {
      case p: Project => p.projectList.head match {
        case a: Alias => a.child
        case e => e
      }
      case other => throw new IllegalStateException(s"unexpected plan: $other")
    }

  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = Bridge.experimental(spark)
    if (!exp.extraStrategies.contains(AsOfStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfStrategy
  }
}
