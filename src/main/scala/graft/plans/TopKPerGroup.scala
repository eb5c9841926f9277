package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator top-k-per-group: logical plan + strategy + physical operator,
  * the (c)-tier Catalyst extension point (custom `LogicalPlan` → `SparkStrategy` →
  * `SparkPlan`) for semantics the built-in operators can't express EFFICIENTLY.
  *
  * The declarative formulation (`row_number().over(partitionBy(g).orderBy(s)) <= k`,
  * query `topk_per_group`) must SORT EVERY PARTITION IN FULL before discarding all
  * but k rows per key — at 100 TB that is a full-data sort (and spill) for a result
  * that is k·|keys| rows. This operator instead keeps a bounded k-row buffer per key:
  *
  *   - a PARTIAL instance runs map-side (no distribution requirement, so it fuses
  *     into the scan stage) and reduces each input partition to ≤ k rows per key —
  *     correct because the global top-k is a subset of the union of per-partition
  *     top-k. Its key map is CAPPED: when a partition carries more than
  *     [[TopKPerGroupExec.MaxPartialKeys]] distinct keys, the buffered rows are
  *     flushed downstream and the map restarts — memory stays bounded on
  *     near-unique keys (a flush only weakens the reduction, never correctness);
  *   - a FINAL instance requires `ClusteredDistribution(groupExprs)` (Catalyst's
  *     EnsureRequirements inserts the hash exchange), so the shuffle carries at most
  *     k rows per key per map-partition flush instead of the whole table — the same
  *     partial/final contract as a hash aggregate, applied to row SELECTION. The
  *     final's working set is k rows per key of its partition — the size of its own
  *     OUTPUT partition, not an amplification of the input.
  *
  * Ordering contract: callers should make `sortExpr` a TOTAL order per group (e.g.
  * `struct(value, unique_id)`) — with boundary ties the kept set would otherwise
  * depend on partitioning. NULL sort values order LAST in both directions (kept
  * only while a group has fewer than k non-null-ranked rows). Any orderable type
  * works (atomics, structs lexicographically, arrays).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortExpr: Expression,
    k: Int,
    descending: Boolean,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as final(partial(child)) — registered via
  * `GraftExtensions` (injectPlannerStrategy) or `TopK.perGroup`'s lazy
  * `experimental.extraStrategies` hook. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, s, k, d, child) =>
      val partial = TopKPerGroupExec(g, s, k, d, partial = true, planLater(child))
      TopKPerGroupExec(g, s, k, d, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key buffer: the k smallest sort values under `ord`. Insert is O(k)
  * worst-case via a cached worst slot — no per-row re-sort. Row copies happen only
  * on retained rows. Top-level class so task closures capture (k, ord), not the
  * exec node. */
private[plans] final class BoundedTopK(k: Int, ord: Ordering[Any]) {
  private val vals = new Array[Any](k)
  private val rows = new Array[InternalRow](k)
  private var size = 0
  private var worst = -1
  def insert(v: Any, row: () => InternalRow): Unit = {
    if (size < k) {
      vals(size) = v; rows(size) = row()
      if (worst < 0 || ord.compare(v, vals(worst)) > 0) worst = size
      size += 1
    } else if (ord.compare(v, vals(worst)) < 0) {
      vals(worst) = v; rows(worst) = row()
      var i = 1; var w = 0
      while (i < size) { if (ord.compare(vals(i), vals(w)) > 0) w = i; i += 1 }
      worst = w
    }
  }
  def iterator: Iterator[InternalRow] = rows.iterator.take(size)
}

object TopKPerGroupExec {
  /** Partial-side cap on distinct buffered keys per partition; beyond it the
    * buffers flush downstream and restart (bounds memory at cap·k rows). */
  val MaxPartialKeys: Int = 1 << 16
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortExpr: Expression,
    k: Int,
    descending: Boolean,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil // global top-k
    else ClusteredDistribution(groupExprs) :: Nil

  // ≤ k rows per key pass through unchanged; keys stay co-located
  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val sortE = sortExpr
    val childOutput = child.output
    val desc = descending
    val kk = k
    // the partial may flush and restart its key map; the final must be exact
    val keyCap = if (partial) TopKPerGroupExec.MaxPartialKeys else Int.MaxValue
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val boundSort = BindReferences.bindReference(sortE, childOutput)
      val baseOrd =
        TypeUtils.getInterpretedOrdering(sortE.dataType).asInstanceOf[Ordering[Any]]
      val directed = if (desc) baseOrd.reverse else baseOrd
      // NULLS LAST under either direction: a null never displaces a ranked row
      val ord: Ordering[Any] = new Ordering[Any] {
        def compare(a: Any, b: Any): Int =
          if (a == null && b == null) 0
          else if (a == null) 1
          else if (b == null) -1
          else directed.compare(a, b)
      }
      val buffers = new java.util.HashMap[UnsafeRow, BoundedTopK]()
      import scala.jdk.CollectionConverters._
      def drain(): Iterator[InternalRow] = {
        val out = buffers.values().asScala.flatMap(_.iterator).toArray
        buffers.clear()
        out.iterator
      }
      new Iterator[InternalRow] {
        private var flushed: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        private def insertRow(row: InternalRow): Boolean = {
          val key = keyProj(row)
          var buf = buffers.get(key)
          val isNewKey = buf == null
          if (isNewKey && buffers.size() >= keyCap) return false // flush first
          if (isNewKey) { buf = new BoundedTopK(kk, ord); buffers.put(key.copy(), buf) }
          // sort values and rows may be reused buffers — copy only what's retained
          val v = boundSort.eval(row) match {
            case r: InternalRow => r.copy()
            case a: ArrayData   => a.copy()
            case m: MapData     => m.copy()
            case s: UTF8String  => s.clone()
            case x              => x
          }
          buf.insert(v, () => row.copy())
          true
        }
        private var pending: InternalRow = null
        private def pump(): Unit = {
          if (pending != null) {
            val p = pending; pending = null
            insertRow(p) // cap was just cleared by the flush
          }
          while (iter.hasNext) {
            val row = iter.next()
            if (!insertRow(row)) { pending = row.copy(); flushed = drain(); return }
          }
          inputDone = true
          flushed = drain()
        }
        override def hasNext: Boolean = {
          while (!flushed.hasNext && !(inputDone && pending == null &&
              buffers.isEmpty)) pump()
          flushed.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          flushed.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override def simpleString(maxFields: Int): String = {
    val mode = if (partial) "partial" else "final"
    s"TopKPerGroupExec($mode, k=$k, desc=$descending)"
  }
}

/** User API: `TopK.perGroup(df, Seq("dept"), struct($"salary", $"id"), k = 3)` —
  * the k rows with the highest (lowest with `descending = false`) sort key per
  * group. Registers [[TopKStrategy]] on the session's experimental strategy hook on
  * first use, so it works on any session without builder-time extension wiring. */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String], sortKey: Column, k: Int,
      descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val child = Bridge.logicalPlan(df)
    // Resolve group columns and the sort key through the ANALYZER (a throwaway
    // select), not by-name scans: this honors spark.sql.caseSensitive, raises
    // Spark's own missing/ambiguous-column errors, and unwraps Spark 4's lazy
    // column nodes. Attribute ids line up because the select shares `child`.
    val groupExprs = groupCols.map(n => resolve(df, df.col(n)))
    Bridge.ofRows(spark,
      TopKPerGroup(groupExprs, resolve(df, sortKey), k, descending, child))
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
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }
}
