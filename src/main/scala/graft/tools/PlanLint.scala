package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExecBase

/** Plan linter: prints per-query physical-plan red flags — cartesian products,
  * broadcast-nested-loop joins, exchange (shuffle) counts, and windows computed
  * on a SINGLE partition (an empty window partitionBy collapses the whole input
  * onto one executor — the classic silent scale-killer; every unbounded frame
  * must be banded/partitioned first) — so plan regressions show up as a diff.
  * Run: runMain graft.tools.PlanLint [sfDir] */
object PlanLint {

  /** Window operators whose UNBOUNDED input arrives as one partition. Counted
    * on the plan TREE (not text): a WindowExecBase whose direct child reports
    * SinglePartition output partitioning — catches the empty-partitionBy shape
    * wherever it hides, including under sorts/projects that preserve the
    * single-partition layout. A window whose input subtree contains a limit
    * (GlobalLimit / TakeOrderedAndProject / CollectLimit) is row-bounded by
    * construction — ranking a top-k frame is the sanctioned two-phase top-k
    * shape, not a scale flaw — so only limit-free single-partition windows
    * flag. */
  def singlePartitionWindows(plan: SparkPlan): Int = {
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    def limited(p: SparkPlan): Boolean = p.exists {
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _ => false
    }
    root.collect {
      case w: WindowExecBase
          if w.child.outputPartitioning == SinglePartition && !limited(w.child) =>
        1
    }.sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    // optional second arg: regex over query names (fast local iteration; the
    // committed PLANS.md snapshot is always the full, unfiltered run)
    val nameFilter = args.lift(1).map(_.r)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => nameFilter.forall(_.matches(name)) }
      .foreach { case (name, fn) =>
      try {
        val exec = fn(spark, sfDir).queryExecution.executedPlan
        val plan = exec.toString
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning")) +
          plan.linesIterator.count(_.contains("Exchange rangepartitioning"))
        val bcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
        val win1p = singlePartitionWindows(exec)
        val flags = (if (cart > 0) s" CARTESIAN=$cart" else "") +
          (if (bnlj > 0) s" BNLJ=$bnlj" else "") +
          (if (win1p > 0) s" 1partWin=$win1p" else "")
        println(f"LINT $name%-28s shuffles=$shuffles%-3d bcast=$bcasts%-3d$flags")
      } catch { case e: Throwable => println(s"LINT $name PLAN-ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
