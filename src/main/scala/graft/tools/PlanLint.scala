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
  *
  * The BNLJ/cartesian contract is ENFORCED, not just printed: the checked-in
  * allowlist `src/main/resources/planlint-sanctions.txt` names every query
  * sanctioned to carry a BNLJ/CARTESIAN flag (each a bounded scalar-cross /
  * probe-set / lattice shape — rationale in PLANS.md). On a full run the tool
  * exits nonzero if (a) any flagged query is NOT on the list — an unsanctioned
  * pair explosion slipped in — or (b) any listed query no longer flags — a
  * stale sanction that would let a future regression hide. `1partWin` has a
  * ZERO-flag contract: any occurrence fails, no sanctions exist.
  * Run: runMain graft.tools.PlanLint [sfDir] */
object PlanLint {

  /** Query names sanctioned to carry a BNLJ/CARTESIAN flag, from the
    * checked-in resource (comment/blank lines stripped). */
  def sanctionedBnlj(): Set[String] = {
    val in = getClass.getResourceAsStream("/planlint-sanctions.txt")
    require(in != null, "planlint-sanctions.txt missing from resources")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
    finally in.close()
  }

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
    val sanctioned = sanctionedBnlj()
    val bnljFlagged = scala.collection.mutable.Set[String]()
    val win1pFlagged = scala.collection.mutable.Set[String]()
    val planErrors = scala.collection.mutable.Set[String]()
    val ran = scala.collection.mutable.Set[String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => nameFilter.forall(_.matches(name)) }
      .foreach { case (name, fn) =>
      ran += name
      try {
        val exec = fn(spark, sfDir).queryExecution.executedPlan
        val plan = exec.toString
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning")) +
          plan.linesIterator.count(_.contains("Exchange rangepartitioning"))
        val bcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
        val win1p = singlePartitionWindows(exec)
        if (cart + bnlj > 0) bnljFlagged += name
        if (win1p > 0) win1pFlagged += name
        val flags = (if (cart > 0) s" CARTESIAN=$cart" else "") +
          (if (bnlj > 0) s" BNLJ=$bnlj" else "") +
          (if (win1p > 0) s" 1partWin=$win1p" else "")
        println(f"LINT $name%-28s shuffles=$shuffles%-3d bcast=$bcasts%-3d$flags")
      } catch { case e: Throwable =>
        planErrors += name
        println(s"LINT $name PLAN-ERROR ${e.getMessage}")
      }
    }
    spark.stop()

    val failures = violations(bnljFlagged.toSet, win1pFlagged.toSet,
      planErrors.toSet, sanctioned, ran.toSet, fullRun = nameFilter.isEmpty)
    if (failures.nonEmpty) {
      failures.foreach(f => println(s"FAIL $f"))
      println(s"PLANLINT FAIL (${failures.size} violation(s))")
      sys.exit(1)
    } else println("PLANLINT OK")
  }

  /** The enforcement contract, as a pure function so the spec can drive it.
    * Unsanctioned flags, 1partWin flags (zero-flag contract), and plan errors
    * fail on any run; stale sanctions are only fully decidable on a FULL run
    * (under a name filter, only sanctioned queries that actually ran and did
    * not flag count as stale — an unmatched sanction is merely unobserved). */
  def violations(bnljFlagged: Set[String], win1pFlagged: Set[String],
      planErrors: Set[String], sanctioned: Set[String], ran: Set[String],
      fullRun: Boolean): Seq[String] = {
    val unsanctioned = (bnljFlagged -- sanctioned).toSeq.sorted
    val staleBase = if (fullRun) sanctioned else sanctioned.intersect(ran)
    val stale = (staleBase -- bnljFlagged).toSeq.sorted
    unsanctioned.map(n => s"UNSANCTIONED-BNLJ $n (add a bounded-shape " +
      "rationale to PLANS.md + planlint-sanctions.txt, or fix the plan)") ++
    stale.map(n => s"STALE-SANCTION $n (no longer flags — remove from " +
      "planlint-sanctions.txt so the allowlist can't rot)") ++
    win1pFlagged.toSeq.sorted.map(n => s"1PARTWIN $n (zero-flag contract: " +
      "band/partition the window or bound its input with a limit)") ++
    planErrors.toSeq.sorted.map(n => s"PLAN-ERROR $n")
  }
}
