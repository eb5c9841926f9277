package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The sanction-list enforcement contract: unsanctioned BNLJ and 1partWin
  * flags fail against their own allowlists, stale sanctions fail (in both
  * directions neither list can rot), the shuffle budget pins exchange counts
  * exactly, and a filtered run only judges what ran. */
class PlanLintSpec extends AnyFunSuite {

  private val sanctioned = Set("q_scalar_cross", "q_probe_cross")
  private val winSanctioned = Set("q_band_spine")

  private def v(bnljFlagged: Set[String] = Set.empty,
      win1pFlagged: Set[String] = Set.empty,
      planErrors: Set[String] = Set.empty,
      bnljSanctioned: Set[String] = sanctioned,
      win: Set[String] = winSanctioned,
      ran: Set[String] = Set.empty, fullRun: Boolean = true) =
    PlanLint.violations(bnljFlagged, win1pFlagged, planErrors,
      bnljSanctioned, win, ran, fullRun)

  test("sanctions resources load, are non-empty, and have no junk lines") {
    for (s <- Seq(PlanLint.sanctionedBnlj(), PlanLint.sanctionedWin1p())) {
      assert(s.nonEmpty)
      assert(s.forall(n => n.matches("[a-z0-9_]+")), s"bad entries: $s")
    }
  }

  test("every sanctioned name is a registered query (rename/typo guard)") {
    // a renamed query (fn_uuid5_mint -> fn_uuid3_mint happened once) would
    // otherwise leave a phantom sanction that only a full lint run catches
    val registered = graft.SparkEntry.queries.keySet
    val phantom =
      (PlanLint.sanctionedBnlj() ++ PlanLint.sanctionedWin1p()) -- registered
    assert(phantom.isEmpty, s"sanctioned but not registered: $phantom")
  }

  test("every shuffle-budget name is a registered query, and vice versa") {
    val registered = graft.SparkEntry.queries.keySet
    val (_, budget) = PlanLint.shuffleBudget()
    assert(budget.nonEmpty, "shuffle budget file empty/missing")
    assert((budget.keySet -- registered).isEmpty,
      s"budgeted but not registered: ${budget.keySet -- registered}")
    assert((registered -- budget.keySet).isEmpty,
      s"registered but unbudgeted (regenerate with --write-shuffle-budget): " +
        s"${registered -- budget.keySet}")
  }

  test("clean full run → no violations") {
    assert(v(bnljFlagged = sanctioned, win1pFlagged = winSanctioned,
      ran = sanctioned ++ winSanctioned + "q_ok").isEmpty)
  }

  test("an unsanctioned BNLJ flag fails even when sanctioned ones are present") {
    val out = v(bnljFlagged = sanctioned + "q_sneaky_cross",
      win1pFlagged = winSanctioned,
      ran = sanctioned ++ winSanctioned + "q_sneaky_cross")
    assert(out.exists(_.startsWith("UNSANCTIONED-BNLJ q_sneaky_cross")))
    assert(out.size == 1)
  }

  test("a sanctioned query that no longer flags is stale on a full run") {
    val out = v(bnljFlagged = Set("q_scalar_cross"),
      win1pFlagged = winSanctioned, ran = sanctioned ++ winSanctioned)
    assert(out.exists(_.startsWith("STALE-SANCTION q_probe_cross")))
    assert(out.size == 1)
  }

  test("an unsanctioned 1partWin flag fails; a stale win sanction fails") {
    val out = v(bnljFlagged = sanctioned,
      win1pFlagged = Set("q_global_ntile"),
      ran = sanctioned ++ winSanctioned + "q_global_ntile")
    assert(out.exists(_.startsWith("1PARTWIN q_global_ntile")))
    assert(out.exists(_.startsWith("STALE-WIN-SANCTION q_band_spine")))
    assert(out.size == 2)
  }

  test("filtered run: an unmatched sanction is unobserved, not stale") {
    // Only q_scalar_cross ran (and flagged); q_probe_cross didn't run.
    assert(v(bnljFlagged = Set("q_scalar_cross"),
      ran = Set("q_scalar_cross"), fullRun = false).isEmpty)
    // But a sanctioned query that RAN without flagging is stale even filtered.
    val out = v(ran = Set("q_probe_cross", "q_band_spine"), fullRun = false)
    assert(out.exists(_.startsWith("STALE-SANCTION q_probe_cross")))
    assert(out.exists(_.startsWith("STALE-WIN-SANCTION q_band_spine")))
  }

  test("plan errors always fail") {
    val out = v(planErrors = Set("q_broken"), bnljSanctioned = Set.empty,
      win = Set.empty, fullRun = false)
    assert(out.exists(_.startsWith("PLAN-ERROR q_broken")))
  }

  test("shuffle budget: increase, decrease, set drift each fail; exact passes") {
    val budget = Map("q1" -> 3, "q2" -> 0)
    assert(PlanLint.shuffleViolations(Map("q1" -> 3, "q2" -> 0), budget,
      budgetMatchesRun = true).isEmpty)
    val over = PlanLint.shuffleViolations(Map("q1" -> 4, "q2" -> 0), budget,
      budgetMatchesRun = true)
    assert(over.exists(_.startsWith("SHUFFLE-BUDGET-EXCEEDED q1")))
    val under = PlanLint.shuffleViolations(Map("q1" -> 2, "q2" -> 0), budget,
      budgetMatchesRun = true)
    assert(under.exists(_.startsWith("SHUFFLE-BUDGET-STALE q1")))
    val drift = PlanLint.shuffleViolations(Map("q1" -> 3, "q3" -> 1), budget,
      budgetMatchesRun = true)
    assert(drift.exists(_.startsWith("SHUFFLE-BUDGET-UNTRACKED q3")))
    assert(drift.exists(_.startsWith("SHUFFLE-BUDGET-ORPHAN q2")))
    // other-SF runs don't judge the budget (join strategies differ)
    assert(PlanLint.shuffleViolations(Map("q1" -> 9), budget,
      budgetMatchesRun = false).isEmpty)
    // filtered runs still judge over/under for what ran, but not set drift
    val filtered = PlanLint.shuffleViolations(Map("q1" -> 4), budget,
      budgetMatchesRun = true, fullRun = false)
    assert(filtered.exists(_.startsWith("SHUFFLE-BUDGET-EXCEEDED q1")))
    assert(filtered.size == 1)
  }
}
