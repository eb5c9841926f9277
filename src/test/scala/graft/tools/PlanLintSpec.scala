package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The sanction-list enforcement contract: unsanctioned BNLJ flags fail,
  * stale sanctions fail (in both directions the list can't rot), 1partWin
  * has a zero-flag contract, and a filtered run only judges what ran. */
class PlanLintSpec extends AnyFunSuite {

  private val sanctioned = Set("q_scalar_cross", "q_probe_cross")

  test("sanctions resource loads, is non-empty, and has no junk lines") {
    val s = PlanLint.sanctionedBnlj()
    assert(s.nonEmpty)
    assert(s.forall(n => n.matches("[a-z0-9_]+")), s"bad entries: $s")
  }

  test("every sanctioned name is a registered query (rename/typo guard)") {
    // a renamed query (fn_uuid5_mint -> fn_uuid3_mint happened once) would
    // otherwise leave a phantom sanction that only a full lint run catches
    val registered = graft.SparkEntry.queries.keySet
    val phantom = PlanLint.sanctionedBnlj() -- registered
    assert(phantom.isEmpty, s"sanctioned but not registered: $phantom")
  }

  test("clean full run → no violations") {
    assert(PlanLint.violations(
      bnljFlagged = sanctioned, win1pFlagged = Set.empty,
      planErrors = Set.empty, sanctioned = sanctioned,
      ran = sanctioned ++ Set("q_ok"), fullRun = true).isEmpty)
  }

  test("an unsanctioned BNLJ flag fails even when sanctioned ones are present") {
    val v = PlanLint.violations(sanctioned + "q_sneaky_cross", Set.empty,
      Set.empty, sanctioned, sanctioned + "q_sneaky_cross", fullRun = true)
    assert(v.exists(_.startsWith("UNSANCTIONED-BNLJ q_sneaky_cross")))
    assert(v.size == 1)
  }

  test("a sanctioned query that no longer flags is stale on a full run") {
    val v = PlanLint.violations(Set("q_scalar_cross"), Set.empty, Set.empty,
      sanctioned, sanctioned, fullRun = true)
    assert(v.exists(_.startsWith("STALE-SANCTION q_probe_cross")))
    assert(v.size == 1)
  }

  test("filtered run: an unmatched sanction is unobserved, not stale") {
    // Only q_scalar_cross ran (and flagged); q_probe_cross didn't run.
    assert(PlanLint.violations(Set("q_scalar_cross"), Set.empty, Set.empty,
      sanctioned, ran = Set("q_scalar_cross"), fullRun = false).isEmpty)
    // But a sanctioned query that RAN without flagging is stale even filtered.
    val v = PlanLint.violations(Set.empty, Set.empty, Set.empty,
      sanctioned, ran = Set("q_probe_cross"), fullRun = false)
    assert(v.exists(_.startsWith("STALE-SANCTION q_probe_cross")))
  }

  test("1partWin and plan errors always fail") {
    val v = PlanLint.violations(Set.empty, Set("q_global_ntile"),
      Set("q_broken"), sanctioned = Set.empty, ran = Set.empty, fullRun = false)
    assert(v.exists(_.startsWith("1PARTWIN q_global_ntile")))
    assert(v.exists(_.startsWith("PLAN-ERROR q_broken")))
  }
}
