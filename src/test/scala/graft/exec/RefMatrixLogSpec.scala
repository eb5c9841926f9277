package graft.exec

import org.scalatest.funsuite.AnyFunSuite

/** Transcript-for-transcript port of the reference logging goldens
  * (/root/reference/tests/test_logging.py — all 5 tests):
  *
  *   - test_logging_no_timestamps (:77)           -> gaudy, timestamps off
  *   - test_logging_all_no_tty_not_colored (:117) -> gaudy, stamps, no color
  *   - test_logging_all_tty_is_colored (:157)     -> gaudy, stamps, colored
  *   - test_logging_style_moderate (:206)
  *   - test_logging_style_minimal (:246)
  *
  * The reference pins its formatter clock to "2023-11-13 23:23:51.228"; the
  * injected `clock` here does the same. The driver script (print_logs,
  * test_logging.py:34-73) is reproduced verbatim: three uncontexted lines,
  * a JOB holding two TASKs, COMMANDs with `Return code: 0` footers, one
  * trailing line after every context closes. */
class RefMatrixLogSpec extends AnyFunSuite {

  private val T = "2023-11-13 23:23:51.228"

  private def transcript(style: String, timestamps: Boolean = true,
      colored: Boolean = false): List[String] = {
    val buf = scala.collection.mutable.ListBuffer[String]()
    val log = new ContextLogger(buf += _, style = style,
      timestamps = timestamps, colored = colored, clock = () => T)
    log.info("Some info without a context")
    log.warning("A warning without a context")
    log.error("An error without a context")
    log.push("job", "My cool job")
    log.info("Some info at the JOB level")
    log.warning("A warning at the JOB level")
    log.error("An error at the JOB level")
    Seq(1, 2).foreach { t =>
      log.push("task", s"Command $t")
      log.info(s"Some info at the TASK $t level")
      log.warning(s"A warning at the TASK $t level")
      log.error(s"An error at the TASK $t level")
      val subs = if (t == 1) Seq(1, 2) else Seq(1)
      subs.foreach { c =>
        log.push("command", s"Task $t.$c")
        log.info(s"Some info at the COMMAND $t.$c level")
        log.warning(s"A warning at the COMMAND $t.$c level")
        log.error(s"An error at the COMMAND $t.$c level")
        log.pop(Some("Return code: 0"))
      }
      log.pop(None)
    }
    log.pop(None)
    log.info("Add one.")
    buf.toList
  }

  test("test_logging_no_timestamps (:77): gaudy frames, unstamped") {
    assert(transcript("gaudy", timestamps = false) == List(
      "Some info without a context",
      "WARNING A warning without a context",
      "ERROR An error without a context",
      "╭──╴My cool job ╶╴╴╶ ╶",
      "│ Some info at the JOB level",
      "│ WARNING A warning at the JOB level",
      "│ ERROR An error at the JOB level",
      "┏━━╸Command 1 ━╴╴╶ ╶",
      "┃ Some info at the TASK 1 level",
      "┃ WARNING A warning at the TASK 1 level",
      "┃ ERROR An error at the TASK 1 level",
      "┃╭──╴Task 1.1 ─╴╴╶ ╶",
      "┃│ Some info at the COMMAND 1.1 level",
      "┃│ WARNING A warning at the COMMAND 1.1 level",
      "┃│ ERROR An error at the COMMAND 1.1 level",
      "┃╰──╴Return code: 0 ─╴╴╶ ╶",
      "┃╭──╴Task 1.2 ─╴╴╶ ╶",
      "┃│ Some info at the COMMAND 1.2 level",
      "┃│ WARNING A warning at the COMMAND 1.2 level",
      "┃│ ERROR An error at the COMMAND 1.2 level",
      "┃╰──╴Return code: 0 ─╴╴╶ ╶",
      "┏━━╸Command 2 ━╴╴╶ ╶",
      "┃ Some info at the TASK 2 level",
      "┃ WARNING A warning at the TASK 2 level",
      "┃ ERROR An error at the TASK 2 level",
      "┃╭──╴Task 2.1 ─╴╴╶ ╶",
      "┃│ Some info at the COMMAND 2.1 level",
      "┃│ WARNING A warning at the COMMAND 2.1 level",
      "┃│ ERROR An error at the COMMAND 2.1 level",
      "┃╰──╴Return code: 0 ─╴╴╶ ╶",
      "Add one."))
  }

  test("test_logging_all_no_tty_not_colored (:117): stamps only inside COMMANDs") {
    val got = transcript("gaudy")
    assert(got.take(12) == List(
      "Some info without a context",
      "WARNING A warning without a context",
      "ERROR An error without a context",
      "╭──╴My cool job ╶╴╴╶ ╶",
      "│ Some info at the JOB level",
      "│ WARNING A warning at the JOB level",
      "│ ERROR An error at the JOB level",
      "┏━━╸Command 1 ━╴╴╶ ╶",
      "┃ Some info at the TASK 1 level",
      "┃ WARNING A warning at the TASK 1 level",
      "┃ ERROR An error at the TASK 1 level",
      "┃╭──╴Task 1.1 ─╴╴╶ ╶"))
    assert(got(12) == s"┃│$T┊ Some info at the COMMAND 1.1 level")
    assert(got(13) == s"┃│$T┊ WARNING A warning at the COMMAND 1.1 level")
    assert(got(14) == s"┃│$T┊ ERROR An error at the COMMAND 1.1 level")
    assert(got(15) == "┃╰──╴Return code: 0 ─╴╴╶ ╶")
    assert(got.last == "Add one.")
  }

  test("test_logging_all_tty_is_colored (:157): reference tty palette") {
    val got = transcript("gaudy", colored = true)
    val E = ""
    assert(got.head == s"$E[2;34m$E[0m Some info without a context")
    assert(got(1) == s"$E[2;34m$E[0m $E[93mWARNING A warning without a context$E[0m")
    assert(got(2) == s"$E[2;34m$E[0m $E[91mERROR An error without a context$E[0m")
    assert(got(3) == s"$E[2;34m╭──╴$E[0m$E[1;37mMy cool job$E[0m$E[2;34m ╶╴╴╶ ╶$E[0m")
    assert(got(4) == s"$E[2;34m│$E[0m Some info at the JOB level")
    assert(got(7) == s"$E[2;34m┏━━╸$E[0m$E[1;37mCommand 1$E[0m$E[2;34m ━╴╴╶ ╶$E[0m")
    assert(got(11) == s"$E[2;34m┃╭──╴$E[0m$E[1;37mTask 1.1$E[0m$E[2;34m ─╴╴╶ ╶$E[0m")
    assert(got(12) == s"$E[2;34m┃│$E[0m$E[90m$T$E[0m$E[2;34m┊$E[0m " +
      "Some info at the COMMAND 1.1 level")
    assert(got(13) == s"$E[2;34m┃│$E[0m$E[90m$T$E[0m$E[2;34m┊$E[0m " +
      s"$E[93mWARNING A warning at the COMMAND 1.1 level$E[0m")
    assert(got(15) == s"$E[2;34m┃╰──╴$E[0m$E[1;37mReturn code: 0$E[0m$E[2;34m ─╴╴╶ ╶$E[0m")
    assert(got.last == s"$E[2;34m$E[0m Add one.")
  }

  test("test_logging_style_moderate (:206)") {
    assert(transcript("moderate") == List(
      "Some info without a context",
      "WARNING A warning without a context",
      "ERROR An error without a context",
      "─╴My cool job╶─",
      "Some info at the JOB level",
      "WARNING A warning at the JOB level",
      "ERROR An error at the JOB level",
      "━╸Command 1╺━",
      "Some info at the TASK 1 level",
      "WARNING A warning at the TASK 1 level",
      "ERROR An error at the TASK 1 level",
      "═╴Task 1.1╶═",
      s"$T┊ Some info at the COMMAND 1.1 level",
      s"$T┊ WARNING A warning at the COMMAND 1.1 level",
      s"$T┊ ERROR An error at the COMMAND 1.1 level",
      "═╴Return code: 0╶═",
      "═╴Task 1.2╶═",
      s"$T┊ Some info at the COMMAND 1.2 level",
      s"$T┊ WARNING A warning at the COMMAND 1.2 level",
      s"$T┊ ERROR An error at the COMMAND 1.2 level",
      "═╴Return code: 0╶═",
      "━╸Command 2╺━",
      "Some info at the TASK 2 level",
      "WARNING A warning at the TASK 2 level",
      "ERROR An error at the TASK 2 level",
      "═╴Task 2.1╶═",
      s"$T┊ Some info at the COMMAND 2.1 level",
      s"$T┊ WARNING A warning at the COMMAND 2.1 level",
      s"$T┊ ERROR An error at the COMMAND 2.1 level",
      "═╴Return code: 0╶═",
      "Add one."))
  }

  test("test_logging_style_minimal (:246)") {
    assert(transcript("minimal") == List(
      "Some info without a context",
      "WARNING A warning without a context",
      "ERROR An error without a context",
      "My cool job",
      "Some info at the JOB level",
      "WARNING A warning at the JOB level",
      "ERROR An error at the JOB level",
      "Command 1",
      "Some info at the TASK 1 level",
      "WARNING A warning at the TASK 1 level",
      "ERROR An error at the TASK 1 level",
      "Task 1.1",
      s"$T Some info at the COMMAND 1.1 level",
      s"$T WARNING A warning at the COMMAND 1.1 level",
      s"$T ERROR An error at the COMMAND 1.1 level",
      "Return code: 0",
      "Task 1.2",
      s"$T Some info at the COMMAND 1.2 level",
      s"$T WARNING A warning at the COMMAND 1.2 level",
      s"$T ERROR An error at the COMMAND 1.2 level",
      "Return code: 0",
      "Command 2",
      s"Some info at the TASK 2 level",
      "WARNING A warning at the TASK 2 level",
      "ERROR An error at the TASK 2 level",
      "Task 2.1",
      s"$T Some info at the COMMAND 2.1 level",
      s"$T WARNING A warning at the COMMAND 2.1 level",
      s"$T ERROR An error at the COMMAND 2.1 level",
      "Return code: 0",
      "Add one."))
  }
}
