package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference placeholder matrix (tests/models/test_job.py:316-467,
  * 857-934, 984-1073). */
class PlaceholderSpec extends AnyFunSuite {

  private val tmpData = java.nio.file.Files.createTempDirectory("graft-spec").toString

  private def job(env: Map[String, EnvValue] = Map.empty,
      commands: List[Command] = Nil, hostEnv: List[String] = Nil) =
    Job(name = "j", data = tmpData, env = env, hostEnv = hostEnv, commands = commands)

  private def resolve(j: Job, host: Map[String, String] = Map.empty): Job =
    Placeholders.resolve(j, host)

  import EnvValue._

  test("${job.env.X} resolves with whole-match type retention") {
    val j = job(env = Map("COUNT" -> IntV(42), "RATE" -> FloatV(1.5),
      "FLAG" -> BoolV(true), "NAME" -> Str("x")),
      commands = List(Command(Some("c1"), "t", Map(
        "A" -> Str("${job.env.COUNT}"), "B" -> Str("${job.env.RATE}"),
        "C" -> Str("${job.env.FLAG}"), "D" -> Str("${job.env.NAME}")))))
    val r = resolve(j).commands.head.env
    assert(r("A") == IntV(42))
    assert(r("B") == FloatV(1.5))
    assert(r("C") == BoolV(true))
    assert(r("D") == Str("x"))
  }

  test("embedded placeholders stringify; bools render python-style; null -> 'null'") {
    val j = job(env = Map("N" -> IntV(5), "F" -> BoolV(false), "Z" -> NullV),
      commands = List(Command(None, "t", Map(
        "S" -> Str("n=${job.env.N} f=${job.env.F} z=${job.env.Z}")))))
    assert(resolve(j).commands.head.env("S") == Str("n=5 f=False z=null"))
  }

  test("$$ is a literal dollar escape") {
    val j = job(commands = List(Command(None, "t", Map(
      "A" -> Str("cost: $$5"), "B" -> Str("$$$$"), "C" -> Str("$$notavar")))))
    val r = resolve(j).commands.head.env
    assert(r("A") == Str("cost: $5"))
    assert(r("B") == Str("$$"))
    assert(r("C") == Str("$notavar"))
  }

  test("${previous.env.OUTPUT} chains; previous advances per command") {
    val j = job(commands = List(
      Command(Some("one"), "t", Map("OUTPUT" -> Str("a"))),
      Command(Some("two"), "t", Map("IN" -> Str("${previous.env.OUTPUT}"),
        "OUTPUT" -> Str("b"))),
      Command(Some("three"), "t", Map("IN" -> Str("${previous.env.OUTPUT}")))))
    val r = resolve(j).commands
    assert(r(1).env("IN") == Str("a"))
    assert(r(2).env("IN") == Str("b"))
  }

  test("${previous} after an UNNAMED command errors (reference job.py:458-464)") {
    // `previous` is only set by named commands and is cleared by an unnamed
    // one — the reference raises the first-command error here rather than
    // resolving against the unnamed command.
    val j = job(commands = List(
      Command(Some("one"), "t", Map("OUTPUT" -> Str("a"))),
      Command(None, "t", Map("OUTPUT" -> Str("b"))),
      Command(Some("three"), "t", Map("IN" -> Str("${previous.env.OUTPUT}")))))
    val e = intercept[SpecError](resolve(j))
    assert(e.getMessage.contains("Cannot use ${previous} placeholder on the first command"))
  }

  test("named command references resolve backwards, fuzzy-matched") {
    val j = job(commands = List(
      Command(Some("load-data"), "t", Map("OUTPUT" -> Str("out1"))),
      Command(None, "t", Map("IN" -> Str("${load_data.env.output}")))))
    assert(resolve(j).commands(1).env("IN") == Str("out1"))
  }

  test("forward and self references error") {
    val fwd = job(commands = List(
      Command(Some("a"), "t", Map("X" -> Str("${b.env.Y}"))),
      Command(Some("b"), "t", Map("Y" -> Str("1")))))
    val e1 = intercept[SpecError](resolve(fwd))
    assert(e1.getMessage.contains("has not run yet"))
    val self = job(commands = List(
      Command(Some("a"), "t", Map("X" -> Str("${a.env.X}")))))
    intercept[SpecError](resolve(self))
  }

  test("skipped commands still resolve and stay referenceable") {
    val j = job(commands = List(
      Command(Some("a"), "t", Map("OUTPUT" -> Str("kept")), skip = true),
      Command(Some("b"), "t", Map("IN" -> Str("${a.env.OUTPUT}")))))
    assert(resolve(j).commands(1).env("IN") == Str("kept"))
  }

  test("bare $VAR resolves in current merged env, single-pass in order") {
    val j = job(env = Map("BASE" -> Str("/data")),
      commands = List(Command(None, "t", Map(
        "DIR" -> Str("$BASE/sub"), "FILE" -> Str("$DIR/f.txt")))))
    val r = resolve(j).commands.head.env
    assert(r("DIR") == Str("/data/sub"))
    assert(r("FILE") == Str("/data/sub/f.txt")) // DIR resolved before FILE
  }

  test("later/self bare references substitute raw, once (single-pass)") {
    // Reference semantics (test_job.py:471-501): resolution is one ordered
    // pass; a reference to a later or self env entry substitutes that entry's
    // CURRENT raw text and is not rescanned — no error, no recursion.
    val j = job(commands = List(Command(None, "t", Map(
      "A" -> Str("x$B"), "B" -> Str("y$A")))))
    val r = resolve(j).commands.head.env
    assert(r("A") == Str("xy$A")) // B raw at A's turn, substituted once
    assert(r("B") == Str("yxy$A")) // A resolved by B's turn
  }

  test("drill-down with list index: ${job.commands.0.env.VAR1}") {
    val j = job(commands = List(
      Command(Some("c0"), "t", Map("VAR1" -> Str("v1"))),
      Command(None, "t", Map("X" -> Str("${job.commands.0.env.VAR1}")))))
    assert(resolve(j).commands(1).env("X") == Str("v1"))
  }

  test("${job.name} / ${job.data} metadata references") {
    val j = job(commands = List(Command(None, "t", Map(
      "N" -> Str("${job.name}"), "D" -> Str("${job.data}")))))
    val r = resolve(j).commands.head.env
    assert(r("N") == Str("j"))
    assert(r("D") == Str(tmpData))
  }

  test("${tmp.dir} and ${tmp.file} allocate distinct paths under data/tmp") {
    val j = job(commands = List(Command(None, "t", Map(
      "D1" -> Str("${tmp.dir}"), "D2" -> Str("${tmp.dir}"),
      "F1" -> Str("${tmp.file}")))))
    val r = resolve(j).commands.head.env
    val d1 = r("D1").render; val d2 = r("D2").render; val f1 = r("F1").render
    assert(d1 != d2)
    assert(d1.startsWith(s"$tmpData/tmp") && d2.startsWith(s"$tmpData/tmp"))
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d1)))
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(f1)))
  }

  test("unresolvable references error with the offending path") {
    val j = job(commands = List(Command(None, "t", Map(
      "X" -> Str("${job.env.MISSING}")))))
    val e = intercept[SpecError](resolve(j))
    assert(e.getMessage.contains("MISSING") || e.getMessage.contains("job.env"))
  }

  test("~ expands to user home for whole values") {
    val j = job(commands = List(Command(None, "t", Map("P" -> Str("~/x")))))
    assert(resolve(j).commands.head.env("P").render ==
      sys.props("user.home") + "/x")
  }

  test("host env overrides job env via allowlist; missing host var warns") {
    var warned = List.empty[String]
    val j = job(env = Map("A" -> Str("jobval"), "B" -> Str("keep")),
      hostEnv = List("A", "NOPE"),
      commands = List(Command(None, "t", Map.empty)))
    val r = Placeholders.resolve(j, Map("A" -> "hostval"), w => warned ::= w)
    assert(r.env("A") == Str("hostval"))
    assert(r.env("B") == Str("keep"))
    assert(warned.exists(_.contains("NOPE")))
  }

  test("command env wins over propagated job env") {
    val j = job(env = Map("X" -> Str("fromjob")),
      commands = List(Command(None, "t", Map("X" -> Str("fromcmd"),
        "Y" -> Str("${job.env.X}")))))
    val r = resolve(j).commands.head.env
    assert(r("X") == Str("fromcmd"))
    assert(r("Y") == Str("fromjob"))
  }
}
