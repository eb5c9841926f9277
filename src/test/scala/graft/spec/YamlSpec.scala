package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference deserialization matrices (tests/models/test_task.py:214-578,
  * test_job.py:73-291). */
class YamlSpec extends AnyFunSuite {

  test("root keys conform to snake_case; env keys to UPPER_SNAKE") {
    val j = Yaml.jobFromString(
      """name: j
        |data: /tmp/d
        |host-env: [base-url]
        |env:
        |  base-url: http://x
        |  retry-count: 3
        |commands:
        |  - task: t
        |    env:
        |      time-out: 1.5
        |""".stripMargin)
    assert(j.env.keySet == Set("BASE_URL", "RETRY_COUNT"))
    assert(j.hostEnv == List("BASE_URL"))
    assert(j.commands.head.env.keySet == Set("TIME_OUT"))
    assert(j.env("RETRY_COUNT") == EnvValue.IntV(3))
    assert(j.commands.head.env("TIME_OUT") == EnvValue.FloatV(1.5))
  }

  test("host_env defaults to job env keys") {
    val j = Yaml.jobFromString("name: j\ndata: /tmp/d\nenv:\n  A: 1\n  B: 2\n")
    assert(j.hostEnv == List("A", "B"))
  }

  test("command names are validated against [a-z0-9-_]") {
    val bad = intercept[SpecError](Yaml.jobFromString(
      "name: j\ndata: /d\ncommands:\n  - name: Bad Name!\n    task: t\n"))
    assert(bad.getMessage.contains("invalid command name"))
    val ok = Yaml.jobFromString(
      "name: j\ndata: /d\ncommands:\n  - name: ok-name_2\n    task: t\n")
    assert(ok.commands.head.name.contains("ok-name_2"))
  }

  test("run command forms: string tokenized, list verbatim, script+interpreter") {
    val s = Yaml.taskFromString("name: t\nrun: echo 'hello world' --x=1\n")
    assert(s.body == TaskBody.Exec(List("echo", "hello world", "--x=1")))
    val l = Yaml.taskFromString("name: t\nrun: [echo, hello, 3]\n")
    assert(l.body == TaskBody.Exec(List("echo", "hello", "3")))
    val sc = Yaml.taskFromString(
      "name: t\nrun:\n  interpreter: /bin/bash -c\n  script: echo hi\n")
    assert(sc.body == TaskBody.Script(List("/bin/bash", "-c"), "echo hi"))
  }

  test("spark-op body form") {
    val t = Yaml.taskFromString("name: t\nspark-op: read-parquet\n")
    assert(t.body == TaskBody.SparkOp("read-parquet"))
  }

  test("input schema: required default true; default implies optional") {
    val t = Yaml.taskFromString(
      """name: t
        |run: echo
        |env:
        |  MUST:
        |    description: required by default
        |  MAY:
        |    optional: true
        |  DEF:
        |    default: 7
        |""".stripMargin)
    assert(t.env("MUST").required)
    assert(!t.env("MAY").required)
    assert(!t.env("DEF").required)
    assert(t.env("DEF").default.contains(EnvValue.IntV(7)))
  }

  test("required and optional are mutually exclusive") {
    val e = intercept[SpecError](Yaml.taskFromString(
      "name: t\nrun: echo\nenv:\n  X:\n    required: true\n    optional: true\n"))
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("type spellings: str/string int/integer float/decimal bool/boolean") {
    val t = Yaml.taskFromString(
      """name: t
        |run: echo
        |env:
        |  A: {type: str}
        |  B: {type: integer}
        |  C: {type: decimal}
        |  D: {type: boolean}
        |""".stripMargin)
    assert(t.env("A").inputType.contains(InputType.TString))
    assert(t.env("B").inputType.contains(InputType.TInt))
    assert(t.env("C").inputType.contains(InputType.TFloat))
    assert(t.env("D").inputType.contains(InputType.TBool))
    intercept[SpecError](Yaml.taskFromString(
      "name: t\nrun: echo\nenv:\n  X: {type: banana}\n"))
  }

  test("env as a plain list declares required untyped inputs") {
    val t = Yaml.taskFromString("name: t\nrun: echo\nenv: [files, output]\n")
    assert(t.env.keySet == Set("FILES", "OUTPUT"))
    assert(t.env.values.forall(_.required))
  }

  test("relative data path requires a basedir") {
    intercept[SpecError](Yaml.jobFromString("name: j\ndata: relative/dir\n"))
    val j = Yaml.jobFromString("name: j\ndata: relative/dir\n", basedir = Some("/base"))
    assert(j.data == "/base/relative/dir")
  }

  test("strict input type validation: int is not float, bool is not int") {
    val t = Yaml.taskFromString(
      "name: t\nrun: echo\nenv:\n  F: {type: float}\n  I: {type: int}\n  B: {type: bool}\n")
    assert(Validation.validate(t,
      Map("F" -> EnvValue.IntV(1), "I" -> EnvValue.IntV(1), "B" -> EnvValue.BoolV(true)))
      .exists(_.contains("'F'")))
    assert(Validation.validate(t,
      Map("F" -> EnvValue.FloatV(1.0), "I" -> EnvValue.FloatV(1.0),
        "B" -> EnvValue.BoolV(true))).exists(_.contains("'I'")))
    assert(Validation.validate(t,
      Map("F" -> EnvValue.FloatV(1.0), "I" -> EnvValue.IntV(1),
        "B" -> EnvValue.IntV(1))).exists(_.contains("'B'")))
    assert(Validation.validate(t,
      Map("F" -> EnvValue.FloatV(1.0), "I" -> EnvValue.IntV(1),
        "B" -> EnvValue.BoolV(false))).isEmpty)
  }

  test("missing required input errors; defaults fill absent optionals") {
    val t = Yaml.taskFromString(
      "name: t\nrun: echo\nenv:\n  MUST: {required: true}\n  DEF: {default: hi}\n")
    assert(Validation.validate(t, Map.empty).exists(_.contains("MUST")))
    val env = Validation.withDefaults(t, Map("MUST" -> EnvValue.Str("x")))
    assert(env("DEF") == EnvValue.Str("hi"))
  }

  test("EnvValue renders python-style for subprocess crossing") {
    assert(EnvValue.BoolV(true).render == "True")
    assert(EnvValue.BoolV(false).render == "False")
    assert(EnvValue.IntV(3).render == "3")
    assert(EnvValue.FloatV(2.5).render == "2.5")
    assert(EnvValue.NullV.render == "null")
  }
}
