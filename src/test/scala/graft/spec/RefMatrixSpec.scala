package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** Case-by-case port of the reference's job-model test matrix — every test id
  * in `/root/reference/tests/models/test_job.py` (53 tests) is either ported
  * below (cited by reference line) or mapped to the suite that covers it:
  *
  *   - test_job_from_file (:24), _not_found (:28), _invalid_yaml (:49, :67)
  *       -> YamlSpec (jobFromFile basedir injection, parse errors)
  *   - test_conform_env_keys (:74), test_conform_env_invalid_values (:95)
  *       -> YamlSpec "root keys conform" + PropertySpec key-conforming laws
  *   - test_command_env_inherits_host_and_job_env (:242),
  *     test_command_env_names_are_conformed (:269)
  *       -> PlaceholderSpec propagation tests + PropertySpec fuzzyGet laws
  *   - test_command_invalid_name_raises (:298)
  *       -> YamlSpec "command names are validated against [a-z0-9-_]"
  *   - test_resolve_placeholders (:316), _non_string_types (:371),
  *     _complex_matches (:403), _none_value (:446),
  *     _unresolved_self_env_values (:471) -> ported below, row by row
  *   - relative/absolute data+tasks dirs (:505, :526, :550, :574, :592)
  *       -> ported below
  *   - job env / host env resolution of `data` (:612, :636) -> ported below
  *   - unknown-variable error catalogue (:659, :691, :728, :764),
  *     incomplete (:805) / too-many (:831) key paths -> ported below
  *   - ${tmp.dir}/${tmp.file}/${tmp.unknown} (:857, :887, :916) -> ported below
  *   - previous-reference errors (:937, :965), chained (:1006) and circular
  *     (:1036) references -> ported below
  *   - host-env inheritance family (:112-:242) -> ported below
  *   - test_execute_job_* (:1077-:1242) -> JobRunnerSpec (filter, dryrun,
  *     fail-fast, unknown task, no-tasks warning, skipped-still-resolve)
  */
class RefMatrixSpec extends AnyFunSuite {

  import EnvValue._

  private val home = sys.props("user.home")

  private def fromYaml(text: String, host: Map[String, String] = Map.empty,
      basedir: Option[String] = None,
      warn: String => Unit = _ => ()): Job =
    Placeholders.resolve(Yaml.jobFromString(text, basedir), host, warn)

  // --- test_resolve_placeholders (test_job.py:316-368), all 20 rows --------

  private def matrixJob(placeholder: String): Job = fromYaml(
    s"""name: Single composed job manifest
       |data: /data
       |env:
       |  VAR1: job-var1-value
       |  JOB_VAR: job-var-value
       |commands:
       |  - name: first-command
       |    task: task1
       |    env:
       |      VAR1: first-command-var1-value
       |      VAR_INT: 123
       |      VAR_FLOAT: 123.4
       |      VAR_BOOL: true
       |  - name: second-command
       |    task: task2
       |    env:
       |      VAR1: second-command-var1-value
       |      VAR2: "$placeholder"
       |""".stripMargin, basedir = Some("/path/to/job"))

  private val placeholderRows: Seq[(String, String)] = Seq(
    "${VAR1}" -> "second-command-var1-value",
    "${Var1}" -> "second-command-var1-value",
    "${JOB_VAR}" -> "job-var-value",
    "${Job_var}" -> "job-var-value",
    "${Job-var}" -> "job-var-value",
    "${JOB-VAR}" -> "job-var-value",
    "${previous.env.VAR1}" -> "first-command-var1-value",
    "${previous.env.Var1}" -> "first-command-var1-value",
    "${previous.env.JOB_VAR}" -> "job-var-value",
    "${first-command.env.VAR1}" -> "first-command-var1-value",
    "${first_command.env.VAR1}" -> "first-command-var1-value",
    "${First_Command.env.VAR1}" -> "first-command-var1-value",
    "${FIRST_COMMAND.ENV.VAR1}" -> "first-command-var1-value",
    "${first-command.env.JOB_VAR}" -> "job-var-value",
    "~/relative/path/" -> s"$home/relative/path/",
    "~/relative/path${job.basedir}" -> s"$home/relative/path/path/to/job",
    "${job.basedir}" -> "/path/to/job",
    "${JOB.Env.VAR1}" -> "job-var1-value",
    "${job.commands.0.env.VAR1}" -> "first-command-var1-value",
    "${}" -> "${}")

  placeholderRows.foreach { case (ph, expected) =>
    test(s"test_resolve_placeholders: $ph") {
      assert(matrixJob(ph).commands(1).env("VAR2") == Str(expected))
    }
  }

  // --- test_resolve_placeholders_non_string_types (:371-400), 6 rows -------

  private def typedJob(placeholder: String): EnvValue = fromYaml(
    s"""name: Job with non-string variable values
       |data: /data
       |env:
       |  VAR_INT: 123
       |  VAR_FLOAT: 123.4
       |  VAR_BOOL: true
       |commands:
       |  - name: first-command
       |    task: task1
       |    env:
       |      VAR: $placeholder
       |""".stripMargin).commands.head.env("VAR")

  test("test_resolve_placeholders_non_string_types: whole-match retains type") {
    assert(typedJob("${VAR_INT}") == IntV(123))
    assert(typedJob("${VAR_FLOAT}") == FloatV(123.4))
    assert(typedJob("${VAR_BOOL}") == BoolV(true))
  }

  test("test_resolve_placeholders_non_string_types: embedded stringifies") {
    assert(typedJob("'text: ${VAR_INT}'") == Str("text: 123"))
    assert(typedJob("'text: ${VAR_FLOAT}'") == Str("text: 123.4"))
    assert(typedJob("'text: ${VAR_BOOL}'") == Str("text: True"))
  }

  // --- test_resolve_placeholders_complex_matches (:403-443), all 16 rows ---

  private def complexJob(placeholder: String): EnvValue = fromYaml(
    s"""name: Job with complex placeholder matches
       |data: /data
       |env:
       |  JOB_VAR: job-var-value
       |commands:
       |  - name: first-command
       |    task: task1
       |    env:
       |      VAR: value
       |      PLACEHOLDER: $placeholder
       |""".stripMargin,
    basedir = Some("/path/to/job")).commands.head.env("PLACEHOLDER")

  private val complexRows: Seq[(String, String)] = Seq(
    "'[${VAR}$vAr]'" -> "[valuevalue]",
    "${VAR}${var}" -> "valuevalue",
    "'[${var}]'" -> "[value]",
    "$var$job-var" -> "valuejob-var-value",
    "${VAR}/${JOB_VAR}" -> "value/job-var-value",
    "$VAR/$$$JOB_VAR" -> "value/$job-var-value",
    "$$$VAR/$$$JOB_VAR/$$" -> "$value/$job-var-value/$",
    "$$$${VAR}" -> "$${VAR}",
    "$$$$VAR" -> "$$VAR",
    "$$${VAR}" -> "$value",
    // crafted: placeholder is 1 char longer than `value` so the scanner could
    // get confused with the adjacent literal `$` (reference comment, :414)
    "${VAR}/$$${JOB_VAR}" -> "value/$job-var-value",
    "${VAR}//$${JOB_VAR}" -> "value//${JOB_VAR}",
    "'[${job.DATA}] *${VAR}* $$${JOB_VAR}$'" -> "[/data] *value* $job-var-value$",
    "'[${job.data}] *${VAR}* $$${JOB_VAR}$'" -> "[/data] *value* $job-var-value$",
    "'[${JOB.BASEDIR}] *${VAR}* $$${JOB_VAR}$'" -> "[/path/to/job] *value* $job-var-value$",
    "'[${job.basedir}] *${VAR}* $$${JOB_VAR}$'" -> "[/path/to/job] *value* $job-var-value$")

  complexRows.foreach { case (ph, expected) =>
    test(s"test_resolve_placeholders_complex_matches: $ph") {
      assert(complexJob(ph) == Str(expected))
    }
  }

  // --- test_resolve_placeholders_none_value (:446-466) ---------------------

  Seq("null", "~").foreach { nullValue =>
    test(s"test_resolve_placeholders_none_value: $nullValue") {
      val env = fromYaml(
        s"""name: Job with null values
           |data: /data
           |env:
           |  JOB_VAR: $nullValue
           |commands:
           |  - name: first-command
           |    task: task1
           |    env:
           |      PLAIN: $$JOB_VAR
           |      EMBEDDED: this is $$JOB_VAR
           |""".stripMargin).commands.head.env
      assert(env("PLAIN") == NullV)
      assert(env("EMBEDDED") == Str("this is null"))
    }
  }

  // --- test_resolve_placeholders_unresolved_self_env_values (:471-501) -----

  test("test_resolve_placeholders_unresolved_self_env_values: single-pass raw") {
    val env = fromYaml(
      """name: Job with self references
        |data: /resolved-data-path
        |host-env: "*"
        |env:
        |  JOB_VAR: job-var-value
        |commands:
        |  - name: first-command
        |    task: task1
        |    env:
        |      VAR6: ${job.data}
        |      VAR5: "${VAR6}"
        |      VAR4: "${VAR4}"
        |      VAR3: "${VAR2}"
        |      VAR2: ${JOB_VAR}
        |      VAR1: ${HOST_VAR}
        |""".stripMargin,
      host = Map("HOST_VAR" -> "host-var-value")).commands.head.env
    assert(env == Map(
      "JOB_VAR" -> Str("job-var-value"),
      "HOST_VAR" -> Str("host-var-value"),
      "VAR6" -> Str("/resolved-data-path"),
      "VAR5" -> Str("/resolved-data-path"),
      "VAR4" -> Str("${VAR4}"), // self: raw, untouched
      "VAR3" -> Str("${JOB_VAR}"), // later var: raw value, substituted once
      "VAR2" -> Str("job-var-value"),
      "VAR1" -> Str("host-var-value")),
      "only variables referencing other envs (job or host) are resolved")
  }

  // --- relative/absolute data + tasks paths (:505, :526, :550, :574, :592) -

  test("test_resolve_rejects_relative_data_dir_when_loaded_from_string (:505)") {
    val e = intercept[SpecError](fromYaml(
      "name: j\ndata: relative/data/path\ncommands: []\n"))
    assert(e.getMessage.contains("Relative paths cannot be used when the " +
      "job manifest is loaded from a string: relative/data/path"))
  }

  test("test_resolve_rejects_relative_tasks_dir_when_loaded_from_string (:526)") {
    val e = intercept[SpecError](fromYaml(
      "name: j\ndata: /absolute/data/path\ntasks:\n  - relative/tasks/path\n"))
    assert(e.getMessage.contains("Relative paths cannot be used when the " +
      "job manifest is loaded from a string: relative/tasks/path"))
  }

  test("test_from_file_expands_relative_data_dir_to_file (:550) + tasks (:574)") {
    val j = fromYaml(
      "name: j\ndata: relative/data\ntasks:\n  - relative/tasks\n",
      basedir = Some("/base/dir"))
    assert(j.data == "/base/dir/relative/data")
    assert(j.tasks == List("/base/dir/relative/tasks"))
  }

  test("test_resolve_doesnt_expand_absolute_data_dir (:592)") {
    val j = fromYaml("name: j\ndata: /abs/data\n", basedir = Some("/base/dir"))
    assert(j.data == "/abs/data")
  }

  // --- data resolved from job/host env (:612, :636) ------------------------

  private val dataEnvManifest =
    """name: Single composed job manifest
      |data: "$DATA_PATH/path"
      |host-env:
      |  - DATA_PATH
      |env:
      |  DATA_PATH: /data/job-env
      |commands:
      |  - name: downloader
      |    task: download
      |    env:
      |      BASE_URL: http://example.com/data
      |      OUTPUT: ${job.data}/downloader/output
      |""".stripMargin

  test("test_resolve_job_env_with_default (:612)") {
    val j = fromYaml(dataEnvManifest)
    assert(j.data == "/data/job-env/path", "resolved from the job's env")
    assert(j.commands.head.env("OUTPUT") == Str(s"${j.data}/downloader/output"))
  }

  test("test_resolve_job_env_from_host_env (:636)") {
    val j = fromYaml(dataEnvManifest, host = Map("DATA_PATH" -> "/data/host-env"))
    assert(j.data == "/data/host-env/path", "host env overrides the job's env")
    assert(j.commands.head.env("OUTPUT") == Str(s"${j.data}/downloader/output"))
  }

  // --- unknown-variable error catalogue (:659, :691, :728, :764) -----------

  test("test_resolve_unknown_env_variable_no_vars_raises (:659)") {
    val e = intercept[SpecError](fromYaml(
      "name: j\ndata: /data\ncommands:\n  - name: downloader\n    task: ${unknown.something}\n"))
    assert(e.getMessage.contains("Invalid name `unknown` in `${unknown.something}`"))
    assert(e.getMessage.contains("No env variables defined"))
    assert(e.getMessage.contains("No previous commands defined"))
  }

  test("test_resolve_unknown_env_variable_no_current_env_raises (:728)") {
    val e = intercept[SpecError](fromYaml(
      """name: j
        |data: /data
        |commands:
        |  - name: first
        |    task: first
        |    env:
        |      VAR1: http://example.com/data
        |  - name: second
        |    task: $unknown
        |""".stripMargin))
    assert(e.getMessage.contains("Invalid name `unknown` in `$unknown`"))
    assert(e.getMessage.contains("name of a previous command: first"))
  }

  test("test_resolve_unknown_env_variable_with_previous_and_current_env_raises (:764)") {
    val e = intercept[SpecError](fromYaml(
      """name: j
        |data: /data
        |env:
        |  JOB_VAR: job-var-value
        |commands:
        |  - name: first
        |    task: first
        |    env:
        |      VAR1: http://example.com/data
        |  - name: second
        |    task: second
        |    env:
        |      VAR1: http://example.com/data
        |      VAR2: $unknown/foo/bar/baz
        |""".stripMargin))
    assert(e.getMessage.contains("Invalid name `unknown` in `$unknown`"))
    assert(e.getMessage.contains(
      "variable name in the current command's env: JOB_VAR, VAR1, VAR2"))
    assert(e.getMessage.contains("name of a previous command: first"))
  }

  test("test_resolve_incomplete_variable_path_raises (:805)") {
    val e = intercept[SpecError](fromYaml(
      """name: j
        |data: /data
        |commands:
        |  - name: downloader1
        |    task: download
        |    env:
        |      OUTPUT: ${job.data}/foo
        |  - name: downloader2
        |    task: download
        |    env:
        |      OUTPUT: ${previous}
        |""".stripMargin))
    assert(e.getMessage.contains("Incomplete key path, variable must " +
      "reference a leaf value: `${previous}` -- did you forget to wrap the " +
      "variable names in curly braces?"))
  }

  test("test_resolve_too_many_variable_paths_raises (:831)") {
    val e = intercept[SpecError](fromYaml(
      """name: j
        |data: /data
        |commands:
        |  - name: downloader1
        |    task: download
        |    env:
        |      OUTPUT: ${job.data}/foo
        |  - name: downloader2
        |    task: download
        |    env:
        |      OUTPUT: ${previous.env.OUTPUT.something}
        |""".stripMargin))
    assert(e.getMessage.contains("Could not drill in beyond `output` as it " +
      "does not refer to an object or a list"))
  }

  // --- ${tmp.*} allocation (:857, :887, :916) ------------------------------

  private def tmpManifest(kind: String, dataPath: String) =
    s"""name: j
       |data: $dataPath
       |commands:
       |  - name: downloader
       |    task: download
       |    env:
       |      OUTPUT: $${tmp.$kind}
       |  - name: splitter
       |    task: split
       |    env:
       |      FOO: $${previous.env.OUTPUT}
       |      OUTPUT: $${tmp.$kind}
       |""".stripMargin

  test("test_resolve_tmp_dir (:857)") {
    val data = java.nio.file.Files.createTempDirectory("graft-refmatrix").toString
    val j = fromYaml(tmpManifest("dir", data))
    val outs = j.commands.map(_.env("OUTPUT").render)
    assert(outs.forall(_.startsWith(data + "/tmp/")))
    assert(outs.forall(p => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p))))
    assert(outs.distinct.length == 2, "every tmp value is a different value")
    assert(j.commands(1).env("FOO").render == outs.head,
      "references to a tmp dir share its value")
  }

  test("test_resolve_tmp_file (:887)") {
    val data = java.nio.file.Files.createTempDirectory("graft-refmatrix").toString
    val j = fromYaml(tmpManifest("file", data))
    val outs = j.commands.map(_.env("OUTPUT").render)
    assert(outs.forall(_.startsWith(data + "/tmp/")))
    assert(outs.forall(p => java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(p))))
    assert(outs.distinct.length == 2)
    assert(j.commands(1).env("FOO").render == outs.head)
  }

  test("test_resolve_tmp_unknown (:916)") {
    val data = java.nio.file.Files.createTempDirectory("graft-refmatrix").toString
    val e = intercept[SpecError](fromYaml(
      s"name: j\ndata: $data\ncommands:\n  - name: d\n    task: t\n    env:\n      OUTPUT: $${tmp.unknown}\n"))
    assert(e.getMessage.contains("Invalid use of ${tmp} placeholder in " +
      "`${tmp.unknown}`. Expected `tmp.dir` or `tmp.file`"))
  }

  // --- previous-reference errors + chains (:937, :965, :1006, :1036) -------

  test("test_resolve_variable_previous_unknown_variable_raises (:937)") {
    val e = intercept[SpecError](fromYaml(
      """name: j
        |data: /data
        |commands:
        |  - name: downloader
        |    task: download
        |    env:
        |      OUTPUT: /data/output1
        |  - name: splitter
        |    task: split
        |    env:
        |      FOO: ${previous.unknown}
        |""".stripMargin))
    assert(e.getMessage.contains("Invalid placeholder `unknown` in " +
      "${previous.unknown}. Valid keys are: `description`, `env`, `name`, " +
      "`skip`, `task`"))
  }

  test("test_resolve_variable_previous_output_first_command_raises (:965)") {
    val e = intercept[SpecError](fromYaml(
      """name: j
        |data: /data
        |commands:
        |  - name: splitter
        |    task: split
        |    env:
        |      FOO: ${previous.env.output}
        |""".stripMargin))
    assert(e.getMessage.contains("Cannot use ${previous} placeholder on the first command"))
  }

  test("test_resolve_variable_chained_placeholders (:1006)") {
    val j = fromYaml(
      """name: j
        |data: /data
        |commands:
        |  - name: downloader1
        |    task: download
        |    env:
        |      BASE_URL: http://example.com${job.data}
        |      OUTPUT: /tmp/data/d1
        |  - name: downloader2
        |    task: download
        |    env:
        |      BASE_URL: ${downloader1.env.base_url}
        |      OUTPUT: /tmp/data/d2
        |  - name: downloader3
        |    task: download
        |    env:
        |      BASE_URL: ${downloader2.env.base_url}
        |      OUTPUT: /tmp/data/d3
        |""".stripMargin)
    assert(j.commands.map(_.env("BASE_URL").render) ==
      List.fill(3)("http://example.com/data"))
  }

  test("test_resolve_variable_circular_placeholders_raises (:1036)") {
    val e = intercept[SpecError](fromYaml(
      """name: j
        |data: /data
        |commands:
        |  - name: downloader1
        |    task: download
        |    env:
        |      BASE_URL: http://example.com${job.DATA}
        |      OUTPUT: ${downloader2.env.output}
        |  - name: downloader2
        |    task: download
        |    env:
        |      BASE_URL: http://example.com${job.DATA}
        |      OUTPUT: ${downloader1.env.output}
        |""".stripMargin))
    assert(e.getMessage.contains("downloader2"),
      "the forward half of the cycle is the reported error")
  }

  // --- host-env inheritance family (:112-:242) ------------------------------

  test("test_host_env_default_inherit_defined (:112)") {
    val j = fromYaml("name: j\ndata: /data\nenv:\n  VAR1: job-var1-value\ncommands: []\n",
      host = Map("VAR1" -> "host-var1-value", "VAR2" -> "host-var2-value"))
    assert(!j.env.contains("VAR2"), "should not inherit undeclared VAR2")
    assert(j.env == Map("VAR1" -> Str("host-var1-value")))
  }

  Seq("'*'" -> "inline", "\n  - '*'" -> "list", "\n  - V1\n  - '*'" -> "mixed")
    .foreach { case (all, label) =>
      test(s"test_host_env_inherit_all (:129) [$label]") {
        val j = fromYaml(
          s"name: j\ndata: /data\nhost-env: $all\nenv:\n  VAR3: job-var3-value\ncommands: []\n",
          host = Map("VAR1" -> "host-var1-value", "VAR2" -> "host-var2-value"))
        assert(j.env.get("VAR1") == Some(Str("host-var1-value")))
        assert(j.env.get("VAR2") == Some(Str("host-var2-value")))
        assert(j.env.get("VAR3") == Some(Str("job-var3-value")))
      }
    }

  test("test_host_env_inherit_all_mixed_warns (:146)") {
    var warned = List.empty[String]
    fromYaml("name: j\ndata: /data\nhost-env:\n  - VAR1\n  - '*'\ncommands: []\n",
      host = Map("VAR1" -> "v"), warn = w => warned ::= w)
    assert(warned.exists(_.contains("The `*` value in `job.host_env` was " +
      "specified alongside other values")))
  }

  test("test_host_env_subset (:167)") {
    val j = fromYaml("name: j\ndata: /data\nhost-env:\n  - VAR1\ncommands: []\n",
      host = Map("VAR1" -> "host-var1-value", "VAR2" -> "host-var2-value"))
    assert(j.env.get("VAR1") == Some(Str("host-var1-value")))
    assert(!j.env.contains("VAR2"))
  }

  test("test_host_env_not_used_warns (:183)") {
    var warned = List.empty[String]
    fromYaml(
      "name: j\ndata: /data\nhost-env:\n  - NOT_SET\n  - SET_BY_JOB\nenv:\n  SET_BY_JOB: set-by-job\ncommands: []\n",
      host = Map("VAR1" -> "v"), warn = w => warned ::= w)
    assert(warned.exists(_.contains(
      "The following host environment variables did not receive a value: NOT_SET")))
    assert(!warned.exists(_.contains("SET_BY_JOB")),
      "no warning for allowlisted names that have a job-env default")
  }

  test("test_host_env_overrides_job_env (:208)") {
    val j = fromYaml("name: j\ndata: /data\nhost-env: \"*\"\nenv:\n  VAR1: job-var1-value\ncommands: []\n",
      host = Map("VAR1" -> "host-var1-value", "VAR2" -> "host-var2-value"))
    assert(j.env.get("VAR1") == Some(Str("host-var1-value")))
    assert(j.env.get("VAR2") == Some(Str("host-var2-value")))
  }

  Seq("[]", "null").foreach { hostEnv =>
    test(s"test_host_env_not_allowed (:226) [$hostEnv]") {
      val j = fromYaml(
        s"name: j\ndata: /data\nhost-env: $hostEnv\nenv:\n  VAR1: job-var1-value\ncommands: []\n",
        host = Map("VAR1" -> "host-var1-value", "VAR2" -> "host-var2-value"))
      assert(j.env == Map("VAR1" -> Str("job-var1-value")),
        "explicit empty/null host-env disables inheritance entirely")
    }
  }
}
