package graft.exec

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.spec.Yaml

/** Port of the reference end-to-end transcripts
  * (/root/reference/tests/test_end_to_end.py — all 7 tests mapped):
  *
  *   - test_execute_with_minimal_logging_no_timestamps (:352) and
  *     test_execute_with_moderate_logging_no_timestamps (:393)
  *       -> ported below LINE-FOR-LINE against a real bash echo task (the
  *          test reproduces graft.cli.Main's call sequence: the
  *          "Loading job manifest at:" preamble, the runner with a log
  *          context, the trailing "Done! \o/")
  *   - test_execute_bash_job (:176) -> the same transcript run exercises a
  *     real subprocess end-to-end (stdout streamed through the frame)
  *   - test_execute_bash_job_dryrun (:252) -> JobRunnerSpec "dryrun golden
  *     transcript" (resolved YAML dump + would-execute lines)
  *   - test_nested_job (:434) -> JobRunnerSpec "nested job via run-job op"
  *   - test_execute_with_failure (:522) -> JobRunnerSpec fail-fast /
  *     TaskFailure abort tests
  *   - test_invalid_job_yaml (:587) -> YamlSpec parse-error tests
  */
class RefMatrixE2ESpec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeFixture(): (Path, String) = {
    val dir = Files.createTempDirectory("graft-e2e")
    val tasks = dir.resolve("tasks/echo")
    Files.createDirectories(tasks)
    Files.writeString(tasks.resolve("manifest.yml"),
      """name: echo
        |env:
        |  - MESSAGE
        |run: sh -c 'echo "$MESSAGE"'
        |""".stripMargin)
    // the reference aborts on a missing data dir (job.py:211-214) and its
    // fixtures always pass an existing tmpdir — mirror that here
    Files.createDirectories(dir.resolve("data"))
    val jobYml = dir.resolve("job.yml")
    Files.writeString(jobYml,
      s"""name: minimal-test-job
         |data: $dir/data
         |tasks:
         |  - $dir/tasks
         |commands:
         |  - name: echo
         |    task: echo
         |    env:
         |      MESSAGE: Hello world!
         |""".stripMargin)
    (dir, jobYml.toString)
  }

  /** graft.cli.Main's sequence with a captured sink (Main itself boots its
    * own SparkSession, so the CLI body is reproduced here verbatim). */
  private def run(style: String): (Path, List[String]) = {
    val (dir, jobYml) = writeFixture()
    val buf = scala.collection.mutable.ListBuffer[String]()
    val ctx = new ContextLogger(buf += _, style = style, timestamps = false)
    val runner = new JobRunner(spark, buf += _, Some(ctx))
    ctx.info(s"Loading job manifest at: $jobYml")
    // "Done! \o/" is now logged by JobRunner.execute inside the job frame
    // (reference job.py:209), matching Main's CLI body.
    runner.execute(Yaml.jobFromFile(jobYml))
    (dir, buf.toList)
  }

  test("test_execute_with_minimal_logging_no_timestamps (:352)") {
    val (dir, got) = run("minimal")
    assert(got == List(
      s"Loading job manifest at: $dir/job.yml",
      "Executing job: minimal-test-job",
      "Parsed manifest for job: minimal-test-job",
      s"Discovering tasks at paths: ['$dir/tasks']",
      s"Loading task at: $dir/tasks/echo/manifest.yml",
      "Available tasks detected:",
      " - echo",
      "Executing command: echo (1 of 1)",
      "  name: echo",
      "  description: null",
      "  task: echo",
      "  env:",
      "    MESSAGE: Hello world!",
      "  skip: false",
      "Executing task: echo",
      "Hello world!",
      "Return code: 0",
      "Done! \\o/"))
  }

  test("test_execute_with_moderate_logging_no_timestamps (:393)") {
    val (dir, got) = run("moderate")
    assert(got == List(
      s"Loading job manifest at: $dir/job.yml",
      "─╴Executing job: minimal-test-job╶─",
      "Parsed manifest for job: minimal-test-job",
      s"Discovering tasks at paths: ['$dir/tasks']",
      s"Loading task at: $dir/tasks/echo/manifest.yml",
      "Available tasks detected:",
      " - echo",
      "━╸Executing command: echo (1 of 1)╺━",
      "  name: echo",
      "  description: null",
      "  task: echo",
      "  env:",
      "    MESSAGE: Hello world!",
      "  skip: false",
      "═╴Executing task: echo╶═",
      "Hello world!",
      "═╴Return code: 0╶═",
      "Done! \\o/"))
  }

  test("r15 sweep #4c: CLI -h golden matches stdlib argparse for __main__.py's parser") {
    // Golden generated from stdlib argparse at COLUMNS=80 for the exact
    // argument_parser() surface in the reference __main__.py:12-38 (prog
    // "xETL"; positional manifest; -c/--commands; -l/--log-style with the
    // mixed int/str choices list rendered verbatim in the metavar;
    // -t/--no-timestamps; --dryrun — note -t reuses -l's help string in the
    // reference, a quirk preserved here). Engine-only flags are listed AFTER
    // the golden so the reference transcript stays an exact prefix.
    val golden =
      "usage: xETL [-h] [-c COMMANDS] [-l {1,2,3,minimal,moderate,gaudy}] [-t]\n" +
      "            [--dryrun]\n" +
      "            manifest\n" +
      "\n" +
      "positional arguments:\n" +
      "  manifest              Path to job manifest YAML file. Relative paths are\n" +
      "                        resolved relative to the current working directory.\n" +
      "\n" +
      "options:\n" +
      "  -h, --help            show this help message and exit\n" +
      "  -c COMMANDS, --commands COMMANDS\n" +
      "                        Comma-separated list of commands to execute. Commands\n" +
      "                        will be executed in the order defined by the job,\n" +
      "                        regardless of the order in this list.\n" +
      "  -l {1,2,3,minimal,moderate,gaudy}, --log-style {1,2,3,minimal,moderate,gaudy}\n" +
      "                        Sets the amount to decoration to add around logs from\n" +
      "                        1 (minimal) to 3 (gaudy).\n" +
      "  -t, --no-timestamps   Sets the amount to decoration to add around logs from\n" +
      "                        1 (minimal) to 3 (gaudy).\n" +
      "  --dryrun              Print the task details instead of executing them\n"
    val h = graft.cli.Main.helpText
    assert(h.startsWith(golden), {
      val hl = h.linesIterator.toList; val gl = golden.linesIterator.toList
      val i = hl.zip(gl).indexWhere { case (a, b) => a != b }
      s"first divergence at line $i:\n  got: ${hl.lift(i)}\n  want: ${gl.lift(i)}"
    })
    assert(h.contains("engine extensions:"))
  }
}
