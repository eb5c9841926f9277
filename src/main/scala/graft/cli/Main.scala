package graft.cli

import org.apache.spark.sql.SparkSession
import graft.exec.{ContextLogger, JobRunner, TaskFailure}
import graft.spec.Yaml

/** CLI entry point (reference __main__.py:12-63):
  * `graft.cli.Main job.yml [-c cmd1,cmd2] [--dry-run] [-l|--log-style STYLE]
  * [-t|--no-timestamps]`. Exit code mirrors a failing task's return code.
  *
  * Log styles accept BOTH this engine's names and the reference's spellings
  * (__main__.py `choices=["minimal","moderate","gaudy"]`, default gaudy):
  * gaudy→box (default), moderate→compact, minimal→plain. */
object Main {

  private val usage = "usage: graft.cli.Main <job.yml> [-c commands] [--dry-run] " +
    "[-l|--log-style box|compact|plain|gaudy|moderate|minimal] [-t|--no-timestamps] " +
    "[--test-task NAME]"

  // Reference spellings are canonical (ContextLogger renders the reference's
  // golden transcripts); this engine's earlier names remain as aliases.
  private val styleAliases = Map(
    "gaudy" -> "gaudy", "moderate" -> "moderate", "minimal" -> "minimal",
    "box" -> "gaudy", "compact" -> "moderate", "plain" -> "minimal")

  def main(args: Array[String]): Unit = {
    def usageExit(msg: String): Nothing = {
      System.err.println(msg)
      System.err.println(usage)
      sys.exit(2)
    }
    // flags taking a value must not be the last argument (ADVICE: unguarded
    // args(i+1) threw ArrayIndexOutOfBounds instead of printing usage)
    def valueOf(flag: String, i: Int): String =
      if (i + 1 < args.length) args(i + 1) else usageExit(s"$flag requires a value")
    var manifest: Option[String] = None
    var commands: Option[Seq[String]] = None
    var dryrun = false
    var style = "box"
    var timestamps = true
    var testTask: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case f @ ("-c" | "--commands") =>
          commands = Some(valueOf(f, i).split(",").toSeq); i += 2
        case "--dry-run" | "--dryrun" => dryrun = true; i += 1
        case f @ ("-l" | "--log-style") =>
          val v = valueOf(f, i)
          style = styleAliases.getOrElse(v,
            usageExit(s"invalid $f '$v' (box|compact|plain|gaudy|moderate|minimal)"))
          i += 2
        case "-t" | "--no-timestamps" => timestamps = false; i += 1
        case f @ "--test-task" => testTask = Some(valueOf(f, i)); i += 2
        case other => manifest = Some(other); i += 1
      }
    }
    val path = manifest.getOrElse(usageExit("missing job manifest path"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ctx = new ContextLogger(println, style, timestamps)
      val runner = new JobRunner(spark, println, Some(ctx))
      ctx.info(s"Loading job manifest at: $path")
      testTask match {
        case Some(name) =>
          val results = runner.testTask(Yaml.jobFromFile(path), name)
          if (results.values.exists(!_)) { spark.stop(); sys.exit(1) }
        case None =>
          // "Done! \o/" is logged by JobRunner.execute inside the job frame
          // (reference job.py:209) — not here after the frame closes.
          runner.execute(Yaml.jobFromFile(path), commands, dryrun)
      }
    } catch {
      case TaskFailure(_, rc) => spark.stop(); sys.exit(rc)
      case e: Exception =>
        System.err.println(s"ERROR: ${e.getMessage}")
        spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
