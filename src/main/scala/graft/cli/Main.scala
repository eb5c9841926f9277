package graft.cli

import org.apache.spark.sql.SparkSession
import graft.exec.{ContextLogger, JobRunner, TaskFailure}
import graft.spec.Yaml

/** CLI entry point (reference __main__.py:12-63):
  * `graft.cli.Main job.yml [-c cmd1,cmd2] [--dry-run] [--log-style box|plain|compact]
  * [--no-timestamps]`. Exit code mirrors a failing task's return code. */
object Main {
  def main(args: Array[String]): Unit = {
    var manifest: Option[String] = None
    var commands: Option[Seq[String]] = None
    var dryrun = false
    var style = "box"
    var timestamps = true
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-c" | "--commands" => commands = Some(args(i + 1).split(",").toSeq); i += 2
        case "--dry-run" | "--dryrun" => dryrun = true; i += 1
        case "--log-style" =>
          style = args(i + 1)
          if (!Set("box", "plain", "compact").contains(style)) {
            System.err.println(s"invalid --log-style '$style' (box|plain|compact)")
            sys.exit(2)
          }
          i += 2
        case "--no-timestamps" => timestamps = false; i += 1
        case other => manifest = Some(other); i += 1
      }
    }
    val path = manifest.getOrElse {
      System.err.println("usage: graft.cli.Main <job.yml> [-c commands] [--dry-run] " +
        "[--log-style box|plain|compact] [--no-timestamps]")
      sys.exit(2)
    }
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
      new JobRunner(spark, println, Some(ctx))
        .execute(Yaml.jobFromFile(path), commands, dryrun)
    } catch {
      case TaskFailure(_, rc) => spark.stop(); sys.exit(rc)
      case e: Exception =>
        System.err.println(s"ERROR: ${e.getMessage}")
        spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
