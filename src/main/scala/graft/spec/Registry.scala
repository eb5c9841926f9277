package graft.spec

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Task discovery + registry (reference discover_tasks, task.py:350-384): walk the
  * given directories for `manifest.yml` files, skipping `tests/` subtrees, collecting
  * alphabetically; a broken manifest is skipped with a warning, never fatal. Task
  * lookup is case-insensitive. The engine pre-seeds the registry with its built-in
  * Spark operators (graft.exec.Ops). */
final class Registry private (tasks: Map[String, Task]) {
  def get(name: String): Option[Task] = Keys.fuzzyGet(tasks, Keys.snake(name))
  def names: List[String] = tasks.keys.toList.sorted
  def withTask(t: Task): Registry = new Registry(tasks + (Keys.snake(t.name) -> t))
}

object Registry {

  def apply(tasks: Seq[Task]): Registry =
    new Registry(tasks.map(t => Keys.snake(t.name) -> t).toMap)

  /** Fidelity notes (task.py:350-384, round-14 fresh-eyes sweep):
    *  - walk is top-down with per-level alphabetical dir order (`dirs.sort()`),
    *    `tests` subtrees excluded CASE-INSENSITIVELY (`d.lower() != "tests"`);
    *  - a duplicate task name silently overrides an earlier one
    *    (`tasks[task.name] = task` — last discovered wins, NO warning), and a
    *    later path in a multi-path list wins over an earlier one the same way
    *    (`tasks.update(...)`);
    *  - a dir "has a manifest" if ANY of its files lowercases to
    *    `manifest.yml`/`manifest.yaml`, but the loader then reads the literal
    *    `<dir>/manifest.yml` — a dir shipping only `manifest.yaml` is
    *    detected, fails to load, and is skipped with the warning
    *    ("Skipping task at `<dir>` due to error: ..."). */
  def discover(paths: Seq[String], warn: String => Unit = _ => (),
      info: String => Unit = _ => (),
      error: String => Unit = null): Registry = {
    // reference level split (task.py:380 vs :382): expected manifest failures
    // log at WARNING, the catch-all unexpected branch at ERROR (round-15
    // fresh-eyes sweep #4a); callers that don't care pass only `warn`
    val err: String => Unit = if (error ne null) error else warn
    val found = scala.collection.mutable.LinkedHashMap[String, Task]()
    def walk(dir: Path): Unit = {
      val entries =
        try Files.list(dir).iterator().asScala.toList
        catch { case _: Exception => Nil }
      val hasManifest = entries.exists { f =>
        val n = f.getFileName.toString.toLowerCase
        Files.isRegularFile(f) && (n == "manifest.yml" || n == "manifest.yaml")
      }
      if (hasManifest) {
        val m = dir.resolve("manifest.yml")
        info(s"Loading task at: $m")
        try {
          val t = Yaml.taskFromFile(m.toString)
          found(Keys.snake(t.name)) = t
        } catch {
          case e: SpecError =>
            warn(s"Skipping task at `$dir` due to error: ${e.getMessage}")
          case e: Exception =>
            err(s"Skipping task at `$dir` due to unexpected error: ${e.getMessage}")
        }
      }
      entries.filter(Files.isDirectory(_))
        .filter(_.getFileName.toString.toLowerCase != "tests")
        .sortBy(_.getFileName.toString)
        .foreach(walk)
    }
    paths.foreach { p =>
      val root = Paths.get(p)
      if (Files.isDirectory(root)) walk(root)
      else warn(s"tasks path '$p' is not a directory")
    }
    new Registry(found.toMap)
  }
}

/** Operator-parameter analysis (reference Task.validate_inputs, task.py:259-289):
  * unknown inputs warn; missing required inputs error; declared types are checked
  * strictly (`int` is not `float`, bool is not int). Runs for every command before
  * anything executes (fail-fast, job.py:198-200). */
object Validation {
  def validate(task: Task, env: Map[String, EnvValue],
      warn: String => Unit = _ => ()): List[String] = {
    val errors = scala.collection.mutable.ListBuffer[String]()
    env.keys.foreach { k =>
      if (Keys.fuzzyGet(task.env, k).isEmpty && task.env.nonEmpty)
        warn(s"unknown input '$k' for task '${task.name}'")
    }
    task.env.foreach { case (k, schema) =>
      Keys.fuzzyGet(env, k) match {
        case None | Some(EnvValue.NullV) if schema.required =>
          errors += s"missing required input '$k' for task '${task.name}'"
        case Some(v) =>
          schema.inputType.foreach { t =>
            if (v != EnvValue.NullV && !t.matches(v))
              errors += s"input '$k' for task '${task.name}' expects $t, got: ${v.render}"
          }
        case _ => ()
      }
    }
    errors.toList
  }

  /** Apply declared defaults for absent optional inputs (task.py:291-307). */
  def withDefaults(task: Task, env: Map[String, EnvValue]): Map[String, EnvValue] =
    task.env.foldLeft(env) { case (acc, (k, schema)) =>
      if (Keys.fuzzyGet(acc, k).isEmpty)
        schema.default.map(d => acc + (k -> d)).getOrElse(acc)
      else acc
    }
}
