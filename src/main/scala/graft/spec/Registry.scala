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

  def discover(paths: Seq[String], warn: String => Unit = _ => (),
      info: String => Unit = _ => ()): Registry = {
    val found = scala.collection.mutable.LinkedHashMap[String, Task]()
    paths.foreach { p =>
      val root = Paths.get(p)
      if (Files.isDirectory(root)) {
        val manifests = Files.walk(root).iterator().asScala
          .filter(f => f.getFileName.toString == "manifest.yml" &&
            !f.iterator().asScala.exists(_.toString == "tests"))
          .toList.sortBy(_.toString)
        manifests.foreach { m =>
          info(s"Loading task at: $m")
          try {
            val t = Yaml.taskFromFile(m.toString)
            found(Keys.snake(t.name)) = t
          } catch {
            case e: Exception => warn(s"skipping broken task manifest $m: ${e.getMessage}")
          }
        }
      } else warn(s"tasks path '$p' is not a directory")
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
