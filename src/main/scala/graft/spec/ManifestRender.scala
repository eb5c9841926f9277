package graft.spec

/** Renders a resolved [[Job]] back into YAML-shaped lines for the dryrun transcript
  * (reference job.py:160-171: `yaml.dump(model_dump(exclude_unset=True),
  * sort_keys=False)` printed line-by-line under the JOB log context, golden-tested in
  * tests/test_end_to_end.py:252-349). Users run dryrun to inspect fully-resolved
  * placeholders, so the render must keep the nested structure — host_env and tasks as
  * YAML lists, env as nested mappings, commands as a list of mappings.
  *
  * Like `exclude_unset`, absent/empty optional fields are omitted. One documented
  * deviation: env keys render in sorted order (the engine's env maps are unordered;
  * the reference preserves manifest insertion order). */
object ManifestRender {

  def job(j: Job): List[String] = {
    val b = List.newBuilder[String]
    b += s"name: ${scalar(EnvValue.Str(j.name))}"
    j.description.foreach(d => b += s"description: ${scalar(EnvValue.Str(d))}")
    j.basedir.foreach(d => b += s"basedir: ${scalar(EnvValue.Str(d))}")
    b += s"data: ${scalar(EnvValue.Str(j.data))}"
    if (j.hostEnv.nonEmpty) {
      b += "host_env:"
      j.hostEnv.foreach(h => b += s"- $h")
    }
    if (j.env.nonEmpty) {
      b += "env:"
      envLines(j.env).foreach(l => b += s"  $l")
    }
    if (j.tasks.nonEmpty) {
      b += "tasks:"
      j.tasks.foreach(t => b += s"- ${scalar(EnvValue.Str(t))}")
    }
    if (j.commands.nonEmpty) {
      b += "commands:"
      j.commands.foreach { c =>
        command(c).zipWithIndex.foreach { case (l, k) =>
          b += (if (k == 0) s"- $l" else s"  $l")
        }
      }
    }
    b.result()
  }

  def command(c: Command): List[String] = {
    val b = List.newBuilder[String]
    c.name.foreach(n => b += s"name: $n")
    b += s"task: ${scalar(EnvValue.Str(c.task))}"
    if (c.env.nonEmpty) {
      b += "env:"
      envLines(c.env).foreach(l => b += s"  $l")
    }
    if (c.skip) b += "skip: true"
    b.result()
  }

  private def envLines(env: Map[String, EnvValue]): List[String] =
    env.toList.sortBy(_._1).map { case (k, v) => s"$k: ${scalar(v)}" }

  /** YAML-native scalar: booleans lowercase, numbers bare, strings plain only when
    * the plain form provably parses back to the identical string in mapping
    * position — checked by actually parsing, because YAML 1.1 has far too many
    * scalar re-interpretations to enumerate (boolean/null spellings,
    * decimal/hex/octal/sexagesimal numbers, timestamps, indicators, comments);
    * anything else is single-quoted. Dryrun-only path, so the per-value parse is
    * free of hot-path concerns. */
  def scalar(v: EnvValue): String = v match {
    case EnvValue.Str(s) =>
      if (plainParsesExactly(s)) s else "'" + s.replace("'", "''") + "'"
    case EnvValue.BoolV(b) => if (b) "true" else "false"
    case EnvValue.NullV => "null"
    case other => other.render
  }

  private def plainParsesExactly(s: String): Boolean =
    s.nonEmpty && !s.exists(c => c == '\n' || c == '\r') &&
      (try {
        new org.yaml.snakeyaml.Yaml().load[Any](s"k: $s") match {
          case m: java.util.Map[_, _] => m.size == 1 && m.get("k") == s
          case _ => false
        }
      } catch { case _: Exception => false })
}
