package graft.spec

import java.nio.file.{Files, Paths}

/** Placeholder resolution — the reference's 200-line interpolation engine
  * (job.py:263-467), re-implemented with the same tested semantics
  * (tests/models/test_job.py:316-467, 857-934, 984-1073):
  *
  *  - `$$` is a literal `$` escape
  *  - `${job.*}`, `${previous.*}`, `${<named-command>.*}` drill-down (fuzzy keys,
  *    list indexes: `${job.commands.0.env.VAR1}`)
  *  - bare `$VAR` resolves in the current command's merged env (recursively, with
  *    cycle detection)
  *  - `${tmp.dir}` / `${tmp.file}` allocate fresh scratch paths under `<data>/tmp`,
  *    one per occurrence
  *  - whole-match type retention: a value that is exactly one placeholder keeps the
  *    referenced value's type; embedded references stringify (`None` → `"null"`)
  *  - `previous` advances per command; named references may only point backwards
  *    (self/forward/circular references error); skipped commands still resolve and
  *    remain referenceable
  *  - leading `~` in resolved strings expands to the user home
  */
object Placeholders {

  private val BareName = "[A-Za-z_][A-Za-z0-9_]*".r

  sealed private trait Part
  private final case class Lit(s: String) extends Part
  private final case class Ref(path: List[String], raw: String, bare: Boolean) extends Part

  /** Env inheritance (reference inherit_env, job.py:231-252): allowlisted host vars
    * override job env; `*` widens the allowlist to every job-env key; allowlisted
    * names missing from the host produce a warning. */
  def inheritEnv(job: Job, host: Map[String, String],
      warn: String => Unit = _ => ()): Map[String, EnvValue] = {
    val allow = if (job.hostEnv.contains("*")) job.env.keys.toList.sorted else job.hostEnv
    allow.foldLeft(job.env) { (acc, k) =>
      host.get(k) match {
        case Some(v) => acc + (k -> EnvValue.Str(v))
        case None =>
          if (!job.hostEnv.contains("*")) warn(s"host env variable '$k' is not set")
          acc
      }
    }
  }

  /** Resolve every command env in order. Returns the job with fully-resolved command
    * envs (and the inherited job env). */
  def resolve(job: Job, host: Map[String, String] = sys.env,
      warn: String => Unit = _ => ()): Job = {
    val jobEnv = inheritEnv(job, host, warn)
    val tmpBase = Paths.get(job.data, "tmp")
    var resolvedByName = Map.empty[String, Command]
    var previous: Option[Command] = None
    val out = job.commands.map { cmd =>
      // propagate_env (job.py:255-260): job env under command env, command wins
      val merged = jobEnv ++ cmd.env
      val ctx = new Ctx(job, jobEnv, merged, resolvedByName, previous, tmpBase)
      val resolvedEnv = merged.map { case (k, v) => k -> ctx.resolveValue(k, v) }
      val rc = cmd.copy(env = resolvedEnv)
      cmd.name.foreach(n => resolvedByName += Keys.snake(n) -> rc)
      previous = Some(rc) // skipped commands still advance `previous` and resolve
      rc
    }
    job.copy(env = jobEnv, commands = out)
  }

  private final class Ctx(
      job: Job,
      jobEnv: Map[String, EnvValue],
      currentEnv: Map[String, EnvValue],
      named: Map[String, Command],
      previous: Option[Command],
      tmpBase: java.nio.file.Path) {

    private var resolving = Set.empty[String] // cycle detection for bare $VAR

    def resolveValue(key: String, v: EnvValue): EnvValue = v match {
      case EnvValue.Str(s) =>
        resolving += key
        try interpolate(s)
        finally resolving -= key
      case other => other
    }

    def interpolate(s: String): EnvValue = {
      val parts = parse(s)
      parts match {
        case List(r: Ref) => expandTilde(lookup(r)) // whole-match type retention
        case _ =>
          val sb = new StringBuilder
          parts.foreach {
            case Lit(t) => sb.append(t)
            case r: Ref => sb.append(lookup(r).render)
          }
          expandTilde(EnvValue.Str(sb.toString))
      }
    }

    private def expandTilde(v: EnvValue): EnvValue = v match {
      case EnvValue.Str(s) if s == "~" || s.startsWith("~/") =>
        EnvValue.Str(Yaml.expandHome(s))
      case other => other
    }

    private def lookup(r: Ref): EnvValue = {
      val head = Keys.snake(r.path.head)
      (head, r.path.tail) match {
        case (_, Nil) if r.bare => currentVar(r.path.head)
        case ("tmp", List(kind)) => tmpAlloc(Keys.snake(kind), r.raw)
        case ("job", rest) => drill(jobNode, rest, r.raw)
        case ("previous", rest) =>
          val p = previous.getOrElse(throw SpecError(
            s"invalid reference '${r.raw}': no previous command at this position"))
          drill(commandNode(p), rest, r.raw)
        case (name, rest) =>
          named.get(name) match {
            case Some(cmd) => drill(commandNode(cmd), rest, r.raw)
            case None =>
              val exists = job.commands.exists(_.name.exists(n => Keys.snake(n) == name))
              if (exists) throw SpecError(
                s"invalid reference '${r.raw}': command '$name' has not run yet " +
                  "(self/forward/circular references are not allowed)")
              else throw SpecError(s"unresolvable reference '${r.raw}'")
          }
      }
    }

    /** Bare `$VAR`: current command env, resolved recursively with cycle detection. */
    private def currentVar(name: String): EnvValue = {
      val key = Keys.envKey(name)
      if (resolving.contains(key))
        throw SpecError(s"circular reference involving '$$$name'")
      Keys.fuzzyGet(currentEnv, key) match {
        case Some(EnvValue.Str(s)) if s.contains("$") =>
          resolving += key
          try interpolate(s) finally resolving -= key
        case Some(v) => v
        case None => throw SpecError(s"unresolvable variable '$$$name'")
      }
    }

    private def tmpAlloc(kind: String, raw: String): EnvValue = {
      Files.createDirectories(tmpBase)
      kind match {
        case "dir" => EnvValue.Str(Files.createTempDirectory(tmpBase, "tmp").toString)
        case "file" => EnvValue.Str(Files.createTempFile(tmpBase, "tmp", "").toString)
        case other => throw SpecError(s"invalid reference '$raw': tmp.$other")
      }
    }

    // --- drill-down over a tree of maps/lists/values -------------------------

    sealed private trait Node
    private final case class MapNode(m: Map[String, Node]) extends Node
    private final case class ListNode(l: List[Node]) extends Node
    private final case class ValNode(v: EnvValue) extends Node

    private def envNode(env: Map[String, EnvValue]): Node =
      MapNode(env.map { case (k, v) => k -> ValNode(v) })

    private def commandNode(c: Command): Node = MapNode(Map(
      "name" -> ValNode(c.name.map(EnvValue.Str).getOrElse(EnvValue.NullV)),
      "task" -> ValNode(EnvValue.Str(c.task)),
      "skip" -> ValNode(EnvValue.BoolV(c.skip)),
      "env" -> envNode(c.env)))

    private def jobNode: Node = MapNode(Map(
      "name" -> ValNode(EnvValue.Str(job.name)),
      "description" -> ValNode(job.description.map(EnvValue.Str).getOrElse(EnvValue.NullV)),
      "data" -> ValNode(EnvValue.Str(job.data)),
      "basedir" -> ValNode(job.basedir.map(EnvValue.Str).getOrElse(EnvValue.NullV)),
      "env" -> envNode(jobEnv),
      "commands" -> ListNode(job.commands.map(commandNode))))

    private def drill(node: Node, path: List[String], raw: String): EnvValue =
      path match {
        case Nil => node match {
          case ValNode(v) => v
          case _ => throw SpecError(s"invalid reference '$raw': not a value")
        }
        case seg :: rest => node match {
          case MapNode(m) => Keys.fuzzyGet(m, seg) match {
            case Some(child) => drill(child, rest, raw)
            case None => throw SpecError(s"unresolvable reference '$raw' (at '$seg')")
          }
          case ListNode(l) =>
            val idx = try seg.toInt catch {
              case _: NumberFormatException =>
                throw SpecError(s"invalid reference '$raw': '$seg' is not a list index")
            }
            if (idx < 0 || idx >= l.length)
              throw SpecError(s"invalid reference '$raw': index $idx out of range")
            drill(l(idx), rest, raw)
          case ValNode(_) =>
            throw SpecError(s"unresolvable reference '$raw' (at '$seg')")
        }
      }
  }

  /** Scanner: `$$` → literal `$`; `${a.b.c}`; bare `$NAME`. */
  private def parse(s: String): List[Part] = {
    val out = scala.collection.mutable.ListBuffer[Part]()
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) { out += Lit(lit.toString); lit.clear() }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '$' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        if (n == '$') { lit.append('$'); i += 2 }
        else if (n == '{') {
          val end = s.indexOf('}', i + 2)
          if (end < 0) throw SpecError(s"unterminated placeholder in: $s")
          val inner = s.substring(i + 2, end).trim
          if (inner.isEmpty) throw SpecError(s"empty placeholder in: $s")
          flush()
          out += Ref(inner.split('.').toList.map(_.trim), s.substring(i, end + 1),
            bare = false)
          i = end + 1
        } else {
          BareName.findPrefixOf(s.substring(i + 1)) match {
            case Some(name) =>
              flush()
              out += Ref(List(name), s"$$$name", bare = true)
              i += 1 + name.length
            case None => lit.append(c); i += 1
          }
        }
      } else { lit.append(c); i += 1 }
    }
    flush()
    out.toList
  }
}
