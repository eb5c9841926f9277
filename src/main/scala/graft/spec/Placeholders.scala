package graft.spec

import java.nio.file.{Files, Paths}

import scala.collection.immutable.VectorMap

/** Placeholder resolution — the reference's interpolation engine
  * (job.py:220-467), re-implemented with the reference's tested semantics
  * (tests/models/test_job.py:112-242, 316-501, 612-934, 984-1073):
  *
  *  - `$$` is a literal `$` escape; text produced by an escape never starts a
  *    new match
  *  - names are `[\w-]+` (dash allowed, fuzzy-cased); `${a.b.c}` drills down
  *    (list indexes: `${job.commands.0.env.VAR1}`). Malformed braced forms —
  *    empty `${}`, unterminated `${abc`, segments with other characters — stay
  *    literal text (the reference's regex simply does not match them)
  *  - a single-segment reference (`$VAR` or `${VAR}`) reads the current
  *    model's env SINGLE-PASS: entries resolve in declaration order, earlier
  *    entries are seen resolved, later/self entries substitute their RAW text
  *    exactly once with no rescan (test_job.py:471-501 — "only variables
  *    referencing other envs are resolved"); unknown single names fall
  *    through to the named-command namespace before erroring
  *  - `${job.*}`, `${previous.*}`, `${<named-command>.*}` drill-downs;
  *    `previous` advances only past NAMED commands and is cleared by an
  *    unnamed one (job.py:458-464); named references may only point
  *    backwards (forward references error); skipped commands still resolve
  *    and remain referenceable
  *  - `${tmp.dir}` / `${tmp.file}` allocate fresh scratch paths under
  *    `<data>/tmp`, one per occurrence, using the job's CURRENT (resolved)
  *    data path
  *  - whole-match type retention: a value that is exactly one placeholder
  *    keeps the referenced value's type; embedded references stringify
  *    (`None` → `"null"`, booleans python-style)
  *  - the job's own `name`/`description`/`data` fields resolve against the
  *    inherited job env BEFORE the job env's values resolve; `data` and each
  *    `tasks` entry then expand relative to the manifest basedir (erroring
  *    when the job was loaded from a string — test_job.py:505-548, 612-658);
  *    each command's `name`/`task` fields resolve before its env
  *  - leading `~` in resolved strings expands to the user home
  */
object Placeholders {

  private val BareName = "[A-Za-z0-9_-]+".r
  private val BracedInner = "[A-Za-z0-9_-]+(?:\\.[A-Za-z0-9_-]+)*".r

  sealed private trait Part
  private final case class Lit(s: String) extends Part
  private final case class Ref(path: List[String], raw: String) extends Part

  /** Env inheritance (reference inherit_env, job.py:231-252): allowlisted
    * host vars override job env; `*` inherits EVERY host variable (warning
    * when mixed with named entries); allowlisted names missing from the host
    * AND from the job env produce a warning. */
  def inheritEnv(job: Job, host: Map[String, String],
      warn: String => Unit = _ => ()): Map[String, EnvValue] = {
    val allow = job.hostEnv
    val osEnv: Seq[(String, EnvValue)] =
      if (allow.contains("*")) {
        if (allow.length > 1) warn(
          "The `*` value in `job.host_env` was specified alongside other " +
            "values. All host environment variables will be inherited.")
        host.toSeq.sortBy(_._1).map { case (k, v) => k -> EnvValue.Str(v) }
      } else {
        val got = allow.flatMap(k => host.get(k).map(v => k -> EnvValue.Str(v)))
        val missing = allow.toSet -- got.map(_._1).toSet -- job.env.keySet
        if (missing.nonEmpty) warn(
          "The following host environment variables did not receive a " +
            s"value: ${missing.toSeq.sorted.mkString(", ")}")
        got
      }
    VectorMap.from(job.env) ++ osEnv
  }

  /** Resolve the whole job: job-level fields, job env, tasks paths, then each
    * command (name/task fields, then env) in order. */
  def resolve(job: Job, host: Map[String, String] = sys.env,
      warn: String => Unit = _ => ()): Job =
    new Resolver().resolveJob(job.copy(env = inheritEnv(job, host, warn)))

  private final class Resolver {
    // Progressively-resolved snapshot: ${job.*} drill-downs and ${tmp.*}
    // allocations always see the CURRENT state (the reference mutates the
    // pydantic model in place during its traverse).
    private var job: Job = _
    private var named = Map.empty[String, Command]
    private var resolvedCmds = Vector.empty[Command]
    private var previous: Option[Command] = None
    // Live view of the env being resolved (single-pass state)
    private var currentEnv: scala.collection.Map[String, EnvValue] = Map.empty

    def resolveJob(j0: Job): Job = {
      job = j0
      // 1. job scalar fields against the raw inherited env (reference field
      //    order: scalars resolve before the env dict traverses)
      currentEnv = j0.env
      val name1 = interpolate(j0.name).render
      val desc1 = j0.description.map(d => interpolate(d).render)
      val data1 = Yaml.expandPath(interpolate(j0.data).render, j0.basedir)
      job = job.copy(name = name1, description = desc1, data = data1)
      // 2. job env values (single-pass, declaration order)
      val jobEnv1 = resolveEnvMap(j0.env)
      job = job.copy(env = jobEnv1)
      // 3. tasks path entries
      currentEnv = jobEnv1
      val tasks1 = j0.tasks.map(t =>
        Yaml.expandPath(interpolate(t).render, j0.basedir))
      job = job.copy(tasks = tasks1)
      // 4. commands. Each command's env merges the RAW job env (reference
      //    propagate_env runs before resolution), while ${job.env.*}
      //    drill-downs read the RESOLVED job env set above.
      val out = j0.commands.map { cmd =>
        val merged = VectorMap.from(j0.env) ++ cmd.env
        currentEnv = merged
        val cname = cmd.name.map(n => interpolate(n).render)
        val cdesc = cmd.description.map(d => interpolate(d).render)
        val ctask = interpolate(cmd.task).render
        val env1 = resolveEnvMap(merged)
        val rc = cmd.copy(name = cname, task = ctask, env = env1,
          description = cdesc)
        resolvedCmds :+= rc
        cname.foreach(n => named += Keys.snake(n) -> rc)
        // Reference (job.py:458-464): `previous` is only set when the
        // command has a name, and is DELETED after an unnamed command —
        // `${previous.*}` after an unnamed command raises the first-command
        // error rather than resolving to the unnamed command.
        previous = if (cname.isDefined) Some(rc) else None
        rc
      }
      job.copy(commands = out)
    }

    /** Single-pass ordered resolution: each entry resolves against the live
      * state, so earlier entries are seen resolved and later/self entries
      * substitute raw (reference resolve(), job.py:355-393). */
    private def resolveEnvMap(env: Map[String, EnvValue]): Map[String, EnvValue] = {
      val state = scala.collection.mutable.LinkedHashMap.from(env)
      currentEnv = state
      env.keysIterator.foreach { k =>
        state(k) = state(k) match {
          case EnvValue.Str(s) => interpolate(s)
          case other => other
        }
      }
      VectorMap.from(state)
    }

    def interpolate(s: String): EnvValue = parse(s) match {
      case List(r: Ref) => expandTilde(lookup(r)) // whole-match type retention
      case parts =>
        val sb = new StringBuilder
        parts.foreach {
          case Lit(t) => sb.append(t)
          case r: Ref => sb.append(lookup(r).render)
        }
        expandTilde(EnvValue.Str(sb.toString))
    }

    private def expandTilde(v: EnvValue): EnvValue = v match {
      case EnvValue.Str(s) if s == "~" || s.startsWith("~/") =>
        EnvValue.Str(Yaml.expandHome(s))
      case other => other
    }

    /** Reference variable_value (job.py:305-353): reserved heads first
      * (tmp/job/previous), then single names against the current env, then
      * the named-command namespace, then the catalogue error. */
    private def lookup(r: Ref): EnvValue = {
      val head = Keys.snake(r.path.head)
      (head, r.path.tail) match {
        case ("tmp", rest) => rest.map(Keys.snake) match {
          case List("dir") => tmpAlloc(isDir = true)
          case List("file") => tmpAlloc(isDir = false)
          case _ => throw SpecError(s"Invalid use of $${tmp} placeholder " +
            s"in `${r.raw}`. Expected `tmp.dir` or `tmp.file`")
        }
        case ("job", rest) => drill(jobNode, rest, r.raw)
        case ("previous", rest) =>
          val p = previous.getOrElse(throw SpecError(
            s"Cannot use $${previous} placeholder on the first command (`${r.raw}`)"))
          drill(commandNode(p), rest, r.raw)
        case (name, Nil) =>
          Keys.fuzzyGet(currentEnv, Keys.envKey(name))
            .getOrElse(namedRef(name, Nil, r.raw))
        case (name, rest) => namedRef(name, rest, r.raw)
      }
    }

    private def namedRef(name: String, rest: List[String], raw: String): EnvValue =
      named.get(name) match {
        case Some(cmd) =>
          if (rest.isEmpty) throw SpecError(
            s"Incomplete key path, variable must reference a leaf value: `$raw`" +
              " -- did you forget to wrap the variable names in curly braces?")
          drill(commandNode(cmd), rest, raw)
        case None =>
          val exists = job.commands.exists(_.name.exists(n => Keys.snake(n) == name))
          if (exists) throw SpecError(
            s"invalid reference '$raw': command '$name' has not run yet " +
              "(self/forward/circular references are not allowed)")
          else throw SpecError(
            s"Invalid name `$name` in `$raw`. The first name must be one of:\n" +
              " - variable name in the current command's env: " +
              (if (currentEnv.isEmpty) "No env variables defined"
               else currentEnv.keys.toSeq.sorted.mkString(", ")) + "\n" +
              " - name of a previous command: " +
              (if (named.isEmpty) "No previous commands defined"
               else named.keys.toSeq.sorted.mkString(", ")) + "\n" +
              " - `job` to reference the Job (e.g. ${job.data})\n" +
              " - `previous` to reference the previous command (e.g. ${previous.OUTPUT})\n" +
              " - `tmp.dir` to create a temporary directory\n" +
              " - `tmp.file` to create a temporary file")
      }

    /** Scratch allocation under the job's CURRENT data path (reference
      * computes tmpdir at reference time, job.py:312). */
    private def tmpAlloc(isDir: Boolean): EnvValue = {
      val tmpBase = Paths.get(job.data, "tmp")
      Files.createDirectories(tmpBase)
      if (isDir) EnvValue.Str(Files.createTempDirectory(tmpBase, "tmp").toString)
      else EnvValue.Str(Files.createTempFile(tmpBase, "tmp", "").toString)
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
      "description" -> ValNode(c.description.map(EnvValue.Str).getOrElse(EnvValue.NullV)),
      "task" -> ValNode(EnvValue.Str(c.task)),
      "skip" -> ValNode(EnvValue.BoolV(c.skip)),
      "env" -> envNode(c.env)))

    /** The job tree as currently resolved: already-resolved commands appear
      * resolved, the rest raw (the reference mutates in place). */
    private def jobNode: Node = MapNode(Map(
      "name" -> ValNode(EnvValue.Str(job.name)),
      "description" -> ValNode(job.description.map(EnvValue.Str).getOrElse(EnvValue.NullV)),
      "data" -> ValNode(EnvValue.Str(job.data)),
      "basedir" -> ValNode(job.basedir.map(EnvValue.Str).getOrElse(EnvValue.NullV)),
      "env" -> envNode(job.env),
      "commands" -> ListNode(
        (resolvedCmds ++ job.commands.drop(resolvedCmds.length))
          .map(commandNode).toList)))

    private def drill(node: Node, path: List[String], raw: String,
        prev: String = ""): EnvValue =
      path match {
        case Nil => node match {
          case ValNode(v) => v
          case _ => throw SpecError(
            s"Incomplete key path, variable must reference a leaf value: `$raw`" +
              " -- did you forget to wrap the variable names in curly braces?")
        }
        case seg :: rest => node match {
          case MapNode(m) => Keys.fuzzyGet(m, seg) match {
            case Some(child) => drill(child, rest, raw, Keys.snake(seg))
            case None => throw SpecError(
              s"Invalid placeholder `${Keys.snake(seg)}` in $raw. Valid keys " +
                s"are: ${m.keys.toSeq.sorted.map(k => s"`$k`").mkString(", ")}")
          }
          case ListNode(l) =>
            val idx = try seg.toInt catch {
              case _: NumberFormatException =>
                throw SpecError(s"invalid reference '$raw': '$seg' is not a list index")
            }
            if (idx < 0 || idx >= l.length)
              throw SpecError(s"invalid reference '$raw': index $idx out of range")
            drill(l(idx), rest, raw, seg)
          case ValNode(_) =>
            throw SpecError(s"Invalid placeholder in $raw. Could not drill " +
              s"in beyond `$prev` as it does not refer to an object or a list.")
        }
      }
  }

  /** Scanner mirroring the reference's two-pass regex semantics
    * (job.py:355-393): `$$` → literal `$` (escape output can't start a new
    * match); `${a.b.c}` with `[\w-]` segments; bare `$NAME` with `[\w-]+`
    * (dashes greedy — `$job-var` is one name). Anything else — `${}`,
    * `${a b}`, unterminated `${x` — stays literal. */
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
          val inner = if (end < 0) "" else s.substring(i + 2, end)
          if (end >= 0 && BracedInner.matches(inner)) {
            flush()
            out += Ref(inner.split('.').toList, s.substring(i, end + 1))
            i = end + 1
          } else { lit.append(c); i += 1 } // malformed: stays literal
        } else {
          BareName.findPrefixOf(s.substring(i + 1)) match {
            case Some(name) =>
              flush()
              out += Ref(List(name), s"$$$name")
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
