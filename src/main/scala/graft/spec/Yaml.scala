package graft.spec

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** YAML → model parsing. Construction is analysis (reference: pydantic validation at
  * model build, job.py:111-137): every structural error is raised here, before any
  * execution. */
object Yaml {

  private def load(text: String): Any =
    new org.yaml.snakeyaml.Yaml().load[Any](text)

  private def asMap(any: Any, what: String): Map[String, Any] = any match {
    case m: java.util.Map[_, _] =>
      // snakeyaml hands back a LinkedHashMap: keep declaration order (the
      // resolver is single-pass in declaration order, like the reference's
      // ordered dicts)
      scala.collection.immutable.VectorMap.from(
        m.asScala.iterator.map { case (k, v) => String.valueOf(k) -> (v: Any) })
    case other => throw SpecError(s"$what must be a mapping, got: $other")
  }

  private def asList(any: Any): List[Any] = any match {
    case l: java.util.List[_] => l.asScala.toList.map(x => x: Any)
    case other => throw SpecError(s"expected a list, got: $other")
  }

  private def envMap(any: Any): Map[String, EnvValue] =
    Keys.conformEnv(asMap(any, "env")).map { case (k, v) => k -> EnvValue(v) }

  // ---- Job ----------------------------------------------------------------

  def jobFromFile(path: String): Job = {
    val p = Paths.get(path)
    // Reference parse_yaml_file (utils/io.py:35-40): the read error chains as
    // "Failed to load file; <cause>" and propagates unwrapped (load_file is
    // called OUTSIDE the wrapping try); parse-stage errors wrap with the path
    // ("Error while parsing YAML at path: <path>; <cause>" — ChainedException
    // joins cause texts with "; ", io.py:4-6). Model-build errors (missing
    // name, bad command…) are NOT wrapped — the reference raises pydantic
    // errors from cls(**job) after parse_yaml_file returned (job.py:112-115).
    val text =
      try Files.readString(p)
      catch { case e: java.io.IOException =>
        throw SpecError(s"Failed to load file; $e") }
    val root =
      try parseRoot(text)
      catch { case e: SpecError =>
        throw SpecError(s"Error while parsing YAML at path: $path; ${e.getMessage}") }
    jobFromRoot(root, basedir = Some(p.toAbsolutePath.getParent.toString))
  }

  /** Parse stage only (reference parse_yaml, utils/io.py:25-32): YAML text to
    * a conformed root mapping. A scanner error chains as "Failed to parse
    * YAML; <cause>" (cause text is SnakeYAML's, where the reference carries
    * PyYAML's — library-specific by construction); a well-formed document
    * whose root is not a mapping is the reference's canonical
    * "Failed to parse YAML, expected a dictionary". */
  private def parseRoot(text: String): Map[String, Any] = {
    val any =
      try load(text)
      catch { case e: org.yaml.snakeyaml.error.YAMLException =>
        throw SpecError(s"Failed to parse YAML; ${e.getMessage}") }
    any match {
      case m: java.util.Map[_, _] => Keys.conformRoot(asMap(m, "job manifest"))
      case _ => throw SpecError("Failed to parse YAML, expected a dictionary")
    }
  }

  def jobFromString(text: String, basedir: Option[String] = None): Job =
    jobFromRoot(parseRoot(text), basedir)

  private def jobFromRoot(root: Map[String, Any], basedir: Option[String]): Job = {
    val name = root.getOrElse("name",
      throw SpecError("job manifest requires a 'name'")).toString
    val dataRaw = root.getOrElse("data",
      throw SpecError("job manifest requires a 'data' dir")).toString
    val env = root.get("env").map(envMap).getOrElse(Map.empty)
    // host_env: normalized to env-key style; default = keys of job env
    // (reference load_host_env, job.py:121-130)
    val hostEnv = root.get("host_env") match {
      case None => env.keys.toList.sorted
      case Some(null) => Nil // explicit `host-env: null` disables inheritance
      case Some(s: String) => List(if (s == "*") s else Keys.envKey(s))
      case Some(l) => asList(l).map(_.toString)
        .map(x => if (x == "*") x else Keys.envKey(x))
    }
    val tasks = root.get("tasks") match {
      case None => Nil
      case Some(s: String) => List(s)
      case Some(l) => asList(l).map(_.toString)
    }
    val commands = root.get("commands").map(asList).getOrElse(Nil).map(parseCommand)
    // Paths containing placeholders are expanded AFTER resolution
    // (Placeholders.resolve calls expandPath on the resolved value —
    // reference job.py:437-449 expands ("job","data")/("job","tasks") inside
    // the resolution traverse, so `data: $DATA_PATH/path` is legal even when
    // the manifest is loaded from a string).
    val resolvePath = (p: String) =>
      if (p.contains("$")) p else expandPath(expandHome(p), basedir)
    Job(
      name = name,
      description = root.get("description").map(_.toString),
      basedir = basedir,
      data = resolvePath(dataRaw),
      hostEnv = hostEnv,
      env = env,
      tasks = tasks.map(resolvePath),
      commands = commands)
  }

  /** Reference expand_path (job.py:220-228): absolute (or already-expanded
    * home) paths pass through; relative paths expand against the manifest
    * basedir and error when the job was loaded from a string. */
  private[spec] def expandPath(p: String, basedir: Option[String]): String =
    if (Paths.get(p).isAbsolute || p.startsWith("~")) p
    else basedir match {
      case Some(b) => Paths.get(b, p).normalize().toString
      case None => throw SpecError(
        "Relative paths cannot be used when the job manifest is loaded from " +
          s"a string: $p")
    }

  private val commandNameOk = "^[a-z0-9-_]+$".r

  private def parseCommand(any: Any): Command = {
    val m = Keys.conformRoot(asMap(any, "command"))
    val name = m.get("name").map(_.toString)
    name.foreach { n =>
      if (commandNameOk.findFirstIn(n).isEmpty)
        throw SpecError(s"invalid command name '$n': must match [a-z0-9-_]+")
    }
    Command(
      name = name,
      task = m.getOrElse("task", throw SpecError("command requires a 'task'")).toString,
      env = m.get("env").map(envMap).getOrElse(Map.empty),
      skip = m.get("skip").exists {
        case b: java.lang.Boolean => b
        case s => s.toString.toBoolean
      },
      description = m.get("description").map(_.toString))
  }

  // ---- Task ---------------------------------------------------------------

  def taskFromFile(path: String): Task = {
    // Reference Task.from_file (task.py:196-203): load_file IO failures raise
    // ManifestLoadError("Failed to load file; <cause>") directly; EVERYTHING
    // from from_yaml (parse + model build) wraps as "Could not load YAML file
    // at path: <path>; <cause>". Both are expected manifest errors, so
    // discover_tasks skips them at WARNING — only non-manifest exceptions
    // reach its ERROR branch (round-15 fresh-eyes sweep #4b: previously a
    // missing manifest.yml threw a raw NoSuchFileException here, landing the
    // yaml-detected/yml-loaded quirk in the wrong branch).
    val p = Paths.get(path)
    val text =
      try Files.readString(p)
      catch { case e: java.io.IOException =>
        throw SpecError(s"Failed to load file; $e") }
    try taskFromString(text, basedir = Some(p.toAbsolutePath.getParent.toString))
    catch { case scala.util.control.NonFatal(e) =>
      // `except Exception` in the reference — ANY from_yaml failure wraps
      val cause = e match {
        case s: SpecError => s.getMessage
        case other => String.valueOf(other.getMessage)
      }
      throw SpecError(s"Could not load YAML file at path: $path; $cause") }
  }

  def taskFromString(text: String, basedir: Option[String] = None): Task = {
    val root = Keys.conformRoot(asMap(load(text), "task manifest"))
    val name = root.getOrElse("name",
      throw SpecError("task manifest requires a 'name'")).toString
    val body = parseBody(root)
    val env: Map[String, TaskInput] = root.get("env") match {
      case None => Map.empty
      case Some(l: java.util.List[_]) =>
        // env as a plain list of names = all-required untyped inputs; names
        // must be strings (reference tests/models/test_task.py:340-356)
        val items = l.asScala.toList
        val bad = items.filterNot(_.isInstanceOf[String])
        if (bad.nonEmpty) throw SpecError(
          "Task env names must be strings, the following are invalid: " +
            bad.map(String.valueOf(_)).mkString(", "))
        // VectorMap: declaration order must survive (>4 entries would turn a
        // plain .toMap into an unordered HashMap, breaking the argparse
        // missing-required aggregation order and fuzzyGet last-wins), matching
        // the conformEnv path (round-15, ADVICE)
        scala.collection.immutable.VectorMap.from(
          items.iterator.map(x => Keys.envKey(x.toString) -> TaskInput()))
      case Some(m) =>
        val raw = Keys.conformEnv(asMap(m, "task env"))
        // required+default is contradictory; the reference aggregates ALL
        // offending names into one error (test_task.py:248-268)
        val offending = scala.collection.mutable.ListBuffer[String]()
        val parsed = raw.flatMap { case (k, v) =>
          try Some(k -> parseInput(k, v))
          catch { case ReqDefault(kk) => offending += kk; None }
        }
        if (offending.nonEmpty) throw SpecError(
          "The following task env variables are required but specify a " +
            s"default value which is invalid: ${offending.mkString(", ")}")
        parsed
    }
    val tests: Map[String, TaskTestCase] = root.get("tests") match {
      case None => Map.empty
      case Some(m) => asMap(m, "tests").map { case (tn, tv) =>
        val tm = Keys.conformRoot(asMap(tv, s"test $tn"))
        tn -> TaskTestCase(tn,
          tm.get("env").map(envMap).getOrElse(Map.empty),
          parseRunForm(
            tm.getOrElse("verify", throw SpecError(s"test '$tn' requires 'verify'")),
            "Task test verify command"))
      }
    }
    Task(name = name, basedir = basedir, body = body, env = env, tests = tests,
      description = root.get("description").map(_.toString))
  }

  /** Run-command forms (reference utils/run.py:6-23): string → tokenized; list →
    * stringified argv; {interpreter, script} → interpreter argv + script. The engine
    * adds `spark-op: <name>` as the Spark-native body. */
  private def parseBody(root: Map[String, Any]): TaskBody = {
    root.get("spark_op").map(op => TaskBody.SparkOp(op.toString)).getOrElse {
      root.get("run") match {
        case None => throw SpecError("task manifest requires 'run' or 'spark-op'")
        case Some(s: String) => TaskBody.Exec(tokenize(s))
        case Some(l: java.util.List[_]) =>
          TaskBody.Exec(l.asScala.map(String.valueOf(_)).toList)
        case Some(m: java.util.Map[_, _]) =>
          val mm = Keys.conformRoot(asMap(m, "run"))
          val script = mm.getOrElse("script",
            throw SpecError("run object requires 'script'")).toString
          val interp = mm.get("interpreter") match {
            case None => List("/bin/sh", "-c")
            case Some(s: String) => tokenize(s)
            case Some(l) => asList(l).map(_.toString)
          }
          TaskBody.Script(interp, script)
        case Some(other) => throw SpecError(
          "Task run command must be a string, a list of strings, or a " +
            s"script object, received: $other")
      }
    }
  }

  /** Shared run/verify command-form parser (reference utils/run.py:6-23 via
    * parse_run_command): string → shlex-tokenized argv; list → stringified
    * argv; {interpreter, script} → interpreter argv + script text; anything
    * else is the reference's canonical error. */
  private def parseRunForm(any: Any, what: String): List[String] = any match {
    case s: String => tokenize(s)
    case l: java.util.List[_] => l.asScala.map(String.valueOf(_)).toList
    case m: java.util.Map[_, _] =>
      val mm = Keys.conformRoot(asMap(m, what))
      mm.get("script") match {
        case Some(script) =>
          val interp = mm.get("interpreter") match {
            case None => List("/bin/sh", "-c")
            case Some(s: String) => tokenize(s)
            case Some(l) => asList(l).map(_.toString)
          }
          interp :+ script.toString
        case None => throw SpecError(
          s"$what must be a string, a list of strings, or a script object, " +
            s"received: $m")
      }
    case other => throw SpecError(
      s"$what must be a string, a list of strings, or a script object, " +
        s"received: $other")
  }

  /** shlex-like tokenization (quotes + escapes). */
  def tokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var i = 0; var inS = false; var inD = false; var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inS) { if (c == '\'') inS = false else cur.append(c) }
      else if (inD) {
        if (c == '"') inD = false
        else if (c == '\\' && i + 1 < s.length && "\"\\".contains(s.charAt(i + 1))) {
          cur.append(s.charAt(i + 1)); i += 1
        } else cur.append(c)
      }
      else c match {
        case '\'' => inS = true; started = true
        case '"' => inD = true; started = true
        case '\\' if i + 1 < s.length => cur.append(s.charAt(i + 1)); started = true; i += 1
        case w if w.isWhitespace =>
          if (started || cur.nonEmpty) { out += cur.toString; cur.clear(); started = false }
        case other => cur.append(other); started = true
      }
      i += 1
    }
    if (started || cur.nonEmpty) out += cur.toString
    out.toList
  }

  /** Internal marker: explicit required (or optional: false) combined with a
    * default — aggregated into one Task-level error by taskFromString. */
  private final case class ReqDefault(key: String)
    extends RuntimeException(key)

  private def parseInput(key: String, any: Any): TaskInput = any match {
    case s: String if s.nonEmpty && !s.contains(":") =>
      TaskInput(description = Some(s)) // bare description string
    case m: java.util.Map[_, _] =>
      val mm = Keys.conformRoot(asMap(m, s"input $key"))
      val hasRequired = mm.contains("required")
      val hasOptional = mm.contains("optional")
      if (hasRequired && hasOptional)
        throw SpecError(s"input '$key': 'required' and 'optional' are mutually exclusive")
      val default = mm.get("default").map(EnvValue(_))
      val required =
        if (hasOptional) !mm("optional").toString.toBoolean
        else if (hasRequired) mm("required").toString.toBoolean
        else default.isEmpty // a default implies optional
      if ((hasRequired || hasOptional) && required && default.nonEmpty)
        throw ReqDefault(key)
      TaskInput(
        description = mm.get("description").map(_.toString),
        required = required && default.isEmpty,
        default = default,
        inputType = mm.get("type").map(t => InputType.parse(t.toString) match {
          case Right(tt) => tt
          case Left(err) => throw SpecError(s"input '$key': $err")
        }))
    case s: String => TaskInput(description = Some(s))
    case null => TaskInput()
    case other => throw SpecError(s"input '$key': unsupported schema $other")
  }

  private[spec] def expandHome(p: String): String =
    if (p == "~") sys.props("user.home")
    else if (p.startsWith("~/")) sys.props("user.home") + p.substring(1)
    else p
}
