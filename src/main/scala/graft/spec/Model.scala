package graft.spec

/** Typed env-variable values — the reference's only data type system
  * (`EnvVariableType = str | int | float | bool | None`,
  * /root/reference/xetl/models/__init__.py:3). Values keep their YAML-native type
  * through placeholder resolution ("whole-match type retention") and are stringified
  * only when crossing into an executor (python-style `True`/`False`, reference
  * task.py:307 / test_end_to_end.py:195). */
sealed trait EnvValue {
  /** Stringification used when a value crosses into a subprocess env or is embedded
    * inside a larger interpolated string. */
  def render: String = this match {
    case EnvValue.Str(s) => s
    case EnvValue.IntV(v) => v.toString
    case EnvValue.FloatV(v) => if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15)
      { val l = v.toLong; s"$l.0" } else v.toString
    case EnvValue.BoolV(b) => if (b) "True" else "False"
    case EnvValue.NullV => "null"
  }
}
object EnvValue {
  final case class Str(s: String) extends EnvValue
  final case class IntV(v: Long) extends EnvValue
  final case class FloatV(v: Double) extends EnvValue
  final case class BoolV(b: Boolean) extends EnvValue
  case object NullV extends EnvValue

  def apply(any: Any): EnvValue = any match {
    case null => NullV
    case v: EnvValue => v
    case s: String => Str(s)
    case b: Boolean => BoolV(b)
    case b: java.lang.Boolean => BoolV(b)
    case i: Int => IntV(i.toLong)
    case i: Long => IntV(i)
    case i: java.lang.Integer => IntV(i.toLong)
    case i: java.lang.Long => IntV(i)
    case i: java.math.BigInteger => IntV(i.longValueExact())
    case d: Double => FloatV(d)
    case d: Float => FloatV(d.toDouble)
    case d: java.lang.Double => FloatV(d)
    case d: java.math.BigDecimal => FloatV(d.doubleValue())
    case other => Str(other.toString)
  }
}

/** Declared input types, with the reference's accepted spellings
  * (task_input_details.py:29-41). Runtime checking is strict: `int` is not accepted
  * where `float` is declared and vice versa (reference test_task.py:701-729). */
sealed trait InputType { def matches(v: EnvValue): Boolean }
object InputType {
  case object TString extends InputType {
    def matches(v: EnvValue) = v.isInstanceOf[EnvValue.Str]
  }
  case object TInt extends InputType {
    def matches(v: EnvValue) = v.isInstanceOf[EnvValue.IntV]
  }
  case object TFloat extends InputType {
    def matches(v: EnvValue) = v.isInstanceOf[EnvValue.FloatV]
  }
  case object TBool extends InputType {
    def matches(v: EnvValue) = v.isInstanceOf[EnvValue.BoolV]
  }
  def parse(s: String): Either[String, InputType] = s.trim.toLowerCase match {
    case "str" | "string" => Right(TString)
    case "int" | "integer" => Right(TInt)
    case "float" | "decimal" => Right(TFloat)
    case "bool" | "boolean" => Right(TBool)
    case other => Left(s"unknown input type: '$other'")
  }
}

/** Per-input schema (reference task_input_details.py:8-42): `required` defaults to
  * true; `optional` is its mutually-exclusive alias; a `default` implies optional. */
final case class TaskInput(
    description: Option[String] = None,
    required: Boolean = true,
    default: Option[EnvValue] = None,
    inputType: Option[InputType] = None)

/** In-manifest test case (reference task_test_case.py:8-26): run with `env`, then the
  * `verify` command; exit 0 = pass. */
final case class TaskTestCase(name: String, env: Map[String, EnvValue],
    verify: List[String])

/** How a task executes. The reference always runs a subprocess (task.py:291-347); the
  * engine adds Spark-native operators as first-class task bodies — `run` forms map to
  * exec-parity subprocess stages, `spark_op` binds a registered DataFrame operator. */
sealed trait TaskBody
object TaskBody {
  /** argv-style subprocess (reference run: string → shlex.split, run: [list], or
    * {interpreter, script} — utils/run.py:6-23). */
  final case class Exec(argv: List[String]) extends TaskBody
  final case class Script(interpreter: List[String], script: String) extends TaskBody
  /** A registered Spark operator (engine extension; the idiomatic task body). */
  final case class SparkOp(op: String) extends TaskBody
}

/** A reusable unit of execution (reference task.py:38-193). */
final case class Task(
    name: String,
    basedir: Option[String] = None,
    body: TaskBody,
    env: Map[String, TaskInput] = Map.empty,
    tests: Map[String, TaskTestCase] = Map.empty,
    description: Option[String] = None)

/** One pipeline node (reference command.py:15-68): `name` is optional but, when
  * present, restricted to `[a-z0-9-_]`; `task` lookup is case-insensitive. */
final case class Command(
    name: Option[String],
    task: String,
    env: Map[String, EnvValue] = Map.empty,
    skip: Boolean = false,
    description: Option[String] = None)

/** The job manifest (reference job.py:30-109). */
final case class Job(
    name: String,
    description: Option[String] = None,
    basedir: Option[String] = None,
    data: String,
    hostEnv: List[String] = Nil,
    env: Map[String, EnvValue] = Map.empty,
    tasks: List[String] = Nil,
    commands: List[Command] = Nil)

final case class SpecError(message: String) extends RuntimeException(message)
