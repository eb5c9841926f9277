package graft.exec

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Nested log contexts (reference xetl/logging.py:9-222): JOB / COMMAND / TASK
  * scopes rendered with box-drawing prefixes, three styles, optional timestamps.
  * The reference formats python logging records; here the runner's log callback is
  * wrapped instead — same visual contract, engine-native plumbing.
  *
  * Styles: `box` (double-rule job frame, light-rule command frame), `plain`
  * (indentation only), `compact` (single-line markers). */
final class ContextLogger(sink: String => Unit, style: String = "box",
    timestamps: Boolean = true) {

  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private var inJob = false
  private var inCommand = false

  private def stamp: String =
    if (timestamps) LocalDateTime.now().format(ts) + " " else ""

  private def prefix: String = style match {
    case "box" =>
      (if (inJob) "║ " else "") + (if (inCommand) "│ " else "")
    case "plain" =>
      (if (inJob) "  " else "") + (if (inCommand) "  " else "")
    case _ => ""
  }

  def jobStart(name: String): Unit = {
    style match {
      case "box" => sink(s"$stamp╔══ JOB $name ══")
      case "plain" => sink(s"${stamp}JOB $name")
      case _ => sink(s"$stamp[job] $name")
    }
    inJob = true
  }

  def jobEnd(name: String): Unit = {
    inJob = false
    style match {
      case "box" => sink(s"$stamp╚══ JOB $name complete ══")
      case "plain" => sink(s"${stamp}JOB $name complete")
      case _ => sink(s"$stamp[job] $name complete")
    }
  }

  def commandStart(label: String, i: Int, n: Int): Unit = {
    style match {
      case "box" => sink(s"$stamp${if (inJob) "║ " else ""}┌─ COMMAND [$i/$n] $label")
      case "plain" => sink(s"$stamp${if (inJob) "  " else ""}COMMAND [$i/$n] $label")
      case _ => sink(s"$stamp[cmd $i/$n] $label")
    }
    inCommand = true
  }

  def commandEnd(): Unit = {
    if (style == "box" && inCommand) sink(s"$stamp${if (inJob) "║ " else ""}└─")
    inCommand = false
  }

  /** Ordinary line inside the current context (task stdout, warnings, progress). */
  def line(msg: String): Unit = sink(s"$stamp$prefix$msg")

  /** The runner's `String => Unit` surface. */
  def asSink: String => Unit = line
}
