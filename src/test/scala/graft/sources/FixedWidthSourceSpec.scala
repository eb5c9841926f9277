package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 fixed-width source: parsing, null short-lines, column pruning pushdown. */
class FixedWidthSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fw")
    //               k(4) + name(8) + qty(6)
    val lines = Seq(
      "   1Widget    12.5",
      "   2Gadget      .5",
      "  10Gizmo", // short line: missing qty → null
      "1234Exactly8 99.25")
    java.nio.file.Files.write(dir.resolve("part-0.txt"),
      lines.take(2).mkString("\n").getBytes)
    java.nio.file.Files.write(dir.resolve("part-1.txt"),
      lines.drop(2).mkString("\n").getBytes)
    java.nio.file.Files.write(dir.resolve("_meta.txt"), "ignored".getBytes)
    dir.toString
  }

  test("parses fixed-width records across files, trims, nulls short fields") {
    import spark.implicits._
    val got = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .orderBy($"k")
      .as[(Integer, String, Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (1: Integer, "Widget", Some(12.5)),
      (2: Integer, "Gadget", Some(0.5)),
      (10: Integer, "Gizmo", None),
      (1234: Integer, "Exactly8", Some(99.25))))
  }

  test("column pruning reaches the scan (ReadSchema shows only requested fields)") {
    val df = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .select("name")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.output.map(_.name) == Seq("name"), scan.output)
    assert(df.count() == 4)
  }

  test("missing widths or schema fail fast with a clear message") {
    val dir = writeFixture()
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.FixedWidthSource")
        .schema("k INT").load(dir).collect()
    }
    assert(e1.getMessage.contains("widths"))
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.FixedWidthSource")
        .option("widths", "4").load(dir).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("schema"))
  }
}
