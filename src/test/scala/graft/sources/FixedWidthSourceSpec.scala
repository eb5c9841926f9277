package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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

  test("write path: append sink renders aligned records that read back exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fw-w").toString
    val df = Seq((7, "Ada", 1.25), (42, "Grace", 99.5), (5, "Edsger", 0.125))
      .toDF("k", "name", "score")
    df.repartition(2).write.format("graft.sources.FixedWidthSource")
      .option("widths", "4,8,8").mode("append").save(dir)
    val back = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, score DOUBLE")
      .option("widths", "4,8,8")
      .load(dir)
      .orderBy($"k").as[(Int, String, Double)].collect().toSeq
    assert(back == Seq((5, "Edsger", 0.125), (7, "Ada", 1.25), (42, "Grace", 99.5)))
    // alignment contract: numerics right-aligned, strings left-aligned
    val line = scala.io.Source.fromFile(
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
        .sortBy(_.getName).head).getLines().toSeq.head
    assert(line.length == 20 && line.takeRight(1) != " ", line)
  }

  test("reads honor the commit manifest: orphan task files are excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fw-m").toString
    Seq((1, "A"), (2, "B")).toDF("k", "name")
      .coalesce(1).write.format("graft.sources.FixedWidthSource")
      .option("widths", "4,4").mode("append").save(dir)
    // simulate a crashed task attempt's leftover: valid-looking but uncommitted
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-99999-666.txt"), "   9Junk".getBytes)
    val got = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING").option("widths", "4,4")
      .load(dir).orderBy($"k").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "A"), (2, "B")), got)
  }

  test("filter pushdown reaches the reader; residual re-check keeps semantics") {
    import spark.implicits._
    val df = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .filter($"k" >= 2 && $"name".startsWith("G") && $"qty".isNull)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val pushed = scan.scan.asInstanceOf[FixedWidthScan].pushedFilters.map(_.toString)
    assert(pushed.exists(_.contains("GreaterThanOrEqual")) &&
      pushed.exists(_.contains("StringStartsWith")) &&
      pushed.exists(_.contains("IsNull")), pushed.toSeq)
    assert(scan.toString.contains("PushedFilters: ["), scan.toString)
    val got = df.as[(Integer, String, Option[Double])].collect().toSeq
    assert(got == Seq((10: Integer, "Gizmo", None)), got)
    // NULL comparison semantics: k > 0 must NOT return the short-line row's
    // missing qty as a match under qty < 100 (SQL: NULL < 100 is not true)
    val nullCmp = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .filter($"qty" < 100.0)
    assert(nullCmp.count() == 3)
  }

  test("limit pushdown stops the reader; global limit semantics are kept") {
    val df = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .limit(2)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.toString.contains("PushedLimit: 2"), scan.toString)
    assert(df.count() == 2)
    // limit composes with pushed filters: the reader counts SURVIVING records
    import spark.implicits._
    val filtered = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .filter($"k" >= 2).limit(1)
    assert(filtered.count() == 1)
  }

  test("two appends from distinct jobs never collide (queryId in file names)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fw-2j").toString
    // same partitioning → same (partitionId, taskId-ish) shape across both jobs;
    // only the per-job queryId token keeps the names distinct
    Seq((1, "A")).toDF("k", "name").coalesce(1)
      .write.format("graft.sources.FixedWidthSource")
      .option("widths", "4,4").mode("append").save(dir)
    Seq((2, "B")).toDF("k", "name").coalesce(1)
      .write.format("graft.sources.FixedWidthSource")
      .option("widths", "4,4").mode("append").save(dir)
    val parts = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSeq
    assert(parts.size == 2 && parts.distinct.size == 2, parts)
    val got = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING").option("widths", "4,4")
      .load(dir).orderBy($"k").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "A"), (2, "B")), got)
  }

  test("reported statistics drive auto-broadcast of a small fixed-width dim") {
    import spark.implicits._
    val dim = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
    // stats are real (tiny file => tiny sizeInBytes), so the planner should pick
    // a broadcast join without any hint
    val fact = spark.range(1000).select(($"id" % 5).cast("int").as("k"))
    val joined = fact.join(dim, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(joined.count() > 0)
    // and the scan reports both estimates
    val scan = joined.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.asInstanceOf[FixedWidthScan]
    }.head
    val st = scan.estimateStatistics()
    assert(st.sizeInBytes().getAsLong > 0 && st.numRows().getAsLong > 0)
  }

  test("runtime filter (SupportsRuntimeFiltering) prunes rows at the reader") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k INT, name STRING, qty DOUBLE")
    val dir = writeFixture()
    val scan = new FixedWidthScan(schema, Array(4, 8, 6), dir, schema,
      Array.empty)
    // a plain row scan advertises its columns for runtime filtering
    assert(scan.filterAttributes().map(_.toString).toSet ==
      Set("k", "name", "qty"))
    def readAll(s: FixedWidthScan): Seq[org.apache.spark.sql.catalyst.InternalRow] = {
      val factory = s.createReaderFactory()
      s.planInputPartitions().toSeq.flatMap { p =>
        val r = factory.createReader(p)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.catalyst.InternalRow]
        while (r.next()) buf += r.get().copy()
        r.close(); buf
      }
    }
    assert(readAll(scan).size == 4)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(1, 1234))))
    val pruned = readAll(scan)
    assert(pruned.size == 2, s"runtime In-filter should prune to 2 rows")
    // an aggregate-pushdown or pushed-limit scan must refuse runtime filters
    val aggScan = new FixedWidthScan(schema, Array(4, 8, 6), dir, schema,
      Array.empty, -1,
      Some(FixedWidthPushedAgg(Seq.empty, Seq(FixedWidthAgg("count_star", -1,
        "n", org.apache.spark.sql.types.LongType)))), false)
    assert(aggScan.filterAttributes().isEmpty)
    val limScan = new FixedWidthScan(schema, Array(4, 8, 6), dir, schema,
      Array.empty, 2)
    assert(limScan.filterAttributes().isEmpty)
  }

  test("DPP attaches a runtime filter to the scan in a broadcast join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fw-rtf").toString
    graft.Tables(spark, "/root/testdata/sf0.01", "supplier")
      .select(format_string("%8d%-24s%4d",
        $"s_suppkey", $"s_name", $"s_nationkey").as("line"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val feed = spark.read.format("graft.sources.FixedWidthSource")
      .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
      .option("widths", "8,24,4").load(dir)
    val dim = graft.Tables(spark, "/root/testdata/sf0.01", "nation")
      .filter($"n_name".isin("NATION_3", "NATION_7"))
      .select($"n_nationkey", $"n_name")
    val j = feed.join(broadcast(dim), $"s_nationkey" === $"n_nationkey")
    val expected = graft.Tables(spark, "/root/testdata/sf0.01", "supplier")
      .filter($"s_nationkey".isin(3, 7)).count()
    assert(j.count() == expected)
    // the scan hides inside the adaptive plan; its simpleString carries the
    // attached filter (same surface the built-in sources print)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"expected a dynamicpruning runtime filter on the scan:\n$plan")
  }

  test("columnar read path returns identical rows and plans ColumnarToRow") {
    import spark.implicits._
    val dir = writeFixture()
    def read(columnar: Boolean) = spark.read
      .format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .option("columnar", columnar.toString)
      .load(dir)
    val row = read(columnar = false).orderBy($"k").collect().toSeq
    val colDf = read(columnar = true)
    val col = colDf.orderBy($"k").collect().toSeq
    assert(col == row)
    assert(colDf.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "expected a columnar scan with a ColumnarToRow boundary")
    // pushdown semantics identical on the columnar path
    val filtered = read(columnar = true).filter($"k" > 1 && $"qty".isNotNull)
    assert(filtered.count() == 2)
    assert(read(columnar = true).limit(2).count() == 2)
  }

  test("top-N pushdown reaches the scan and keeps global order semantics") {
    import spark.implicits._
    val dir = writeFixture()
    def feed = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(dir)
    // qty has a NULL row: default ORDER BY qty puts nulls first (asc)
    val asc = feed.orderBy($"qty").limit(2)
    assert(asc.queryExecution.executedPlan.toString.contains("PushedTopN"),
      asc.queryExecution.executedPlan.toString)
    assert(asc.select($"k").collect().map(_.getInt(0)).toSeq == Seq(10, 2))
    val desc = feed.orderBy($"qty".desc, $"k").limit(2)
      .select($"k").collect().map(_.getInt(0)).toSeq
    assert(desc == Seq(1234, 1))
    // composes with filter pushdown; Spark's final sort still owns the order
    val filtered = feed.filter($"k" < 100).orderBy($"name").limit(2)
      .select($"name").collect().map(_.getString(0)).toSeq
    assert(filtered == Seq("Gadget", "Gizmo"))
    // a plain limit still prints as PushedLimit, not PushedTopN
    val lim = feed.limit(3)
    assert(lim.queryExecution.executedPlan.toString.contains("PushedLimit"))
  }

  test("custom scan metrics report lines read vs rows surviving pushdown") {
    import spark.implicits._
    val df = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .filter($"k" > 1)
    // collect() executes THIS queryExecution's plan (count() would build and
    // run a separate one whose metrics we couldn't see)
    assert(df.collect().length == 3)
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = exec.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    val m = scan.metrics
    assert(m("fw_lines_read").value == 4, m)
    assert(m("fw_rows_emitted").value == 3, m)
  }

  test("write path: over-wide value fails the task instead of truncating") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fw-e").toString
    val df = spark.range(1).selectExpr("cast(id as int) k",
      "'NameTooLongForSlot' name")
    val e = intercept[Exception] {
      df.write.format("graft.sources.FixedWidthSource")
        .option("widths", "4,8").mode("append").save(dir)
    }
    assert(e.getMessage.contains("wider than column") ||
      Option(e.getCause).exists(_.getMessage.contains("wider than column")))
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) = {
    val plan = df.queryExecution.executedPlan match {
      // an agg plan has an exchange, so AQE wraps it; lint the initial plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    plan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
  }

  test("complete count(*) pushdown is metadata-only: no data bytes are read") {
    import spark.implicits._
    val dir = writeFixture()
    val feed = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6").option("ascii", "true")
      .load(dir)
    val cnt = feed.agg(count(lit(1)).as("n"))
    val scan = scanOf(cnt)
    assert(scan.toString.contains("PushedAggregates (complete): [count_star]"),
      scan.toString)
    assert(cnt.as[Long].head() == 4L)
    // PROOF no file is opened: replace a data file with same-length garbage
    // containing no newlines. A streaming count would now see different lines;
    // the metadata count (file length arithmetic) is unchanged.
    val f = java.nio.file.Paths.get(dir, "part-0.txt")
    val len = java.nio.file.Files.size(f)
    java.nio.file.Files.write(f, Array.fill(len.toInt)('x'.toByte))
    val cnt2 = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6").option("ascii", "true")
      .load(dir).agg(count(lit(1)).as("n"))
    assert(cnt2.as[Long].head() == 4L)
  }

  test("partial min/max/count pushdown: one partial row per file, merged by Spark") {
    import spark.implicits._
    val feed = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
    val agg = feed.agg(min($"k").as("mink"), max($"k").as("maxk"),
      count($"qty").as("nq"), max($"name").as("maxn"), count(lit(1)).as("n"))
    val scan = scanOf(agg)
    assert(scan.toString.contains("PushedAggregates: [min_k, max_k, count_qty, " +
      "max_name, count_star]"), scan.toString)
    // scan plans one partial-aggregate partition per file (2 files), each of
    // which emits a single row — not one row per record (4)
    val parts = scan.scan.asInstanceOf[FixedWidthScan].toBatch.planInputPartitions()
    assert(parts.length == 2 && parts.forall(_.isInstanceOf[FixedWidthAggPartition]),
      parts.toSeq)
    val r = agg.head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 1234, r)
    assert(r.getLong(2) == 3L, r)   // short line: qty null, not counted
    assert(r.getString(3) == "Widget", r)
    assert(r.getLong(4) == 4L, r)
  }

  test("aggregate pushdown is refused under filters; semantics still correct") {
    import spark.implicits._
    val feed = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .filter($"k" >= 2)
    val agg = feed.agg(count(lit(1)).as("n"), min($"k").as("mink"))
    assert(!scanOf(agg).toString.contains("PushedAggregates"),
      scanOf(agg).toString)
    val r = agg.head()
    assert(r.getLong(0) == 3L && r.getInt(1) == 2, r)
  }

  test("GROUP BY pushdown: per-group partials per file, merged by Spark") {
    import spark.implicits._
    val feed = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      // group key: first letter bucket via k % 2 is an expression (not
      // pushable) — group by the raw source column instead
      .groupBy($"name").agg(count(lit(1)).as("n"), max($"qty").as("mq"))
    val scan = scanOf(feed.toDF())
    assert(scan.toString.contains("PushedAggregates: [count_star, max_qty]") &&
      scan.toString.contains("PushedGroupBy: [name]"), scan.toString)
    val got = feed.orderBy($"name").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(got == Seq(("Exactly8", 1L, 99.25), ("Gadget", 1L, 0.5),
      ("Gizmo", 1L, null), ("Widget", 1L, 12.5)), got)
    // grouping by an EXPRESSION is refused -> falls back to a plain scan
    val expr = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING, qty DOUBLE")
      .option("widths", "4,8,6")
      .load(writeFixture())
      .groupBy(($"k" % 2).as("b")).agg(count(lit(1)).as("n"))
    assert(!scanOf(expr.toDF()).toString.contains("PushedAggregates"),
      scanOf(expr.toDF()).toString)
    assert(expr.orderBy($"b").as[(Int, Long)].collect().toSeq ==
      Seq((0, 3L), (1, 1L)))
  }

  test("aggregate pushdown over an empty feed yields count 0, null min") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fw-empty").toString
    val feed = spark.read.format("graft.sources.FixedWidthSource")
      .schema("k INT, name STRING")
      .option("widths", "4,8")
      .load(dir)
    val r = feed.agg(count(lit(1)).as("n"), min($"k").as("mink")).head()
    assert(r.getLong(0) == 0L && r.isNullAt(1), r)
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
