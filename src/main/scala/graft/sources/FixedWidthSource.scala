package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for FIXED-WIDTH text records (mainframe extracts,
  * legacy feeds) — the engine's demonstration of Spark's connector extension
  * surface: `TableProvider` → `Table` → `ScanBuilder` → `Batch` →
  * `PartitionReader` on the read side, `WriteBuilder` → `BatchWrite` →
  * `DataWriter` with a real commit protocol on the write side. COLUMN PRUNING is
  * pushed into the reader: only the requested columns' slices are cut and
  * converted, and the scan's output schema shrinks accordingly. FILTER PUSHDOWN
  * (comparison/In/IsNull/StartsWith on any column) evaluates on the raw line
  * before row construction; all filters are also left as Spark-side residuals,
  * so the pushdown only saves work, never owns correctness. LIMIT pushdown
  * stops each partition reader after the first N surviving records (partial —
  * Spark still applies the global limit).
  *
  * Widths are CHARACTER widths over UTF-8-decoded lines (ASCII feeds: same as
  * bytes; a byte-aligned reader for multi-byte encodings would slice the raw
  * bytes before decoding — documented trade-off, not attempted here).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.FixedWidthSource")
  *     .schema("k INT, name STRING, qty DOUBLE")
  *     .option("widths", "6,12,10")        // one char width per schema field
  *     .load(dir)                          // directory of text files, 1 record/line
  * }}}
  *
  * Commit protocol: each write task streams to a uniquely-named file and reports
  * it in its commit message; the driver `commit` writes a `_graft_manifest-*`
  * file naming exactly the committed files. Readers honor manifests when present
  * (files orphaned by crashed task attempts are ignored), and fall back to a
  * directory listing for externally-produced dirs with no manifest.
  *
  * Scale notes: one InputPartition per file (fixed-width feeds arrive as many
  * shard files; finer intra-file splitting would need line-boundary alignment like
  * Hadoop's TextInputFormat — out of scope here), readers stream line-by-line with
  * O(1) memory, and all filesystem access goes through the SESSION's Hadoop
  * configuration (serialized to executors), so `spark.hadoop.*` credentials and
  * filesystem settings apply as they do for built-in sources. */
class FixedWidthSource extends TableProvider {

  // schema must come from the user (no inference pass over the data)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft.sources.FixedWidthSource requires an explicit .schema(...)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val widths = Option(properties.get("widths")).getOrElse(
      throw new IllegalArgumentException("option 'widths' is required"))
      .split(",").map(_.trim.toInt)
    require(widths.length == schema.length,
      s"widths has ${widths.length} entries for ${schema.length} schema fields")
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("a load path is required"))
    val ascii = Option(properties.get("ascii")).exists(_.toBoolean)
    val columnar = Option(properties.get("columnar")).exists(_.toBoolean)
    new FixedWidthTable(schema, widths, path, ascii, columnar)
  }
}

/** One aggregate accepted for pushdown: COUNT(*) / COUNT(col) / MIN(col) /
  * MAX(col). `fieldIdx` is the DATA-schema index (-1 for `*`). */
private[sources] case class FixedWidthAgg(kind: String, fieldIdx: Int,
    name: String, dataType: DataType) extends Serializable

/** One pushed TOP-N sort key: DATA-schema field index + direction + null
  * placement, evaluated in the reader's comparison domain (long/double/
  * UTF8String — the same domains as the pushed filters). */
private[sources] case class FixedWidthSortKey(fieldIdx: Int, ascending: Boolean,
    nullsFirst: Boolean) extends Serializable

/** A translated pushed aggregation: GROUP BY column indices (possibly empty)
  * plus the aggregate list. Scan output is groups-then-aggregates, positional,
  * matching Spark's partial-pushdown contract. */
private[sources] case class FixedWidthPushedAgg(groupIdx: Seq[Int],
    specs: Seq[FixedWidthAgg]) extends Serializable

private[sources] object FixedWidthAgg {
  /** Translate a connector Aggregation, or None if any part is unsupported
    * (Spark then falls back to a plain scan + its own aggregate). */
  def translate(schema: StructType, agg: Aggregation): Option[FixedWidthPushedAgg] = {
    def idxOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[Int] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          val i = schema.fieldNames.indexOf(f.fieldNames.head)
          if (i >= 0) Some(i) else None
        case _ => None
      }
    def ok(dt: DataType): Boolean = dt match {
      case IntegerType | LongType | DoubleType | StringType => true
      case _ => false
    }
    val groups = agg.groupByExpressions.toSeq.map(idxOf)
    if (!groups.forall(_.isDefined)) return None
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(FixedWidthAgg("count_star", -1, "count_star", LongType))
      case c: Count if !c.isDistinct =>
        idxOf(c.column).map(i =>
          FixedWidthAgg("count", i, s"count_${schema.fieldNames(i)}", LongType))
      case m: Min =>
        idxOf(m.column).filter(i => ok(schema.fields(i).dataType)).map(i =>
          FixedWidthAgg("min", i, s"min_${schema.fieldNames(i)}",
            schema.fields(i).dataType))
      case m: Max =>
        idxOf(m.column).filter(i => ok(schema.fields(i).dataType)).map(i =>
          FixedWidthAgg("max", i, s"max_${schema.fieldNames(i)}",
            schema.fields(i).dataType))
      case _ => None
    }
    if (specs.forall(_.isDefined))
      Some(FixedWidthPushedAgg(groups.flatten, specs.flatten))
    else None
  }

  def schemaOf(schema: StructType, pa: FixedWidthPushedAgg): StructType =
    StructType(
      pa.groupIdx.map(i => schema.fields(i).copy(nullable = true)) ++
        pa.specs.map(s =>
          StructField(s.name, s.dataType, nullable = s.kind != "count_star" &&
            s.kind != "count")))
}

/** The session's Hadoop configuration as a serializable bag — DSv2 factories ship
  * to executors, where a bare `new Configuration()` would drop every
  * `spark.hadoop.*` setting (s3a credentials, defaultFS, ...). */
private[sources] object FixedWidthConf {
  def capture(): Array[(String, String)] = {
    val c = SparkSession.active.sessionState.newHadoopConf()
    c.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
  }
  def restore(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

class FixedWidthTable(dataSchema: StructType, widths: Array[Int], path: String,
    ascii: Boolean = false, columnar: Boolean = false)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"fixedwidth:$path"
  override def schema(): StructType = dataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixedWidthScanBuilder(dataSchema, widths, path, ascii, columnar)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FixedWidthWriteBuilder(info.schema(), widths, path, info.queryId())
}

class FixedWidthScanBuilder(dataSchema: StructType, widths: Array[Int], path: String,
    ascii: Boolean = false, columnar: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var topN: Seq[FixedWidthSortKey] = Nil
  private var aggSpecs: Option[FixedWidthPushedAgg] = None
  private var aggComplete: Boolean = false

  /** TOP-N pushdown (ORDER BY + LIMIT): each partition reader keeps only a
    * bounded N-row selection of its file via the pushed sort keys, so an
    * `ORDER BY ... LIMIT n` over a terabyte feed ships n rows per file
    * instead of every record. PARTIAL by contract (isPartiallyPushed stays
    * true): Spark still merges and re-sorts the per-file selections, the
    * reader-side cut is purely an I/O/exchange saving — same philosophy as
    * the filter pushdown (saves work, never owns correctness). Only plain
    * column keys over the supported comparison domains push. */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder], n: Int): Boolean = {
    if (aggSpecs.isDefined) return false
    val keys = orders.toSeq.map { so =>
      so.expression() match {
        case ref: NamedReference if ref.fieldNames.length == 1 =>
          val i = dataSchema.fieldNames.indexOf(ref.fieldNames.head)
          if (i < 0) None
          else dataSchema.fields(i).dataType match {
            case IntegerType | LongType | DoubleType | StringType =>
              Some(FixedWidthSortKey(i,
                so.direction() == org.apache.spark.sql.connector.expressions
                  .SortDirection.ASCENDING,
                so.nullOrdering() == org.apache.spark.sql.connector.expressions
                  .NullOrdering.NULLS_FIRST))
            case _ => None
          }
        case _ => None
      }
    }
    if (keys.forall(_.isDefined) && keys.nonEmpty) {
      topN = keys.flatten
      limit = n
      true
    } else false
  }

  /** Both limit and top-N pushdown are PARTIAL: Spark applies the global
    * limit / final sort regardless (diamond-default disambiguation). */
  override def isPartiallyPushed(): Boolean = true
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** AGGREGATE pushdown (COUNT/COUNT(col)/MIN/MAX, GROUP BY on source
    * columns). Two tiers:
    *
    *  - COMPLETE (`SELECT count(*)` alone, `ascii` option set, no filters): the
    *    count is fixed-record-size arithmetic over the committed FILE LENGTHS —
    *    ⌈len/(lineWidth+1)⌉ per file — computed at planning time from the
    *    listing the scan already holds. ZERO data bytes are read; the `ascii`
    *    option is the user's assertion that characters are single-byte and
    *    records writer-conforming (no ragged/empty lines), which is what makes
    *    byte arithmetic equal the row count.
    *  - PARTIAL (everything else, including GROUP BY on source columns): each
    *    partition reader streams its file once and emits one row of partial
    *    aggregates PER GROUP (one total, with no grouping) instead of every
    *    record; Spark's final aggregate merges the per-file rows. At 100 TB
    *    this turns the scan→agg boundary from n rows into #files×|groups|
    *    rows — the same I/O, a tiny fraction of the row construction and
    *    exchange volume. Reader memory is bounded by per-file group
    *    cardinality, the same shape as Spark's own partial hash aggregate.
    *
    * Only offered when no filters are pushed: this source conservatively
    * returns every filter as a Spark-side residual, and a residual Filter node
    * cannot run above aggregated rows (Spark's pushdown rule also refuses
    * this on its own). String min/max compare as UTF8String — the same binary
    * collation Spark's merge side uses. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    ascii && pushed.isEmpty && limit < 0 &&
      FixedWidthAgg.translate(dataSchema, agg).exists(pa =>
        pa.groupIdx.isEmpty && pa.specs.nonEmpty &&
          pa.specs.forall(_.kind == "count_star"))
  override def pushAggregation(agg: Aggregation): Boolean =
    if (pushed.nonEmpty || limit >= 0) false
    else FixedWidthAgg.translate(dataSchema, agg) match {
      case Some(pa) if pa.specs.nonEmpty =>
        aggSpecs = Some(pa)
        aggComplete = supportCompletePushDown(agg)
        true
      case _ => false
    }
  /** LIMIT pushdown: each partition reader stops after `l` surviving records, so
    * a `df.limit(5)` over a terabyte feed reads ~5 lines per file instead of
    * streaming every file to the end. Partial by contract (the default
    * `isPartiallyPushed` stays true): Spark still applies the global limit on
    * top, the reader-side stop is purely an I/O saving. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  /** Supported filters are evaluated INSIDE the reader, on slices cut straight
    * from the raw line (independent of column pruning), so non-matching records
    * are dropped before any InternalRow is built. Conservatively, every filter is
    * also returned as residual for Spark to re-check post-scan — the pushdown is
    * an I/O/alloc saving, never a correctness dependency. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FixedWidthFilters.supported(dataSchema, _))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new FixedWidthScan(dataSchema, widths, path, required, pushed, limit,
      aggSpecs, aggComplete, columnar, topN)
}

class FixedWidthScan(dataSchema: StructType, widths: Array[Int], path: String,
    required: StructType, val pushedFilters: Array[Filter], limit: Int = -1,
    aggSpecs: Option[FixedWidthPushedAgg] = None, aggComplete: Boolean = false,
    columnar: Boolean = false, topN: Seq[FixedWidthSortKey] = Nil)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (DPP-style) filters delivered after planning — e.g. the IN-set of
    * join keys observed on a broadcast join's build side. Appended to the
    * reader's row-filter set, so a selective dimension prunes the fact scan
    * at execution time; like all pushdown here they only SAVE work (Spark
    * keeps its own copy of the predicate above the scan). */
  private var runtimeFilters: Array[Filter] = Array.empty

  /** Which columns may host a runtime filter: any read column of a plain row
    * scan. An aggregate-pushdown scan emits pre-aggregated rows (filtering
    * them post-hoc would be wrong) and a pushed limit counts surviving rows —
    * both advertise NO filterable attributes instead. */
  override def filterAttributes(): Array[NamedReference] =
    if (aggSpecs.isDefined || limit >= 0) Array.empty
    else required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit =
    runtimeFilters = filters.filter(FixedWidthFilters.supported(dataSchema, _))
  override def readSchema(): StructType =
    aggSpecs.map(FixedWidthAgg.schemaOf(dataSchema, _)).getOrElse(required)
  override def toBatch: Batch = this
  // surfaces in .explain via BatchScanExec.simpleString, like built-in FileScans
  override def description(): String =
    s"FixedWidth PushedFilters: [${pushedFilters.mkString(", ")}], " +
      (if (limit >= 0 && topN.isEmpty) s"PushedLimit: $limit, " else "") +
      (if (topN.nonEmpty)
        s"PushedTopN: [${topN.map(k =>
          dataSchema.fieldNames(k.fieldIdx) +
            (if (k.ascending) " ASC" else " DESC")).mkString(", ")}] LIMIT $limit, "
      else "") +
      aggSpecs.map(pa =>
        s"PushedAggregates${if (aggComplete) " (complete)" else ""}: " +
          s"[${pa.specs.map(_.name).mkString(", ")}], " +
          (if (pa.groupIdx.nonEmpty)
            s"PushedGroupBy: [${pa.groupIdx.map(dataSchema.fieldNames).mkString(", ")}], "
          else "")).getOrElse("") +
      s"ReadSchema: ${readSchema().catalogString}"

  /** Committed (path, length) pairs — listed once, shared by partition planning
    * and statistics. */
  private lazy val files: Array[(String, Long)] = {
    val confBag = FixedWidthConf.capture()
    val p = new Path(path)
    val fs = p.getFileSystem(FixedWidthConf.restore(confBag))
    val st = fs.getFileStatus(p)
    val all = if (st.isDirectory) fs.listStatus(p).filter(_.isFile) else Array(st)
    val manifests = all.filter(_.getPath.getName.startsWith("_graft_manifest"))
    if (manifests.nonEmpty) {
      // committed writes: read exactly the manifested files (orphans from
      // crashed task attempts are excluded by construction)
      val byName = all.map(s => s.getPath.getName -> s).toMap
      manifests.flatMap { m =>
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(m.getPath), java.nio.charset.StandardCharsets.UTF_8))
        try Iterator.continually(in.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty).toArray
        finally in.close()
      }.distinct.sorted.map { name =>
        byName.get(name) match {
          case Some(s) => (s.getPath.toString, s.getLen)
          case None => // manifested file outside the listing (shouldn't happen)
            val fp = new Path(p, name); (fp.toString, fs.getFileStatus(fp).getLen)
        }
      }
    } else all.collect {
      case s if !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".") => (s.getPath.toString, s.getLen)
    }.sortBy(_._1)
  }

  override def planInputPartitions(): Array[InputPartition] = aggSpecs match {
    case Some(_) if aggComplete =>
      // metadata-only count(*): computed HERE from committed file lengths —
      // the reader emits the precomputed row, no file is ever opened
      val lineBytes = widths.sum + 1
      val n = files.map(f => (f._2 + lineBytes - 1) / lineBytes).sum
      Array(FixedWidthMetaCountPartition(n))
    case Some(pa) =>
      // one partial-aggregate-rowset per file. Zero files: an UNGROUPED count
      // over an empty feed must still yield one zero row (synthetic empty
      // partition); a GROUPED aggregate over an empty feed is correctly empty.
      if (files.isEmpty && pa.groupIdx.isEmpty)
        Array(FixedWidthAggPartition(null))
      else files.map(f => FixedWidthAggPartition(f._1): InputPartition)
    case None => files.map(f => FixedWidthPartition(f._1): InputPartition)
  }

  /** Real size/row statistics from the file listing: fixed-width records make
    * the row count a straight division (total bytes / line width incl. '\n').
    * Reporting true sizeInBytes is what lets Spark auto-broadcast a small
    * fixed-width dimension in a join — without it a DSv2 relation defaults to
    * "unknown/huge" and every join against this source becomes a shuffle. */
  override def estimateStatistics(): Statistics = {
    val bytes = files.map(_._2).sum
    val lineWidth = widths.sum + 1 // records are '\n'-terminated lines
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes / math.max(1, lineWidth))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(dataSchema, widths, required,
      pushedFilters ++ runtimeFilters, limit, aggSpecs, FixedWidthConf.capture(),
      columnar, topN)

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new LinesReadMetric, new RowsEmittedMetric)
}

case class FixedWidthPartition(file: String) extends InputPartition
/** Partial-aggregate partition: one source file (null = empty feed). */
case class FixedWidthAggPartition(file: String) extends InputPartition
/** Complete count(*) pushdown: the row is already computed from file lengths. */
case class FixedWidthMetaCountPartition(count: Long) extends InputPartition

/** Scan-level custom metrics (surface in the Spark UI / SQLMetrics next to the
  * built-in sources' numOutputRows): raw lines streamed vs records surviving
  * the pushed filters — the observability a pushdown needs to prove it prunes. */
private[sources] class LinesReadMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "fw_lines_read"
  override def description(): String = "fixed-width raw lines read"
}
private[sources] class RowsEmittedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "fw_rows_emitted"
  override def description(): String = "fixed-width records emitted"
}
private[sources] case class FixedWidthTaskMetric(metricName: String, v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = v
}

class FixedWidthReaderFactory(dataSchema: StructType, widths: Array[Int],
    required: StructType, filters: Array[Filter], limit: Int,
    aggSpecs: Option[FixedWidthPushedAgg],
    confBag: Array[(String, String)],
    columnar: Boolean = false,
    topN: Seq[FixedWidthSortKey] = Nil) extends PartitionReaderFactory {

  /** Vectorized path (option `columnar=true`): plain row partitions only —
    * aggregate/meta partitions emit tiny pre-aggregated InternalRows where
    * batching buys nothing. When enabled, Spark plans the scan columnar and
    * inserts its own ColumnarToRow (codegen'd) boundary above it. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && topN.isEmpty && partition.isInstanceOf[FixedWidthPartition]

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    partition match {
      case p: FixedWidthPartition =>
        new FixedWidthColumnarReader(p.file, dataSchema, widths, required,
          filters, limit, confBag)
      case other => throw new UnsupportedOperationException(
        s"no columnar reader for $other")
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case FixedWidthMetaCountPartition(n) =>
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = {
            val specs = aggSpecs.get.specs
            val row = new GenericInternalRow(specs.length)
            specs.indices.foreach(i => row.update(i, n))
            row
          }
          override def close(): Unit = ()
        }
      case FixedWidthAggPartition(file) =>
        new FixedWidthAggReader(file, dataSchema, widths, aggSpecs.get, confBag)
      case p: FixedWidthPartition if topN.nonEmpty =>
        new FixedWidthTopNReader(p.file, dataSchema, widths, required, filters,
          limit, topN, confBag)
      case p: FixedWidthPartition =>
        new FixedWidthReader(p.file, dataSchema, widths, required, filters,
          limit, confBag)
    }
}

/** Streams one file and emits one row of partial aggregates PER GROUP (one
  * total row with no grouping): counts as running longs, min/max in the
  * column's comparison domain (UTF8String binary order for strings — matching
  * Spark's merge side). All-null columns emit null min/max, which Spark's
  * final min/max ignores. Memory is bounded by the file's group cardinality —
  * the same shape as Spark's own partial hash aggregate. */
class FixedWidthAggReader(file: String, dataSchema: StructType,
    widths: Array[Int], pushed: FixedWidthPushedAgg,
    confBag: Array[(String, String)]) extends PartitionReader[InternalRow] {

  private val specs = pushed.specs
  private val groupIdx = pushed.groupIdx
  private val starts = widths.scanLeft(0)(_ + _)

  private def slice(line: String, i: Int): String = {
    val start = starts(i)
    if (start >= line.length) return null
    val r = line.substring(start, math.min(start + widths(i), line.length)).trim
    if (r.isEmpty) null else r
  }

  private def convert(raw: String, dt: DataType): Any =
    if (raw == null) null
    else dt match {
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case DoubleType  => raw.toDouble
      case StringType  => UTF8String.fromString(raw)
      case other => throw new UnsupportedOperationException(
        s"fixed-width: unsupported type $other")
    }

  /** counts ++ min/max accumulators for one group. */
  private final class Acc {
    val counts = new Array[Long](specs.length)
    val best = new Array[Any](specs.length)
    def update(line: String): Unit = {
      var i = 0
      while (i < specs.length) {
        val s = specs(i)
        if (s.kind == "count_star") counts(i) += 1
        else {
          val raw = slice(line, s.fieldIdx)
          if (raw != null) s.kind match {
            case "count" => counts(i) += 1
            case "min" | "max" =>
              val v = convert(raw, s.dataType)
              val better = best(i) == null || {
                val c = (v, best(i)) match {
                  case (a: Integer, b: Integer) => a.compareTo(b)
                  case (a: java.lang.Long, b: java.lang.Long) => a.compareTo(b)
                  case (a: java.lang.Double, b: java.lang.Double) =>
                    java.lang.Double.compare(a, b)
                  case (a: UTF8String, b: UTF8String) => a.compareTo(b)
                  case _ => 0
                }
                if (s.kind == "min") c < 0 else c > 0
              }
              if (better) best(i) = v
          }
        }
        i += 1
      }
    }
  }

  /** Stream the whole file once into per-group accumulators (insertion order
    * preserved for deterministic emission; Spark re-merges regardless). */
  private lazy val rows: Iterator[InternalRow] = {
    val groups = new java.util.LinkedHashMap[List[Any], Acc]()
    if (file != null) {
      val p = new Path(file)
      val in = p.getFileSystem(FixedWidthConf.restore(confBag)).open(p)
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8))
      try {
        var line = reader.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val key = groupIdx.map(i =>
              convert(slice(line, i), dataSchema.fields(i).dataType)).toList
            var acc = groups.get(key)
            if (acc == null) { acc = new Acc; groups.put(key, acc) }
            acc.update(line)
          }
          line = reader.readLine()
        }
      } finally reader.close()
    } else if (groupIdx.isEmpty) {
      groups.put(Nil, new Acc) // empty feed, ungrouped: one zero row
    }
    import scala.jdk.CollectionConverters._
    groups.entrySet().iterator().asScala.map { e =>
      val row = new GenericInternalRow(groupIdx.length + specs.length)
      e.getKey.zipWithIndex.foreach { case (v, i) => row.update(i, v) }
      val acc = e.getValue
      specs.indices.foreach { i =>
        row.update(groupIdx.length + i,
          if (specs(i).kind == "count_star" || specs(i).kind == "count")
            acc.counts(i)
          else acc.best(i))
      }
      row: InternalRow
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Append-only batch WRITE path: each task streams its partition to
  * `part-<partition>-<task>-<queryId>.txt` — the queryId token (from
  * `LogicalWriteInfo`) makes names unique PER JOB, not just per task attempt:
  * Spark task ids restart per application, so without it a second application
  * appending to the same directory could silently clobber an earlier run's
  * committed file. Files are additionally created with overwrite=false, so any
  * residual collision fails the task instead of losing data. Each task reports
  * its file in its commit message, and the driver `commit` records the committed
  * set in a manifest the reader honors. `abort` deletes the named files. Values
  * render right-aligned for numerics, left-aligned for strings; a value wider
  * than its column fails the task (fail-fast beats silent truncation for
  * fixed-width interchange).
  *
  * Round-trip caveat (by design of the format, stated here): the reader trims
  * each slice, and the writer renders NULL and the empty string identically as
  * all spaces — so NULL, `""`, whitespace-only strings, and leading/trailing
  * spaces all read back as NULL / trimmed values. Fixed-width interchange has no
  * NULL rendering; feeds that need the distinction should carry an explicit
  * indicator column. */
class FixedWidthWriteBuilder(schema: StructType, widths: Array[Int], path: String,
    queryId: String) extends WriteBuilder {
  require(widths.length == schema.length,
    s"widths has ${widths.length} entries for ${schema.length} write fields")
  override def buildForBatch(): BatchWrite = new FixedWidthBatchWrite(
    schema, widths, path, queryId, FixedWidthConf.capture())
}

case class FixedWidthCommit(file: String) extends WriterCommitMessage

class FixedWidthBatchWrite(schema: StructType, widths: Array[Int], path: String,
    queryId: String, confBag: Array[(String, String)]) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FixedWidthWriterFactory(schema, widths, path, queryId, confBag)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val names = messages.collect { case FixedWidthCommit(f) => new Path(f).getName }
      .sorted
    val dir = new Path(path)
    val fs = dir.getFileSystem(FixedWidthConf.restore(confBag))
    // manifest name derives from its content so repeated appends never collide
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.arrayHash(names) & 0x7fffffff)
    val out = fs.create(new Path(dir, s"_graft_manifest-$tag.txt"), true)
    try out.write(names.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = FixedWidthConf.restore(confBag)
    messages.collect { case FixedWidthCommit(f) =>
      val p = new Path(f); p.getFileSystem(conf).delete(p, false)
    }
  }
}

class FixedWidthWriterFactory(schema: StructType, widths: Array[Int], path: String,
    queryId: String, confBag: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new FixedWidthWriter(schema, widths, path, partitionId, taskId, queryId, confBag)
}

class FixedWidthWriter(schema: StructType, widths: Array[Int], path: String,
    partitionId: Int, taskId: Long, queryId: String,
    confBag: Array[(String, String)]) extends DataWriter[InternalRow] {
  private val file = new Path(path, f"part-$partitionId%05d-$taskId-$queryId.txt")
  private val fs = file.getFileSystem(FixedWidthConf.restore(confBag))
  // overwrite=false: a name collision (same job, same task, same attempt — should
  // be impossible) fails the task rather than silently clobbering committed data
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(file, false), java.nio.charset.StandardCharsets.UTF_8))

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < widths.length) {
      val w = widths(i)
      val raw =
        if (row.isNullAt(i)) ""
        else schema.fields(i).dataType match {
          case IntegerType => row.getInt(i).toString
          case LongType    => row.getLong(i).toString
          case DoubleType  => row.getDouble(i).toString
          case StringType  => row.getUTF8String(i).toString
          case other => throw new UnsupportedOperationException(
            s"fixed-width: unsupported type $other")
        }
      if (raw.length > w) throw new IllegalArgumentException(
        s"value '$raw' wider than column ${schema.fields(i).name} ($w)")
      val pad = " " * (w - raw.length)
      schema.fields(i).dataType match {
        case StringType => sb.append(raw).append(pad) // left-aligned
        case _          => sb.append(pad).append(raw) // right-aligned
      }
      i += 1
    }
    out.write(sb.toString)
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    FixedWidthCommit(file.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}

/** Streams one file line-by-line; for each line slices ONLY the character ranges
  * of the pruned columns and converts in place. Pushed filters run on the raw
  * line BEFORE row construction, so filtered-out records cost a slice + compare,
  * not an InternalRow. */
class FixedWidthReader(file: String, dataSchema: StructType, widths: Array[Int],
    required: StructType, filters: Array[Filter], limit: Int,
    confBag: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private val preds: Array[String => Boolean] =
    filters.map(FixedWidthFilters.compile(dataSchema, widths, _))

  private def passes(l: String): Boolean = {
    var i = 0
    while (i < preds.length) { if (!preds(i)(l)) return false; i += 1 }
    true
  }

  // (start offset in line, width, target type) per REQUIRED field, in output order
  private val slices: Array[(Int, Int, DataType)] = {
    val starts = widths.scanLeft(0)(_ + _)
    required.fields.map { f =>
      val i = dataSchema.fieldIndex(f.name)
      (starts(i), widths(i), f.dataType)
    }
  }

  private val p = new Path(file)
  private val in = p.getFileSystem(FixedWidthConf.restore(confBag)).open(p)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  private var line: String = _

  private var emitted = 0
  private var linesRead = 0L

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) { line = null; return false }
    line = reader.readLine()
    if (line != null) linesRead += 1
    while (line != null && (line.isEmpty || !passes(line))) {
      line = reader.readLine()
      if (line != null) linesRead += 1
    }
    if (line != null) emitted += 1
    line != null
  }

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(FixedWidthTaskMetric("fw_lines_read", linesRead),
      FixedWidthTaskMetric("fw_rows_emitted", emitted.toLong))

  override def get(): InternalRow = {
    val row = new GenericInternalRow(slices.length)
    var i = 0
    while (i < slices.length) {
      val (start, width, dt) = slices(i)
      val raw =
        if (start >= line.length) ""
        else line.substring(start, math.min(start + width, line.length)).trim
      row.update(i,
        if (raw.isEmpty) null
        else dt match {
          case IntegerType => raw.toInt
          case LongType    => raw.toLong
          case DoubleType  => raw.toDouble
          case StringType  => UTF8String.fromString(raw)
          case other => throw new UnsupportedOperationException(
            s"fixed-width: unsupported type $other")
        })
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}

/** TOP-N pushdown reader: streams its whole file once, keeping only the N
  * best surviving lines under the pushed sort keys (bounded insertion into a
  * sorted buffer — memory O(N) for any file size), then emits them in key
  * order. Comparison domains mirror the pushed filters exactly (long/double
  * with Spark's -0.0=0.0 and NaN-greatest rules, UTF8String binary order),
  * so the reader's per-file selection is a superset-safe cut of what Spark's
  * global TopN keeps. */
class FixedWidthTopNReader(file: String, dataSchema: StructType,
    widths: Array[Int], required: StructType, filters: Array[Filter],
    limit: Int, topN: Seq[FixedWidthSortKey],
    confBag: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private val preds: Array[String => Boolean] =
    filters.map(FixedWidthFilters.compile(dataSchema, widths, _))

  private def passes(l: String): Boolean = {
    var i = 0
    while (i < preds.length) { if (!preds(i)(l)) return false; i += 1 }
    true
  }

  private val starts = widths.scanLeft(0)(_ + _)

  private def rawSlice(line: String, i: Int): String = {
    val start = starts(i)
    if (start >= line.length) return null
    val r = line.substring(start, math.min(start + widths(i), line.length)).trim
    if (r.isEmpty) null else r
  }

  /** Spark-compatible three-valued comparison of two raw slices of field i. */
  private def cmpField(i: Int, a: String, b: String, k: FixedWidthSortKey): Int = {
    if (a == null && b == null) return 0
    if (a == null) return if (k.nullsFirst) -1 else 1
    if (b == null) return if (k.nullsFirst) 1 else -1
    val c = dataSchema.fields(i).dataType match {
      case IntegerType | LongType => java.lang.Long.compare(a.toLong, b.toLong)
      case DoubleType =>
        def norm(d: Double): Double = if (d == 0.0d) 0.0d else d
        java.lang.Double.compare(norm(a.toDouble), norm(b.toDouble))
      case StringType =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
      case other => throw new UnsupportedOperationException(
        s"fixed-width: unsupported sort type $other")
    }
    if (k.ascending) c else -c
  }

  private def cmpLines(x: String, y: String): Int = {
    var i = 0
    while (i < topN.length) {
      val k = topN(i)
      val c = cmpField(k.fieldIdx, rawSlice(x, k.fieldIdx),
        rawSlice(y, k.fieldIdx), k)
      if (c != 0) return c
      i += 1
    }
    0
  }

  // bounded sorted buffer of the N best lines seen so far
  private lazy val selected: Iterator[String] = {
    val buf = new java.util.ArrayList[String](math.max(limit, 1))
    val p = new Path(file)
    val in = p.getFileSystem(FixedWidthConf.restore(confBag)).open(p)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.nonEmpty && passes(line) &&
            (buf.size < limit || cmpLines(line, buf.get(buf.size - 1)) < 0)) {
          // binary-search insertion keeps the buffer sorted; O(log N) compares
          var lo = 0; var hi = buf.size
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cmpLines(line, buf.get(mid)) < 0) hi = mid else lo = mid + 1
          }
          buf.add(lo, line)
          if (buf.size > limit) buf.remove(buf.size - 1)
        }
        line = reader.readLine()
      }
    } finally reader.close()
    scala.jdk.CollectionConverters.ListHasAsScala(buf).asScala.iterator
  }

  private val slices: Array[(Int, Int, DataType)] = {
    required.fields.map { f =>
      val i = dataSchema.fieldIndex(f.name)
      (starts(i), widths(i), f.dataType)
    }
  }

  private var line: String = _

  override def next(): Boolean = {
    if (selected.hasNext) { line = selected.next(); true } else false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(slices.length)
    var i = 0
    while (i < slices.length) {
      val (start, width, dt) = slices(i)
      val raw =
        if (start >= line.length) ""
        else line.substring(start, math.min(start + width, line.length)).trim
      row.update(i,
        if (raw.isEmpty) null
        else dt match {
          case IntegerType => raw.toInt
          case LongType    => raw.toLong
          case DoubleType  => raw.toDouble
          case StringType  => UTF8String.fromString(raw)
          case other => throw new UnsupportedOperationException(
            s"fixed-width: unsupported type $other")
        })
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}

/** Vectorized twin of [[FixedWidthReader]]: parses surviving lines straight
  * into on-heap column vectors, emitting 4096-row [[ColumnarBatch]]es. Same
  * pushdown semantics (filters on the raw line, pruned slices only, limit
  * stop); the payoff is downstream — Spark's ColumnarToRow is codegen'd and
  * the per-row GenericInternalRow allocation disappears. */
class FixedWidthColumnarReader(file: String, dataSchema: StructType,
    widths: Array[Int], required: StructType, filters: Array[Filter],
    limit: Int, confBag: Array[(String, String)])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  private val BatchRows = 4096

  private val preds: Array[String => Boolean] =
    filters.map(FixedWidthFilters.compile(dataSchema, widths, _))

  private def passes(l: String): Boolean = {
    var i = 0
    while (i < preds.length) { if (!preds(i)(l)) return false; i += 1 }
    true
  }

  private val slices: Array[(Int, Int, DataType)] = {
    val starts = widths.scanLeft(0)(_ + _)
    required.fields.map { f =>
      val i = dataSchema.fieldIndex(f.name)
      (starts(i), widths(i), f.dataType)
    }
  }

  private val p = new Path(file)
  private val in = p.getFileSystem(FixedWidthConf.restore(confBag)).open(p)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))

  private val vectors =
    org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
      .allocateColumns(BatchRows, required)
  private val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
    vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]])
  private var emitted = 0
  private var eof = false

  private def fill(line: String, row: Int): Unit = {
    var i = 0
    while (i < slices.length) {
      val (start, width, dt) = slices(i)
      val raw =
        if (start >= line.length) ""
        else line.substring(start, math.min(start + width, line.length)).trim
      if (raw.isEmpty) vectors(i).putNull(row)
      else dt match {
        case IntegerType => vectors(i).putInt(row, raw.toInt)
        case LongType    => vectors(i).putLong(row, raw.toLong)
        case DoubleType  => vectors(i).putDouble(row, raw.toDouble)
        case StringType =>
          val b = raw.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          vectors(i).putByteArray(row, b, 0, b.length)
        case other => throw new UnsupportedOperationException(
          s"fixed-width: unsupported type $other")
      }
      i += 1
    }
  }

  override def next(): Boolean = {
    if (eof) return false
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    while (n < BatchRows && !eof) {
      if (limit >= 0 && emitted >= limit) eof = true
      else {
        val line = reader.readLine()
        if (line == null) eof = true
        else {
          linesRead += 1
          if (line.nonEmpty && passes(line)) {
            fill(line, n); n += 1; emitted += 1
          }
        }
      }
    }
    batch.setNumRows(n)
    n > 0
  }

  private var linesRead = 0L

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(FixedWidthTaskMetric("fw_lines_read", linesRead),
      FixedWidthTaskMetric("fw_rows_emitted", emitted.toLong))

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch

  override def close(): Unit = reader.close()
}

/** Translation + interpretation of the v1 `Filter` subset the fixed-width reader
  * can evaluate on raw lines. Exactness rule: integral columns compare as Long,
  * double columns as Double, strings as trimmed String — a filter whose literal
  * can't be represented exactly in the column's comparison domain is simply not
  * pushed (Spark's post-scan residual still applies it). Null semantics match
  * SQL: any comparison against a NULL slice is false; IsNull/IsNotNull test the
  * all-spaces rendering. */
private[sources] object FixedWidthFilters {

  private def fieldType(schema: StructType, a: String): Option[DataType] =
    schema.fields.find(_.name == a).map(_.dataType)

  /** literal representable exactly in the column's comparison domain? */
  private def litOk(dt: DataType, v: Any): Boolean = (dt, v) match {
    case (IntegerType | LongType, (_: java.lang.Byte | _: java.lang.Short |
      _: java.lang.Integer | _: java.lang.Long)) => true
    case (DoubleType, _: java.lang.Number) => true
    case (StringType, _: String) => true
    case _ => false
  }

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v)            => fieldType(schema, a).exists(litOk(_, v))
    case GreaterThan(a, v)        => fieldType(schema, a).exists(litOk(_, v))
    case GreaterThanOrEqual(a, v) => fieldType(schema, a).exists(litOk(_, v))
    case LessThan(a, v)           => fieldType(schema, a).exists(litOk(_, v))
    case LessThanOrEqual(a, v)    => fieldType(schema, a).exists(litOk(_, v))
    case In(a, vs) => vs.nonEmpty &&
      fieldType(schema, a).exists(dt => vs.forall(litOk(dt, _)))
    case IsNull(a)    => fieldType(schema, a).isDefined
    case IsNotNull(a) => fieldType(schema, a).isDefined
    case StringStartsWith(a, _) => fieldType(schema, a).contains(StringType)
    case _ => false
  }

  /** Compile one supported filter to a raw-line predicate. */
  def compile(schema: StructType, widths: Array[Int], f: Filter)
      : String => Boolean = {
    val starts = widths.scanLeft(0)(_ + _)
    def sliceOf(a: String): (Int, Int, DataType) = {
      val i = schema.fieldIndex(a)
      (starts(i), widths(i), schema.fields(i).dataType)
    }
    // trimmed raw slice; null for the all-spaces (NULL) rendering
    def raw(line: String, start: Int, width: Int): String = {
      if (start >= line.length) return null
      val r = line.substring(start, math.min(start + width, line.length)).trim
      if (r.isEmpty) null else r
    }
    // three-valued compare: Some(sign) or None for NULL.
    // Ordering must MATCH SPARK's, or the reader drops rows the residual filter
    // would keep (it can re-check surviving rows, never resurrect dropped ones):
    //  - doubles: Spark treats -0.0 = 0.0 while Double.compare orders them —
    //    normalize both sides (+NaN semantics of Double.compare match Spark's);
    //  - strings: Spark compares UTF-8 BYTES (code-point order); String.compareTo
    //    is UTF-16 code-unit order, which disagrees above the BMP — compare as
    //    UTF8String on both sides.
    def cmpFn(a: String, v: Any): String => Option[Int] = {
      val (start, width, dt) = sliceOf(a)
      dt match {
        case IntegerType | LongType =>
          val lit = v.asInstanceOf[java.lang.Number].longValue()
          l => Option(raw(l, start, width)).map(s => java.lang.Long.compare(s.toLong, lit))
        case DoubleType =>
          def norm(d: Double): Double = if (d == 0.0d) 0.0d else d
          val lit = norm(v.asInstanceOf[java.lang.Number].doubleValue())
          l => Option(raw(l, start, width))
            .map(s => java.lang.Double.compare(norm(s.toDouble), lit))
        case StringType =>
          val lit = UTF8String.fromString(v.asInstanceOf[String])
          l => Option(raw(l, start, width))
            .map(s => UTF8String.fromString(s).compareTo(lit))
        case other => throw new UnsupportedOperationException(
          s"fixed-width: unsupported type $other")
      }
    }
    f match {
      case EqualTo(a, v)            => val c = cmpFn(a, v); l => c(l).contains(0)
      case GreaterThan(a, v)        => val c = cmpFn(a, v); l => c(l).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => val c = cmpFn(a, v); l => c(l).exists(_ >= 0)
      case LessThan(a, v)           => val c = cmpFn(a, v); l => c(l).exists(_ < 0)
      case LessThanOrEqual(a, v)    => val c = cmpFn(a, v); l => c(l).exists(_ <= 0)
      case In(a, vs) =>
        val cs = vs.map(cmpFn(a, _)); l => cs.exists(_(l).contains(0))
      case IsNull(a) =>
        val (start, width, _) = sliceOf(a); l => raw(l, start, width) == null
      case IsNotNull(a) =>
        val (start, width, _) = sliceOf(a); l => raw(l, start, width) != null
      case StringStartsWith(a, p) =>
        val (start, width, _) = sliceOf(a)
        l => { val s = raw(l, start, width); s != null && s.startsWith(p) }
      case other => throw new IllegalArgumentException(
        s"unsupported pushed filter $other") // unreachable: gated by supported()
    }
  }
}
