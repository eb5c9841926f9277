package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for FIXED-WIDTH text records (mainframe extracts,
  * legacy feeds) — the engine's demonstration of Spark's connector extension
  * surface: `TableProvider` → `Table` → `ScanBuilder` → `Batch` →
  * `PartitionReader` on the read side, `WriteBuilder` → `BatchWrite` →
  * `DataWriter` with a real commit protocol on the write side. COLUMN PRUNING is
  * pushed into the reader: only the requested columns' slices are cut and
  * converted, and the scan's output schema shrinks accordingly.
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
    new FixedWidthTable(schema, widths, path)
  }
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

class FixedWidthTable(dataSchema: StructType, widths: Array[Int], path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"fixedwidth:$path"
  override def schema(): StructType = dataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixedWidthScanBuilder(dataSchema, widths, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FixedWidthWriteBuilder(info.schema(), widths, path)
}

class FixedWidthScanBuilder(dataSchema: StructType, widths: Array[Int], path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = dataSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new FixedWidthScan(dataSchema, widths, path, required)
}

class FixedWidthScan(dataSchema: StructType, widths: Array[Int], path: String,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val confBag = FixedWidthConf.capture()
    val p = new Path(path)
    val fs = p.getFileSystem(FixedWidthConf.restore(confBag))
    val all =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
      else Array(p)
    val manifests = all.filter(_.getName.startsWith("_graft_manifest"))
    val files =
      if (manifests.nonEmpty) {
        // committed writes: read exactly the manifested files (orphans from
        // crashed task attempts are excluded by construction)
        manifests.flatMap { m =>
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(m), java.nio.charset.StandardCharsets.UTF_8))
          try Iterator.continually(in.readLine()).takeWhile(_ != null)
            .filter(_.nonEmpty).map(new Path(p, _).toString).toArray
          finally in.close()
        }.distinct.sorted
      } else all.collect {
        case f if !f.getName.startsWith("_") && !f.getName.startsWith(".") =>
          f.toString
      }.sorted
    files.map(f => FixedWidthPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(dataSchema, widths, required,
      FixedWidthConf.capture())
}

case class FixedWidthPartition(file: String) extends InputPartition

class FixedWidthReaderFactory(dataSchema: StructType, widths: Array[Int],
    required: StructType, confBag: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FixedWidthReader(partition.asInstanceOf[FixedWidthPartition].file,
      dataSchema, widths, required, confBag)
}

/** Append-only batch WRITE path: each task streams its partition to
  * `part-<partition>-<task>.txt` (names unique per task attempt, so a retry never
  * clobbers another attempt's file), reports the file in its commit message, and
  * the driver `commit` records the committed set in a manifest the reader honors.
  * `abort` deletes the named files. Values render right-aligned for numerics,
  * left-aligned for strings; a value wider than its column fails the task
  * (fail-fast beats silent truncation for fixed-width interchange). */
class FixedWidthWriteBuilder(schema: StructType, widths: Array[Int], path: String)
    extends WriteBuilder {
  require(widths.length == schema.length,
    s"widths has ${widths.length} entries for ${schema.length} write fields")
  override def buildForBatch(): BatchWrite = new FixedWidthBatchWrite(
    schema, widths, path, FixedWidthConf.capture())
}

case class FixedWidthCommit(file: String) extends WriterCommitMessage

class FixedWidthBatchWrite(schema: StructType, widths: Array[Int], path: String,
    confBag: Array[(String, String)]) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FixedWidthWriterFactory(schema, widths, path, confBag)

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
    confBag: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new FixedWidthWriter(schema, widths, path, partitionId, taskId, confBag)
}

class FixedWidthWriter(schema: StructType, widths: Array[Int], path: String,
    partitionId: Int, taskId: Long, confBag: Array[(String, String)])
    extends DataWriter[InternalRow] {
  private val file = new Path(path, f"part-$partitionId%05d-$taskId.txt")
  private val fs = file.getFileSystem(FixedWidthConf.restore(confBag))
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(file, true), java.nio.charset.StandardCharsets.UTF_8))

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
  * of the pruned columns and converts in place. */
class FixedWidthReader(file: String, dataSchema: StructType, widths: Array[Int],
    required: StructType, confBag: Array[(String, String)])
    extends PartitionReader[InternalRow] {

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

  override def next(): Boolean = {
    line = reader.readLine()
    while (line != null && line.isEmpty) line = reader.readLine()
    line != null
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

  override def close(): Unit = reader.close()
}
