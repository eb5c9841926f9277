package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver has regenerated /root/testdata with different physical parquet types
  * for `events.ts` across rounds (int64 nanos → TIMESTAMP_MICROS isAdjustedToUTC=false
  * → potentially UTC TIMESTAMP_MICROS). Tables.events must normalize all three to
  * TimestampType with identical instants, so a regeneration never breaks the events
  * query family again (round-6 postmortem). */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // one known instant: 2024-03-01T12:34:56.789012 UTC
  private val micros = 1709296496789012L

  private def writeEvents(dir: String, tsExpr: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, micros, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsExpr)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def roundtrip(tag: String)(write: String => Unit): Unit = {
    val dir = Files.createTempDirectory(s"tables_$tag").toString
    write(dir)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType, s"[$tag] normalized type")
    val row = got.select(unix_micros(col("ts"))).head()
    assert(row.getLong(0) === micros, s"[$tag] instant preserved")
  }

  test("events loader adapts: int64 ts (nanos-as-long read shape)") {
    // int64 column named ts: exactly what the nanosAsLong conf yields for
    // TIMESTAMP(NANOS) footers (Spark cannot author a NANOS footer directly)
    roundtrip("longns")(dir => writeEvents(dir, expr(s"${micros}L * 1000")))
  }

  test("events loader adapts: TIMESTAMP_NTZ ts (current testdata generation)") {
    // TIMESTAMP→NTZ cast keeps the wall clock; under the UTC session zone that
    // is the same instant, matching how the driver's generator wrote the file
    roundtrip("ntz")(dir =>
      writeEvents(dir, timestamp_micros(lit(micros)).cast(TimestampNTZType)))
  }

  test("events loader adapts: UTC TIMESTAMP ts") {
    roundtrip("ltz")(dir => writeEvents(dir, timestamp_micros(lit(micros))))
  }

  test("streaming events loader matches the batch loader on the live testdata") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
    val stream = graft.streaming.Streaming.eventsStream(spark, dir)
    assert(stream.schema === batch.schema)
  }
}
