package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Tables form a TPC-H-ish star schema plus `events` (stream table with JSON props),
  * `documents` and `embeddings` (LLM-pipeline tables). All queries take the scale-factor
  * directory as a parameter so the same plan runs at sf0.001 (smoke), sf0.01 (oracle)
  * and sf0.1+ (bench) — and, unchanged, on a real cluster at any scale: nothing below
  * hard-codes partition counts or collects to the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale factor. */
  val broadcastDims: Set[String] = Set("region", "nation", "supplier")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped with three physical parquet types across testdata
    * generations: TIMESTAMP(NANOS) (reads as long ns under the legacy conf),
    * TIMESTAMP_MICROS with isAdjustedToUTC=false (reads as TIMESTAMP_NTZ), and
    * plain UTC TIMESTAMP_MICROS. The loader adapts off the footer schema so a
    * regenerated dataset never breaks the 100+ queries built on this table. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    // no-op unless the footer really is TIMESTAMP(NANOS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      // `div` = integral division: ns epochs (~1.7e18) exceed double's 2^53 exact
      // range, so float division here would corrupt the low microseconds.
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ wall-clock reinterpreted in the (always-UTC) session zone: bit-exact
      // with what DuckDB reads from the same footer.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view (named-source parity with the reference's
    * named-command references, SURVEY.md §2a R6). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
