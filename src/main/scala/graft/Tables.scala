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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType (µs) refuses
    * to read directly. Read it as long nanos (legacy conf) and floor-divide to µs —
    * exact for the generated data, and matching DuckDB's ns→µs cast. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
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
    val raw = eventsRaw(spark, dir)
    // `div` = integral division: ns epochs (~1.7e18) exceed double's 2^53 exact range,
    // so float division here would corrupt the low microseconds.
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view (named-source parity with the reference's
    * named-command references, SURVEY.md §2a R6). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
