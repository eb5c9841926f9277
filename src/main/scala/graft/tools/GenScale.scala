package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the driver's testdata (VERDICT r10 ask #7):
  * writes a larger slice into an output dir (under the repo; the source
  * testdata is read-only) so the scaling probe can measure a TRUE 10×/100×
  * step instead of inferring from sf0.01→sf0.1 alone.
  *
  * Scheme: each fact/entity table is unioned `factor` times with every key
  * column shifted into a disjoint sub-universe (`key + copy · (max+1)`), so
  * foreign-key joins keep exactly their per-key fan-in while row counts,
  * distinct-key counts, and group counts all scale by `factor` — the shape a
  * 100-TB corpus actually has (more users/orders/docs, not denser ones).
  * Timestamps/dates keep their window (more traffic in the same period).
  * `documents.text` gets a per-copy suffix token (otherwise exact/near-dedup
  * operators would collapse the replicas — unrepresentative); embeddings get
  * a tiny deterministic first-component jitter per copy so ANN probes don't
  * see factor-way ties. region/nation are fixed dimensions and copy as-is.
  *
  * Usage: runMain graft.tools.GenScale <srcSfDir> <outDir> [factor]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.lift(2).flatMap(_.toIntOption).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val copies = spark.range(factor).select($"id".cast("long").as("copy"))

    /** Shift `keys` columns into disjoint per-copy universes; pass through
      * the rest. One cross with the tiny copies frame (broadcast), then a
      * projection — scales linearly, no shuffle until the write. */
    /** One stride per KEY UNIVERSE, computed from the table that OWNS the
      * key (the PK side) and reused by every FK column referencing it.
      * Shifting an FK by its own table's local max would put copy-k FKs in
      * the wrong sub-universe whenever the sampled slice's max(FK) <
      * max(PK) — breaking the documented per-key fan-in preservation. */
    val universeStride = scala.collection.mutable.Map.empty[String, Long]
    def strideOf(owner: String, key: String): Long =
      universeStride.getOrElseUpdate(key, {
        val m = spark.read.parquet(s"$src/$owner.parquet")
          .agg(max(col(key))).head().getAs[Number](0).longValue
        m + 1L
      })
    // FK column -> (owning table, PK column) for keys referenced across tables
    val fkUniverse = Map(
      "o_custkey" -> ("customer", "c_custkey"),
      "l_orderkey" -> ("orders", "o_orderkey"),
      "l_partkey" -> ("part", "p_partkey"),
      "l_suppkey" -> ("supplier", "s_suppkey"))

    def scale(table: String, keys: Seq[String],
        extra: Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column] = Map.empty): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val shift = keys.map { k =>
        val (owner, pk) = fkUniverse.getOrElse(k, (table, k))
        k -> strideOf(owner, pk)
      }.toMap
      val scaled = df.crossJoin(broadcast(copies))
        .select(df.columns.map { c =>
          val base: org.apache.spark.sql.Column =
            if (shift.contains(c)) (col(c) + $"copy" * shift(c)).as(c)
            else col(c)
          extra.get(c).map(f => f(base).as(c)).getOrElse(base)
        }.toIndexedSeq: _*)
      scaled.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$table.parquet")
      println(s"[genscale] $table x$factor -> ${scaled.count()} rows")
    }

    def copyAsIs(table: String): Unit = {
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[genscale] $table copied as-is")
    }

    copyAsIs("region")
    copyAsIs("nation")
    scale("customer", Seq("c_custkey"))
    scale("supplier", Seq("s_suppkey"))
    scale("part", Seq("p_partkey"))
    scale("orders", Seq("o_orderkey", "o_custkey"))
    scale("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scale("events", Seq("event_id", "user_id"))
    scale("documents", Seq("doc_id"), extra = Map(
      // keep replicas textually distinct so dedup operators see a real corpus
      "text" -> (c => concat(c, lit(" zz"), $"copy".cast("string")))))
    scale("embeddings", Seq("vec_id"), extra = Map(
      // break factor-way distance ties without moving the distribution
      "embedding" -> (c => expr(
        "transform(embedding, (x, i) -> IF(i = 0, " +
          "CAST(x + copy * 0.0001D AS FLOAT), x))"))))
    spark.stop()
  }
}
