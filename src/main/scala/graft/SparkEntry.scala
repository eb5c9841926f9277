package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.queries.QueryDSL.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` maps every operator declared in SURVEY.md §2 to a runnable query over the
  * synthetic tables; `oracleSql` carries the DuckDB-equivalent SQL for the hash-checked
  * correctness gate (t2). Query definitions live under [[graft.queries]], grouped by
  * operator family.
  */
object SparkEntry {

  private val families: Seq[Seq[Q]] = Seq(
    Core.queries,
    Aggregates.queries,
    AggregatesExt.queries,
    Joins.queries,
    Windows.queries,
    SetOps.queries,
    Scalars.queries,
    EventsQ.queries,
    SqlSurface.queries,
    Headline.queries,
    Llm.queries,
    Llmb.queries,
    LlmExt.queries,
    LlmExt2.queries,
    LlmExt2b.queries,
    LlmExt2c.queries,
    SpecQ.queries,
    Scale.queries,
    Extras.queries,
    Analytics.queries,
    Analyticsb.queries,
    Retrieval.queries,
    SketchQ.queries,
    LlmExt3.queries,
    LlmExt3b.queries,
    LlmExt3c.queries,
    LlmExt3d.queries,
    Analytics2.queries,
    Analytics3.queries,
    Analytics4.queries,
    Analytics5.queries,
    Analytics6.queries,
    Analytics7.queries,
    Analytics7b.queries,
    Analytics8.queries,
    Analytics9.queries,
    Analytics10.queries,
    Analytics11.queries,
    Analytics12.queries,
    Analytics13.queries,
    Analytics14.queries,
    Analytics15.queries,
    Analytics16.queries,
    Analytics17.queries,
    Analytics18.queries
  )

  private lazy val allQueries: Seq[Q] = {
    val qs = families.flatten
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL per query (t2 oracle); omitted => rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
