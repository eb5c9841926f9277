package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan linter: prints per-query physical-plan red flags — cartesian products,
  * broadcast-nested-loop joins, exchange (shuffle) counts — so plan regressions
  * show up as a diff. Run: runMain graft.tools.PlanLint [sfDir] */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning")) +
          plan.linesIterator.count(_.contains("Exchange rangepartitioning"))
        val bcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
        val flags = (if (cart > 0) s" CARTESIAN=$cart" else "") +
          (if (bnlj > 0) s" BNLJ=$bnlj" else "")
        println(f"LINT $name%-28s shuffles=$shuffles%-3d bcast=$bcasts%-3d$flags")
      } catch { case e: Throwable => println(s"LINT $name PLAN-ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
