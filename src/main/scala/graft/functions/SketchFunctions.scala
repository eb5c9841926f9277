package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's bloom-filter sketch expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the exact expressions
  * Catalyst's own InjectRuntimeFilter rule plants for large shuffle joins, but they
  * are not exposed in the public function registry. Registering them makes the
  * runtime-filter pattern available *declaratively*: build a bloom over the dim-side
  * join keys as an uncorrelated scalar subquery (one tiny broadcast value), pre-filter
  * the fact scan with `might_contain`, then scrub the false positives with the exact
  * semi-join. At 100 TB the bloom removes the bulk of the fact rows before the
  * shuffle, which is the entire cost of a selective semi-join.
  */
object SketchFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
  }
}
