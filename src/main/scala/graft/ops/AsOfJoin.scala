package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Union-merge AS-OF join (SURVEY.md §2b "as-of join", 100 TB design rules).
  *
  * Why union-merge instead of equi-join + per-left-row window: the join
  * materializes left × rights-per-key and shuffles that expansion AGAIN for the
  * window pick. Here both inputs are unioned keyed by (key, time) and ONE running
  * window per key carries the matching payload — a single hash shuffle of
  * |left| + |right| rows, no pair expansion.
  *
  * Both directions use an INCREMENTAL [unboundedPreceding, currentRow] frame —
  * Spark evaluates it in O(rows); the forward direction reverses the scan order
  * instead of using an [currentRow, unboundedFollowing] frame, which Spark's
  * UnboundedFollowingWindowFunctionFrame re-scans from scratch per output row
  * (O(rows²) per key). */
object AsOfJoin {

  /** Most recent right row with `rightTime <= leftTime` (inclusive); ties among
    * same-time right rows: HIGHEST `rightTieBreak` wins. Left rows with no prior
    * right row get nulls (left-outer). */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, payload: Seq[String]): DataFrame =
    unionMerge(left, right, leftKey, rightKey, leftTime, rightTime,
      rightTieBreak, payload, forward = false)

  /** Forward AS-OF: the EARLIEST right row with `rightTime >= leftTime`
    * (inclusive), ties broken by LOWEST `rightTieBreak`. */
  def asofForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, payload: Seq[String]): DataFrame =
    unionMerge(left, right, leftKey, rightKey, leftTime, rightTime,
      rightTieBreak, payload, forward = true)

  /** Shared body. Scan order is (time, tag, tie) ascending for backward and
    * descending for forward; right rows tag so that a same-time right sorts
    * BEFORE the left row in scan order (inclusive boundary both ways), and
    * `last(..., ignoreNulls)` over the running frame picks the nearest right:
    * latest-prior for backward, earliest-following for forward (desc scan).
    * Tie direction falls out of the same reversal: asc scan keeps the highest
    * tie-break last, desc scan the lowest. */
  private def unionMerge(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, payload: Seq[String],
      forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "asof needs at least one payload column")
    val lFields = left.schema.fields
    val pType = StructType(payload.map(right.schema(_)).toArray)
    val tieType = right.schema(rightTieBreak).dataType
    val rightTag = if (forward) 1 else 0
    val leftTag = 1 - rightTag

    val lLeg = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
        lit(leftTag).as("__tag"), lit(null).cast(tieType).as("__tie"),
        lit(null).cast(pType).as("__p")) ++
        lFields.map(f => col(f.name)): _*)
    val rLeg = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
        lit(rightTag).as("__tag"), col(rightTieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__p")) ++
        lFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)

    val order =
      if (forward) Seq(col("__t").desc, col("__tag").desc, col("__tie").desc)
      else Seq(col("__t").asc, col("__tag").asc, col("__tie").asc)
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lLeg.unionByName(rLeg)
      .withColumn("__carried",
        last(when(col("__tag") === rightTag, col("__p")), ignoreNulls = true).over(w))
      .filter(col("__tag") === leftTag)
      .select(lFields.map(f => col(f.name)).toIndexedSeq ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
