package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Union-merge AS-OF join (SURVEY.md §2b "as-of join", 100 TB design rules).
  *
  * For every left row, attach the payload of the most recent right row with the
  * same key and `rightTime <= leftTime` (inclusive); left rows with no prior right
  * row get nulls (left-outer semantics). Ties among right rows at the same time are
  * broken by `rightTieBreak` — the HIGHEST value wins.
  *
  * Why union-merge instead of equi-join + per-left-row window: the join
  * materializes left × rights-per-key and shuffles that expansion AGAIN for the
  * window pick. Here both inputs are unioned keyed by (key, time) and one running
  * window per key carries the latest payload forward — a single hash shuffle of
  * |left| + |right| rows, no pair expansion, no second shuffle beyond the caller's
  * ordering. Within a timestamp, right rows (tag 0) sort before left rows (tag 1),
  * which is exactly the inclusive `<=`; `rightTieBreak` ascending means `last`
  * carries the highest-ranked same-time right row. */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asof needs at least one payload column")
    val lFields = left.schema.fields
    val pType = StructType(payload.map(right.schema(_)).toArray)
    val tieType = right.schema(rightTieBreak).dataType

    val lLeg = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__tag"), lit(null).cast(tieType).as("__tie"),
        lit(null).cast(pType).as("__p")) ++
        lFields.map(f => col(f.name)): _*)
    val rLeg = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
        lit(0).as("__tag"), col(rightTieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__p")) ++
        lFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lLeg.unionByName(rLeg)
      .withColumn("__carried",
        last(when(col("__tag") === 0, col("__p")), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lFields.map(f => col(f.name)).toIndexedSeq ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }

  /** Forward AS-OF: attach the EARLIEST right row with `rightTime >= leftTime`
    * (inclusive), ties broken by LOWEST `rightTieBreak`. Same union-merge shape as
    * [[asof]], mirrored: left rows (tag 0) sort before right rows (tag 1) within a
    * timestamp so a same-time right is visible to the forward window, and `first`
    * over [currentRow, unboundedFollowing) picks the next right payload. Still one
    * hash shuffle of |left| + |right| rows — no pair expansion at any scale. */
  def asofForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asof needs at least one payload column")
    val lFields = left.schema.fields
    val pType = StructType(payload.map(right.schema(_)).toArray)
    val tieType = right.schema(rightTieBreak).dataType

    val lLeg = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
        lit(0).as("__tag"), lit(null).cast(tieType).as("__tie"),
        lit(null).cast(pType).as("__p")) ++
        lFields.map(f => col(f.name)): _*)
    val rLeg = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
        lit(1).as("__tag"), col(rightTieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__p")) ++
        lFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lLeg.unionByName(rLeg)
      .withColumn("__carried",
        first(when(col("__tag") === 1, col("__p")), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(lFields.map(f => col(f.name)).toIndexedSeq ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
