package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for extreme key skew (SURVEY.md §4 / 100 TB design rules).
  *
  * AQE's skew-join splits oversized partitions at runtime, which covers moderate
  * skew; explicit salting is the remedy when a single hot key exceeds what one
  * reducer can hold. The fact side gets a deterministic per-row salt in
  * [0, nSalts); the dimension side is replicated once per salt; joining on
  * (key, salt) spreads each hot key over nSalts reducers. Exact join semantics are
  * preserved: every (fact row, dim row) pair appears exactly once, because a fact
  * row carries one salt and the dim row's replica for that salt is unique.
  *
  * Replication cost is nSalts × |dim| — use only when dim is the small side
  * (the same precondition as broadcasting; salting applies when the dim is too big
  * to broadcast but the fact's key histogram is spiked).
  *
  * POSTURE (measured adjudication, PLANS.md "AQE-vs-manual-salting"): AQE's
  * runtime skew split beat this operator 0.71 s vs 1.18 s on an extreme-skew
  * probe, so AQE is the BATCH default and no batch query may route through
  * here except the demo `join_skew_salted`. PlanLint machine-enforces that
  * (saltViolations: any plan carrying [[graft.tools.PlanLint.SaltColName]]
  * outside the allowlist fails the gate). The operator's remaining production
  * use is Structured Streaming stream-stream/stream-static joins, where AQE
  * does not re-plan micro-batches and a hot key has no runtime remedy. */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Inner or left equi-join of `fact` to `dim` on `key`, salted `nSalts` ways.
    *
    * Salt = DETERMINISTIC hash of the fact row — recomputing a lost map partition
    * after a fetch failure reproduces the same salts, so the operator never depends
    * on indeterminate-stage rollback (a nondeterministic salt like rand() or
    * monotonically_increasing_id() forces Spark to roll back or abort whole stages
    * on retry; at 1000 executors fetch failures are routine, not exceptional).
    *
    * By default the salt hashes all fact columns; rows that are EXACT duplicates
    * share a salt (they co-locate, spreading bounded by the duplicate count). When
    * the hot key's rows are near-identical, pass `saltOn` — any expression unique
    * per source row (a source row id, file+offset) — for uniform spreading. */
  def salted(fact: DataFrame, dim: DataFrame, key: String, nSalts: Int,
      joinType: String = "inner", saltOn: Option[Column] = None): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val saltBasis = saltOn.getOrElse(
      struct(fact.columns.map(col).toIndexedSeq: _*))
    val saltedFact = fact.withColumn(SaltCol,
      pmod(xxhash64(saltBasis), lit(nSalts)).cast("int"))
    val replicatedDim = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(replicatedDim, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
