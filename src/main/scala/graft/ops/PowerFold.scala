package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-round weighted power iteration over a BOUNDED edge set, folded into
  * ONE expression over a single collected row (round 15).
  *
  * The nation-graph iteration queries (pagerank / katz / personalized
  * pagerank) run K rounds of `join ranks + grouped decimal sum + left join
  * nodes` over an edge frame that is ≤ |nations|² rows AT ANY SCALE — the
  * corpus-sized work is the edge ROLLUP, not the iteration. As dataframe
  * rounds, each iteration costs 3 tiny exchanges plus scheduling latency
  * (the sf0.1 wall was ~80 % stage overhead); folded, the K rounds run as
  * one `aggregate(sequence(1, K), init, step)` whose accumulator is the
  * concrete rank array — a lambda-bound VALUE, so each round is evaluated
  * exactly once (chained withColumn spellings re-inline the previous round
  * into every lambda invocation via CollapseProject — exponential).
  *
  * Bit-equivalence to the join spelling: the per-edge contribution
  * cast(r[src]·frac AS DECIMAL(30,12)) is summed in decimal (associative,
  * order-free — same value as the grouped SUM in any order), cast to double;
  * a node with no in-edges folds over the empty set and yields the decimal
  * zero seed = 0.0, exactly the join spelling's coalesce(NULL, 0.0). */
object PowerFold {
  private val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
  // (37,12) accumulator: (37,12)+(30,12) promotes to exactly (38,12) — scale
  // PRESERVED, addition exact — and the cast back to (37,12) cannot overflow
  // at these magnitudes. A (38,12) accumulator would promote to precision 39,
  // which Spark resolves by REDUCING the scale to 11 — a per-step rounding
  // the grouped sum(decimal(30,12)) never performs (caught by the oracle at
  // sf0.01: pagerank diverged at the 11th decimal).
  private val DEC37 = org.apache.spark.sql.types.DataTypes.createDecimalType(37, 12)

  /** Rank array after `rounds` of
    *   r′(j) = alphas(j) + beta · cast(Σ_{e ∈ es, e.dst = nodes(j)}
    *             cast(r[idx(e.src)] · e.frac AS DECIMAL(30,12)) AS DOUBLE)
    * `es`: array<struct<src,dst,frac>>; `nodes`: the node array `init` and
    * `alphas` are parallel to; idx = position of e.src in `nodes`. */
  def ranks(es: Column, nodes: Column, init: Column, alphas: Column,
      beta: Double, rounds: Int): Column =
    aggregate(sequence(lit(1), lit(rounds)), init, (acc, _) =>
      zip_with(nodes, alphas, (n, al) =>
        al + lit(beta) * aggregate(
          filter(es, e => e("dst") === n),
          lit(0).cast(DEC37),
          (a2, e) => (a2 + (element_at(acc,
            array_position(nodes, e("src")).cast("int")) * e("frac"))
            .cast(DEC)).cast(DEC37)).cast("double")))

  /** The collected single-row edge frame: es = all (src, dst, frac) rows,
    * nodes = sorted distinct src ∪ dst derived INSIDE the row (no separate
    * union/distinct frame, no second consumer of ew, no checkpoint). */
  def edgeRow(ew: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ew.agg(collect_list(struct(col("src"), col("dst"), col("frac"))).as("es"))
      .withColumn("nodes", array_sort(array_distinct(concat(
        transform(col("es"), e => e("src")),
        transform(col("es"), e => e("dst"))))))
}
