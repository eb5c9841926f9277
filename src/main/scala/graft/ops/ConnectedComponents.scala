package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the clustering step that turns
  * near-duplicate PAIRS (minhash/LSH, shared-shingle, simhash candidates) into duplicate
  * CLUSTERS so a pipeline can keep one canonical document per cluster. The reference has
  * no graph operator (its surface is orchestration: /root/reference/xetl/models/job.py);
  * this is part of the LLM-pipeline extension surface.
  *
  * Algorithm: min-label propagation with pointer jumping. Each round does
  *   (1) propagate — every vertex takes the min label over itself and its neighbors
  *       (an equi-join edges⋈labels + groupBy-min: two hash shuffles on vertex id);
  *   (2) pointer-jump — every vertex re-reads the label OF its current label
  *       (labels⋈labels on label=v), composing hops so reachable distance grows
  *       exponentially (≥ 2^rounds − 1), not linearly.
  * `rounds` = 6 therefore converges for any component of diameter ≤ 63 — far beyond
  * real near-dup clusters (dup clusters are dense and shallow). Every stage is an
  * equi-join or keyed aggregation: hash-partitioned, no cartesian, no driver
  * materialization, so the same plan shards across a 100 TB corpus. Each round
  * `localCheckpoint`s the label frame: the loop references `labels` twice per round,
  * so an un-truncated lineage would double the logical plan every round (4^rounds
  * analysis blow-up); checkpointing keeps the per-round plan constant-size — the same
  * reason production iterative-graph jobs checkpoint. This makes `run` eager (it
  * executes the rounds when called), which is inherent to iterative algorithms.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges (`src`, `dst`)
    * @return (v, component) — component = min vertex id reachable from v;
    *         only vertices that appear in `edges` are returned (join back to the
    *         full entity table and coalesce to the own id for singleton semantics)
    */
  def run(edges: DataFrame, rounds: Int = 6): DataFrame = {
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint() // referenced every round — compute the edge pipeline once
    val init = sym.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    // Convergence early-exit (round 15 optimization, FixpointLoop doc): labels
    // are monotone non-increasing per vertex and the vertex set is fixed, so
    // an unchanged (count, exact decimal sum) signature means the label frame
    // is IDENTICAL to the previous round's — every later round reproduces it,
    // and the result is bit-identical to always running `rounds` rounds. Real
    // dup-cluster / nation graphs converge in 1-2 rounds; the fixed 6 covered
    // diameter ≤ 63 and burned 4-5 rounds of shuffles + checkpoint barriers
    // doing nothing.
    val labels = FixpointLoop.iterate(init, rounds,
      Seq(count(lit(1)), sum(col("label").cast("decimal(38,0)")))) { prev =>
      val nmin = sym.join(prev.select(col("v").as("bv"), col("label")),
          col("b") === col("bv"))
        .groupBy(col("a").as("nv")).agg(min("label").as("nmin"))
      val propagated = prev.join(nmin, col("v") === col("nv"), "left")
        .select(col("v"), least(col("label"), coalesce(col("nmin"), col("label")))
          .as("label"))
      val jump = propagated.select(col("v").as("jv"), col("label").as("jlabel"))
      propagated.join(jump, col("label") === col("jv"), "left")
        .select(col("v"), coalesce(col("jlabel"), col("label")).as("label"))
        .localCheckpoint() // truncate lineage: constant-size plan per round
    }
    labels.select(col("v"), col("label").as("component"))
  }
}
