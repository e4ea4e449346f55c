package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a pair graph by iterated min-label
  * propagation — the transitive-closure step a near-dup dedup pipeline
  * runs AFTER candidate pairs are verified (q86-style), turning direct
  * pairs into whole duplicate CLUSTERS (q87's one-hop keeper is the
  * cheaper, weaker decision).
  *
  * Each round every node takes the minimum label among itself and its
  * direct neighbors; after `rounds` rounds every node within graph
  * distance `rounds` of its component's minimum carries that minimum.
  * Near-dup graphs are union-of-cliques-ish (diameter 1–2), so a small
  * fixed round count converges; the round count is part of the declared
  * contract so the oracle can unroll the identical computation, and
  * convergence is asserted in OpsSpec (round R output == round R+1).
  *
  * Scale shape: each round is one shuffle of the (symmetrised) edge list
  * joined to the current labels plus a min-aggregation — all
  * hash-partitioned by node id, nothing driver-side, edges never
  * materialise beyond the verified pair set. For graphs with long chains
  * (not the dedup shape) the classic fix is large-star/small-star
  * iteration; out of scope by contract.
  */
object Components {

  /** `edges` must have columns (`a`, `b`) with one row per undirected
    * edge (either orientation); `nodes` one row per node id in column
    * `id`. Returns (id, cluster) where cluster = min node id within
    * `rounds` hops along edges.
    *
    * Cache ownership: each invocation is self-contained. The edge list
    * and every intermediate round are persisted only while the loop
    * runs and unpersisted before returning; the FINAL labels frame is
    * returned fully materialised in its own cache (one (id, cluster)
    * row per node — small), owned by the caller. Call [[release]] when
    * done with the result. Concurrent invocations do not interact.
    */
  def minLabelRounds(edges: DataFrame, nodes: DataFrame,
                     rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // The edge list is referenced once per round in the loop below —
    // without a persist the (possibly expensive) upstream pair pipeline
    // executes `rounds` times. Iterative graph algorithms cache their
    // edges (GraphX does the same).
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .persist()
    sym.count(): Unit
    // Each round references the previous labels frame TWICE (neighbor
    // lookup + self), so an unpersisted chain re-executes round k
    // 2^(rounds-k) times. Persist per round, materialise, drop the
    // previous round — the standard iterative-dataflow shape.
    var labels = nodes.select(col("id"), col("id").as("cluster"))
    var prevRound: DataFrame = null
    for (_ <- 1 to rounds) {
      val nbMin = sym
        .join(labels.select(col("id").as("b"), col("cluster").as("__nb")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("__nb")).as("__nbmin"))
      val next = labels.join(nbMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("__nbmin"), col("cluster")))
            .as("cluster"))
        .persist()
      next.count(): Unit
      if (prevRound ne null) prevRound.unpersist(): Unit
      prevRound = next
      labels = next
    }
    // The final frame is materialised in its own cache, so later actions
    // on it never re-read sym — safe to drop the edge cache now.
    sym.unpersist(): Unit
    labels
  }

  /** Drop the cache backing a frame returned by [[minLabelRounds]] /
    * [[clustersWithSize]] once the caller is done with it.
    */
  def release(labels: DataFrame): Unit = labels.unpersist(): Unit

  /** [[minLabelRounds]] plus the per-cluster size — the summary a dedup
    * report ships (every member knows its cluster and how many docs it
    * collapses with).
    */
  def clustersWithSize(edges: DataFrame, nodes: DataFrame,
                       rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = minLabelRounds(edges, nodes, rounds)
    labels.withColumn("cluster_size",
      count(lit(1)).over(Window.partitionBy(col("cluster"))))
  }
}
