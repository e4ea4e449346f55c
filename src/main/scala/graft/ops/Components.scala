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
  * direct neighbors; after round R every node within graph distance R
  * of its component's minimum carries that minimum. Two drivers:
  *
  *  - [[minLabelFixpoint]] — the PRODUCTION path: iterates until a
  *    round changes zero labels (one cheap count on the already-cached
  *    round frame), so chain-shaped dup graphs of ANY diameter get
  *    correct clusters; a generous round cap turns a pathological graph
  *    into a loud error instead of a silent mislabel. q94 and ScaleCheck
  *    run this path (via [[clustersWithSize]]'s default).
  *  - [[minLabelRounds]] — the declared-round twin the DuckDB oracle
  *    unrolls verbatim. CurationSpec asserts fixpoint == unrolled-3 on
  *    the corpus (so the 3-round oracle SQL stays a valid gate for the
  *    fixpoint production path) and that the fixpoint resolves a
  *    diameter-5 chain that 3 rounds provably cannot.
  *
  * Scale shape: each round is one shuffle of the (symmetrised) edge list
  * joined to the current labels plus a min-aggregation — all
  * hash-partitioned by node id, nothing driver-side, edges never
  * materialise beyond the verified pair set. Rounds needed = component
  * diameter; near-dup graphs are unions of near-cliques (diameter 1–3),
  * so the fixpoint loop typically runs 2–4 rounds. For adversarial
  * long-chain graphs the classic large-star/small-star contraction
  * (O(log d) rounds) is the next step; the fixpoint loop stays correct
  * there, just linear in diameter.
  */
object Components {

  /** Hard cap for [[minLabelFixpoint]]: far above any plausible near-dup
    * graph diameter, low enough that a buggy upstream edge feed fails in
    * minutes, not days.
    */
  val MaxFixpointRounds = 64

  /** One propagation round. Returns a PERSISTED, materialised frame with
    * columns (id, __old, cluster) where __old is the incoming label —
    * kept so the caller can count changes without a second join. Labels
    * only ever decrease, so changed == (cluster < __old).
    */
  private def round1(sym: DataFrame, labels: DataFrame): DataFrame = {
    val nbMin = sym
      .join(labels.select(col("id").as("b"), col("cluster").as("__nb")), Seq("b"))
      .groupBy(col("a").as("id"))
      .agg(min(col("__nb")).as("__nbmin"))
    val next = labels.join(nbMin, Seq("id"), "left")
      .select(col("id"), col("cluster").as("__old"),
        least(col("cluster"), coalesce(col("__nbmin"), col("cluster")))
          .as("cluster"))
      .persist()
    next.count(): Unit
    next
  }

  /** Symmetrised, persisted, materialised edge list. The edges are
    * referenced once per round — without a persist the (possibly
    * expensive) upstream pair pipeline executes once per round.
    * Iterative graph algorithms cache their edges (GraphX does the same).
    */
  private def symEdges(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .persist()
    sym.count(): Unit
    sym
  }

  /** Re-cache the final round as a plain (id, cluster) frame and drop
    * the 3-col round cache, so the frame handed to the caller IS the
    * persisted one — `Dataset.unpersist` only drops a cache whose plan
    * sameResult-matches the dataset itself, so returning a projection
    * *over* the cache would make [[release]] a silent no-op (the r7
    * regression). The extra pass is a scan of the small cached labels,
    * not a recompute.
    */
  private def finalizeLabels(lastRound: DataFrame): DataFrame = {
    val out = lastRound.select(col("id"), col("cluster")).persist()
    out.count(): Unit
    lastRound.unpersist(): Unit
    out
  }

  /** `edges` must have columns (`a`, `b`) with one row per undirected
    * edge (either orientation); `nodes` one row per node id in column
    * `id`. Returns (id, cluster) where cluster = min node id within
    * `rounds` hops along edges — the declared-round oracle twin; use
    * [[minLabelFixpoint]] when the answer must be the true components.
    *
    * Cache ownership: each invocation is self-contained. The edge list
    * and every intermediate round are persisted only while the loop
    * runs and unpersisted before returning; the RETURNED frame is
    * itself the sole surviving cache entry (one (id, cluster) row per
    * node — small), owned by the caller. Call [[release]] on exactly
    * the returned frame when done; OpsSpec asserts the CacheManager is
    * empty afterwards. Concurrent invocations do not interact.
    */
  def minLabelRounds(edges: DataFrame, nodes: DataFrame,
                     rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sym = symEdges(edges)
    // Each round references the previous labels frame TWICE (neighbor
    // lookup + self), so an unpersisted chain re-executes round k
    // 2^(rounds-k) times. Persist per round, materialise, drop the
    // previous round — the standard iterative-dataflow shape.
    var labels = nodes.select(col("id"), col("id").as("cluster"))
    var prevRound: DataFrame = null
    for (_ <- 1 to rounds) {
      val next = round1(sym, labels)
      if (prevRound ne null) prevRound.unpersist(): Unit
      prevRound = next
      labels = next.select(col("id"), col("cluster"))
    }
    // The final labels are re-cached as the returned frame, so later
    // actions on it never re-read sym — safe to drop the edge cache now.
    sym.unpersist(): Unit
    finalizeLabels(prevRound)
  }

  /** True connected components: min-label propagation iterated until a
    * round changes ZERO labels. The convergence probe is one count on
    * the round frame that is already cached for the next iteration, so
    * detection costs no extra shuffle. Converges in (component diameter)
    * rounds; throws past `maxRounds` rather than returning a silently
    * under-merged clustering. Same cache ownership contract as
    * [[minLabelRounds]].
    */
  def minLabelFixpoint(edges: DataFrame, nodes: DataFrame,
                       maxRounds: Int = MaxFixpointRounds): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val sym = symEdges(edges)
    var labels = nodes.select(col("id"), col("id").as("cluster"))
    var prevRound: DataFrame = null
    var changed = 1L
    var r = 0
    while (changed > 0L) {
      r += 1
      if (r > maxRounds) {
        sym.unpersist(): Unit
        if (prevRound ne null) prevRound.unpersist(): Unit
        throw new IllegalStateException(
          s"component labels still changing after $maxRounds rounds — " +
            "graph diameter exceeds the cap; raise maxRounds or switch " +
            "to star-contraction")
      }
      val next = round1(sym, labels)
      changed = next.filter(col("cluster") < col("__old")).count()
      if (prevRound ne null) prevRound.unpersist(): Unit
      prevRound = next
      labels = next.select(col("id"), col("cluster"))
    }
    sym.unpersist(): Unit
    finalizeLabels(prevRound)
  }

  /** Drop the cache backing a frame returned by [[minLabelRounds]] /
    * [[minLabelFixpoint]] / [[clustersWithSize]] once the caller is done
    * with it. Must be called on EXACTLY the returned frame (unpersist
    * matches the dataset's own plan); derived projections won't release.
    */
  def release(labels: DataFrame): Unit = labels.unpersist(): Unit

  /** Labels plus the per-cluster size — the summary a dedup report
    * ships (every member knows its cluster and how many docs it
    * collapses with). `rounds` > 0 pins the declared-round twin (oracle
    * unrolling); `rounds` <= 0 (default) runs [[minLabelFixpoint]], the
    * production path. Same cache ownership contract: the returned frame
    * is the one persisted entry (the inner labels cache is released
    * before returning); callers hand it to [[release]] when done.
    */
  def clustersWithSize(edges: DataFrame, nodes: DataFrame,
                       rounds: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels =
      if (rounds > 0) minLabelRounds(edges, nodes, rounds)
      else minLabelFixpoint(edges, nodes)
    val out = labels.withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .persist()
    out.count(): Unit
    release(labels)
    out
  }
}
