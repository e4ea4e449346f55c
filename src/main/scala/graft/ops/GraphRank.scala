package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-scaled PageRank over an undirected graph — the graph-centrality
  * scorer a corpus-curation pipeline runs over its similarity/link graph to
  * pick cluster representatives or weight sources (web-graph PageRank is a
  * standard pretraining-data quality signal).
  *
  * Determinism contract: ranks are carried as BIGINT in units of 1e-9
  * (`Scale`), every per-edge share is an integer floor-division of the
  * source rank by its degree, and the damping update is
  * `base + (s div 100) * 85 + ((s % 100) * 85) div 100` for `s = sum of
  * in-shares` — algebraically identical to `(85 * s) div 100` for
  * non-negative `s`, but the largest intermediate is `85 * (s div 100)`,
  * so it cannot overflow i64 until total graph mass approaches
  * ~1.1e19/85 ≈ 1.3e17 rank units (~1.3e8 nodes' worth of mass landing
  * on ONE node) — two orders of magnitude beyond the naive form's bound,
  * and past the point where the Scale carrier itself would need
  * widening. All i64 operations, so the result is bit-identical no
  * matter what order a distributed sum reduces in.
  * That is what makes a DuckDB oracle possible at all: a double-valued
  * PageRank would differ in the last ulp between engines (and between two
  * Spark runs with different partition counts). Same trick as q101's BM25
  * fixed-order summation, applied to an iterative algorithm.
  *
  * Iteration discipline: identical to [[Components]] — every round is
  * persisted, materialised, and REBASED onto its computed RDD
  * ([[Components.mat]]) so the logical plan stays constant-size across
  * rounds; the previous round's cache is dropped as soon as the next is
  * materialised. Per round the work is one shuffle (the contribution
  * aggregation on `dst`); the degree and edge frames are computed once and
  * cached for all rounds.
  *
  * Cache ownership: the RETURNED frame is the sole surviving cache entry;
  * callers release it via [[Components.release]] (OpsSpec asserts the
  * CacheManager is empty afterwards).
  *
  * Reference analogue: the scoring/ranking stage of a partitioned ETL
  * model (`examples/example_etl.py` fans work out per partition and folds
  * a per-key score); the algorithm itself is public (Page et al. 1999).
  */
object GraphRank {

  /** Rank unit: 1.0 of probability mass == `Scale` in the i64 carrier. */
  val Scale: Long = 1000000000L

  /** Damping base: 0.15 * Scale, the teleport mass every node keeps. */
  val Base: Long = 150000000L

  /** `edges` must have columns (`a`, `b`), one row per undirected edge in
    * either orientation; self-loops and duplicate edges are dropped.
    * Nodes are taken to be exactly the endpoints of `edges` (a symmetric
    * similarity graph has no dangling nodes, so no dangling-mass
    * redistribution term is needed — isolated documents simply don't
    * participate, the same convention as the components ops).
    *
    * Returns (id, rank) with rank in `Scale` units after `rounds` full
    * damped updates from a uniform start of `Scale` per node.
    */
  def pagerank(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // Any mid-loop action failure releases every still-live intermediate
    // (same discipline as the Components drivers) — a long-lived job
    // server must not leak corpus-sized caches on a transient executor
    // loss.
    Components.withLive { lf =>
      // Canonicalise once (drop self-loops, dedup by unordered endpoint
      // pair), cache, THEN mirror — mirroring an uncached plan would run
      // the dedup shuffle twice, once per union branch.
      val canon = lf.mat(edges
        .select(col("a"), col("b")).filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct())
      val sym = lf.mat(canon.unionAll(
        canon.select(col("b").as("a"), col("a").as("b"))))
      lf.drop(canon)
      // Degree per node — one grouped count, cached for every round.
      val deg = lf.mat(
        sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg")))
      var ranks = lf.mat(
        deg.select(col("id"), lit(Scale).as("rank")))
      for (_ <- 1 to rounds) {
        // share(a) = rank(a) div deg(a): computed once per node, then
        // joined to the edge list — the join carries one slim (id, share)
        // row per node, not the full rank frame per edge.
        val share = ranks.join(deg, Seq("id"))
          .select(col("id").as("a"), expr("rank div deg").as("share"))
        val next = lf.mat(sym
          .join(share, Seq("a"))
          .groupBy(col("b").as("id"))
          .agg(sum(col("share")).as("s"))
          .select(col("id"),
            (lit(Base) +
              expr("(s div 100) * 85 + ((s % 100) * 85) div 100")).as("rank")))
        lf.drop(ranks)
        ranks = next
      }
      lf.drop(deg)
      lf.drop(sym)
      lf.handOff(ranks)
    }
  }
}
