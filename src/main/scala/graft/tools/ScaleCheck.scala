package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for the heaviest pipeline (n-gram near-dup candidates →
  * connected components): replicate the `documents` corpus k× with
  * re-keyed ids — which multiplies every near-dup cluster size by k and
  * therefore the PAIR OUTPUT by ~k² (the op's documented output
  * semantics: pairs are Ω(Σ cluster²)) — and report wall time per stage
  * plus output cardinalities as ONE JSON line.
  *
  * Purpose: evidence that the per-pair cost stays flat as the pair set
  * grows quadratically (the property that survives a 100 TB scale-up),
  * measured rather than asserted. Usage:
  *   ScaleCheck [k]   (default 2; SPARK_GRAFT_SF_DIR selects the corpus)
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.compactScans", "true")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.core.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    // Replica id offset derived from the corpus itself so re-keyed ids
    // can never collide with originals, whatever the input id range.
    val stride = docs.agg(max($"doc_id")).head.getLong(0) + 1L
    val big = (0 until k).map { i =>
      docs.select(($"doc_id" + lit(i.toLong * stride)).as("doc_id"), $"text")
    }.reduce(_ unionByName _)
    val nDocs = big.count()

    var t0 = System.nanoTime()
    val pairs = graft.ops.MinHashDedup.ngramJaccardPairs(
      big, "doc_id", "text", gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    val nPairs = pairs.count()
    val pairsSec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val labels = graft.ops.Components.clustersWithSize(
      pairs.select($"d1".as("a"), $"d2".as("b")),
      big.select($"doc_id".as("id")))
    val nLabeled = labels.count()
    val compSec = (System.nanoTime() - t0) / 1e9
    graft.ops.Components.release(labels)

    // q129's iterative-rank path over the same pair graph: 5 full damped
    // rounds (the q129 production setting). The claim under measurement is
    // one shuffle per round at constant plan size — rank_sec should grow
    // with EDGES (~k²) but stay round-linear, not lineage-exponential.
    t0 = System.nanoTime()
    val ranks = graft.ops.GraphRank.pagerank(
      pairs.select($"d1".as("a"), $"d2".as("b")), rounds = 5)
    val nRanked = ranks.count()
    val rankSec = (System.nanoTime() - t0) / 1e9
    graft.ops.Components.release(ranks)

    println(f"""{"k":$k,"n_docs":$nDocs,"n_pairs":$nPairs,"pairs_sec":$pairsSec%.2f,"us_per_pair":${pairsSec * 1e6 / math.max(1, nPairs)}%.3f,"n_labeled":$nLabeled,"components_sec":$compSec%.2f,"n_ranked":$nRanked,"rank5_sec":$rankSec%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
