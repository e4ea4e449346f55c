package graft

import graft.tools.BoundedCheck

/** The four bounded-oracle queries (q23/q122/q123/q135) are gated by
  * error bounds, not DuckDB hashes; this spec runs the SAME measurements
  * the committed BOUNDED.json artifact is generated from, so the
  * artifact's logic is spec-enforced and cannot drift from what the
  * suite asserts. (The richer per-query invariants — order-statistic
  * membership, monotonicity detail — stay in PlanSpec / PipelineOpsSpec
  * / BehaviorOpsSpec / ExportOpsSpec.)
  */
class BoundedCheckSpec extends SparkSpec {

  test("all bounded-oracle verdicts pass (the BOUNDED.json measurements)") {
    val bounds = BoundedCheck.all(spark, sfDir)
    assert(bounds.map(_.query).distinct.sorted == Seq(
      "q122_approx_profile", "q123_approx_bands",
      "q135_sketch_rollup", "q23_approx_distinct"))
    val failed = bounds.filterNot(_.pass)
    assert(failed.isEmpty, s"bounded checks failed: $failed")
  }

  test("BOUNDED.json serialization is well-formed and round-trips the verdicts") {
    val bounds = Seq(
      BoundedCheck.Bound("qX", "err", 0.013, 0.05),
      BoundedCheck.Bound("qY", "flag", 1.0, 0.0))
    val json = BoundedCheck.toJson("/tmp/sf", bounds)
    assert(json.contains(""""all_pass": false"""))
    assert(json.contains(""""qX":{"pass":true"""))
    assert(json.contains(""""qY":{"pass":false"""))
    assert(json.contains(""""measured":0.013000,"bound":0.050000,"pass":true"""))
  }
}
