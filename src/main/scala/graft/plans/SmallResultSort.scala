package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Repartition, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Root-sort optimization for report-sized results, enabled with
  * `spark.graft.smallResultSort=true` (default off).
  *
  * A global `orderBy` plans as a range-partitioned exchange, and range
  * partitioning runs a SEPARATE sampling job over the child to pick the
  * range bounds — for a query whose final output is report-sized (top-k
  * lists, grouped aggregates, oracle dumps), that sampling job is pure
  * fixed cost: ~0.15 s per query on this harness, regardless of data
  * size. This rule rewrites the ROOT global sort (the presentation /
  * determinism ordering) into a single-partition shuffle + local sort:
  * identical rows, identical total order, one job instead of two, while
  * everything BELOW the final shuffle keeps its full parallelism.
  *
  * Root-only by design: ORDER BY feeding a limit (top-k) already plans as
  * TakeOrderedAndProject, and interior sorts (window/aggregation inputs)
  * carry real data volumes where range partitioning is the correct
  * scale-out strategy. The flag is owned by the caller because only the
  * caller knows the result is report-sized — the engine's Verify/Bench
  * harnesses set it; a pipeline exporting a corpus-sized ordered dataset
  * must leave it off.
  */
case class SmallResultSort() extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.smallResultSort", "false") == "true"

  private def onePartitionSort(s: Sort): Sort =
    Sort(s.order, global = false, Repartition(1, shuffle = true, s.child))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan match {
      case s: Sort if s.global => onePartitionSort(s)
      // column pruning may have floated a Project above the root sort
      case p @ Project(_, s: Sort) if s.global =>
        p.copy(child = onePartitionSort(s))
      case _ => plan
    }
}
