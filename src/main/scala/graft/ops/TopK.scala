package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k-per-group — SURVEY.md §2B.5 Q32.
  *
  * row_number over a per-group window + filter. Catalyst rewrites the
  * rank-filter into a `WindowGroupLimit` (per-partition group-limit push-
  * down before the shuffle), so the shuffle carries at most k rows per
  * group per input partition — the correct shape at 100 TB.
  */
object TopK {

  /** Keep the top `k` rows per group. `order` must be a total order within
    * a group (include a unique tie-break key) or results are
    * nondeterministic.
    */
  def perGroup(df: DataFrame, k: Int, partition: Seq[Column],
               order: Seq[Column], rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
