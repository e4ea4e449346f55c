package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — SURVEY.md §2B.3 Q17, §4.3.
  *
  * Spark has no first-class ASOF JOIN, and the naive form (range join +
  * groupBy-max) is O(|L|·|R|) per key. This implements the scalable
  * union+window pattern instead:
  *
  *   1. tag right rows (side=0) and left rows (side=1), union them;
  *   2. shuffle ONCE by the join key, sort within each key by
  *      (time, side) — right rows with the same timestamp sort before left
  *      rows, giving `<=` (inclusive) semantics;
  *   3. running `last(value, ignoreNulls=true)` over the sorted stream
  *      carries each right value forward to all later left rows;
  *   4. keep only left rows.
  *
  * Cost: one shuffle + one sort of |L|+|R| — the same shape as a sort-merge
  * join, no row-pair blow-up, skew handled by AQE. This is the plan that
  * survives 100 TB.
  */
object AsOfJoin {

  /** For each left row, attach `last right `valueCol` at or before the left
    * row's time, per key; null when no prior right row exists.
    *
    * @param left     left (probe) side; must contain `key` and `leftTime`
    * @param right    right (reference) side; must contain `key`, `rightTime`
    *                 and `valueCol`
    * @param key      equi-join key column name (same name both sides)
    * @param leftTime event-time column name on `left`
    * @param rightTime event-time column name on `right`
    * @param valueCol right column carried to the left rows
    * @param outCol   name of the attached column in the result
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns
    val tagged =
      right.select(col(key), col(rightTime).as("__t"),
          col(valueCol).as("__v"), lit(0).as("__side"))
        .unionByName(
          left.select((Seq(col(key), col(leftTime).as("__t"),
            lit(null).cast(right.schema(valueCol).dataType).as("__v"),
            lit(1).as("__side")) ++
            leftCols.filterNot(_ == key).map(c => col(c).as(s"__l_$c"))): _*),
          allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(outCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(key) +: leftCols.filterNot(_ == key)
        .map(c => col(s"__l_$c").as(c)) :+ col(outCol): _*)
  }
}
