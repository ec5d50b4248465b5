package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join rewritten as a bucketed equi-join.
  *
  * Spark plans a raw `p BETWEEN s AND e` theta join as
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a broadcast
  * requirement. This operator rewrites it: both sides map to
  * fixed-width time buckets (intervals explode into every bucket they
  * overlap), the join becomes an equi-join on (key…, bucket) — shuffled
  * hash/sort-merge, no broadcast, no cross product — and the exact
  * BETWEEN predicate filters the bucket-collision candidates.
  *
  * Cost model: candidates = Σ per bucket |L_b|·|R_b| instead of
  * |L|·|R|; interval explosion multiplies R by avg(interval/width)+1.
  * Pick `bucketWidth` near the median interval length. This is the
  * composition-first rung of the custom-operator ladder — the plan is
  * entirely built-in operators, so AQE, codegen, and skew handling all
  * still apply.
  */
object IntervalJoin {

  /** Join rows of `points` to rows of `intervals` where
    * `points(pointCol)` (epoch seconds) falls in
    * `[intervals(startCol), intervals(endCol)]` (epoch seconds),
    * matching additionally on equal `keyCols` (present in both sides).
    */
  def join(points: DataFrame, intervals: DataFrame,
           pointCol: String, startCol: String, endCol: String,
           keyCols: Seq[String], bucketWidthSec: Long): DataFrame = {
    val w = bucketWidthSec
    val pts = points.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / w).cast("long"),
        floor(col(endCol) / w).cast("long"))))
    pts.join(ivs, keyCols :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
