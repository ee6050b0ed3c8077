package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Aggregate-shaped top-k (SURVEY §4): per-group top-k WITHOUT a
  * per-group sort.
  *
  * Catalyst's `CollectTopK` aggregate keeps a bounded k-heap per
  * group inside each map task (partial aggregation), so the shuffle
  * carries at most k rows per (task, group) and no sort ever sees
  * more than k elements. Spark 4's `InferWindowGroupLimit` already
  * prunes the `row_number() OVER … <= k` window form map-side too —
  * the aggregate shape still drops the per-group sort machinery and
  * the full-row shuffle of the surviving k·tasks rows per group, and
  * it exposes top-k as a reusable aggregate (`collect_topk` in SQL)
  * instead of a window + filter idiom the optimizer must recognize.
  */
object AggExpressions {

  /** The raw aggregate: array of the k extreme elements of `item`
    * under the struct's lexicographic field ordering (largest when
    * `largestFirst`). Element order within the array is NOT defined —
    * normalize downstream (see [[topKPerKey]]).
    */
  def collectTopK(item: Column, k: Int, largestFirst: Boolean): Column =
    Bridge.column(
      Bridge.collectTopK(Bridge.expression(item), k, !largestFirst))

  /** The k smallest DISTINCT longs of `item` per group, ascending —
    * the KMV/theta sketch state as one aggregate (dedup folded into
    * the bounded heap, see [[BottomKLongsDistinct]]): one exchange of
    * ≤k longs per (task, group) instead of distinct + heap.
    */
  def bottomKLongsDistinct(item: Column, k: Int): Column =
    Bridge.column(
      BottomKLongsDistinct(Bridge.expression(item), k)
        .toAggregateExpression())

  /** knn-shaped top-k: per `key`, the k rows with the LARGEST
    * `orderCol`, ties to the SMALLEST `tieCol` — identical rows to
    * `row_number() OVER (PARTITION BY key ORDER BY orderCol DESC,
    * tieCol ASC) <= k`, including the emitted `rank`.
    *
    * The tie column rides the comparison struct negated, so one
    * `largestFirst` heap realizes the mixed DESC/ASC order; `payload`
    * columns ride behind the tie field (they only break ties between
    * bit-identical (orderCol, tieCol) pairs — impossible for distinct
    * rows keyed by tieCol).
    */
  def topKPerKey(scored: DataFrame, key: String, orderCol: String,
      tieCol: String, payload: Seq[String], k: Int): DataFrame = {
    val item = struct(
      col(orderCol) +: (-col(tieCol)).as("_negtie") +: payload.map(col): _*)
    scored.groupBy(key)
      .agg(collectTopK(item, k, largestFirst = true).as("_top"))
      .select(col(key),
        posexplode(sort_array(col("_top"), asc = false)))
      .select(
        col(key) +: (col("pos") + 1).as("rank") +:
          (-col("col._negtie")).as(tieCol) +: col(s"col.$orderCol") +:
          payload.map(p => col(s"col.$p")): _*)
  }
}
