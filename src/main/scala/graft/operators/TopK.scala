package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.AggExpressions

/** Per-group top-k selection WITHOUT a window sort.
  *
  * The textbook formulation — `row_number() OVER (PARTITION BY keys ORDER
  * BY ord DESC, id) <= k` — is no longer the catastrophe it was before
  * Spark 3.5: the optimizer plans a map-side `WindowGroupLimit (Partial)`,
  * so whole groups stop shipping to one reducer. But the group-limit scan
  * needs SORTED input, so the plan still fully sorts every map partition
  * (a corpus-wide O(n log n) local sort that spills on wide rows) and then
  * re-sorts the survivors after the exchange — and a window cannot share a
  * pass with ordinary aggregates, so "stats + top examples per source"
  * costs two jobs.
  *
  * [[groupTopK]] instead aggregates with [[graft.functions.LongTopK]], a
  * bounded k-entry heap with map-side partial aggregation: O(n log k) heap
  * updates, each map task reduces its slice of a group to <= k entries
  * before the exchange, the final aggregation merges heaps, and nothing
  * larger than k is ever sorted. The plan is ObjectHashAggregate →
  * exchange → ObjectHashAggregate with ZERO Sort nodes (PlanSpec pins
  * this), and because it is a plain aggregate it composes with sum/count/
  * sketches in the SAME groupBy — one scan, one shuffle. The trade: heap
  * state is per-group, so with millions of tiny groups the window's sorted
  * scan is competitive — this operator is for the group-count << row-count
  * shape ("top documents per source/language"), where the avoided sort
  * dominates (BENCH_skew.json: topk_window vs topk_heap_agg).
  *
  * Output: `(keys…, rank, ordCol, idCol)` with rank 1 = best, ordered by
  * `(ord DESC, id ASC)` — ties broken by id so the kept set is total and
  * the DuckDB row_number oracle replays it exactly. Rows with NULL ord or
  * id are skipped (they cannot rank).
  */
object TopK {

  def groupTopK(
      df: DataFrame,
      keys: Seq[String],
      ordCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(keys.map(col): _*)
      .agg(AggExpressions.longTopK(col(ordCol).cast("long"), col(idCol).cast("long"), k)
        .as("__top"))
      .select(keys.map(col) :+ posexplode(col("__top")): _*)
      .select(keys.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.ord").as(ordCol),
        col("col.id").as(idCol)): _*)
  }

  /** [[groupTopK]] carrying the FULL row of each winner, not just (ord,
    * id): the heap never ships payload columns — only (ord, id) pairs ride
    * the aggregation — and the winners (≤ k·|keys| rows, bounded by
    * construction) semi-join back against the corpus on (keys, id), which
    * AQE broadcasts. Two scans of the input, still zero Sort nodes, versus
    * the window's sort-everything-with-payload single pass — at wide-row
    * corpora shipping text through a sort costs more than a second scan.
    * `idCol` must identify rows uniquely within a group or the join
    * re-attaches all rows sharing the winning id.
    */
  def groupTopKRows(
      df: DataFrame,
      keys: Seq[String],
      ordCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val winners = groupTopK(df, keys, ordCol, idCol, k)
      .select(keys.map(col) ++ Seq(col("rank"), col(idCol)): _*)
    df.join(winners, keys :+ idCol)
  }
}
