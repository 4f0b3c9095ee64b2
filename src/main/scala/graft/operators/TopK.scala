package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.AggExpressions

/** Per-group top-k selection WITHOUT a window sort.
  *
  * The textbook formulation — `row_number() OVER (PARTITION BY keys ORDER
  * BY ord DESC, id) <= k` — shuffles every row to its key's partition and
  * sorts the entire group to keep k of them. With few hot keys (the usual
  * "top documents per source / per language" shape) that is a full-corpus
  * sort into a handful of reducers: the group sizes follow the corpus, not
  * k, and at 100 TB the hot key's sort spills alone.
  *
  * [[groupTopK]] instead aggregates with [[graft.functions.LongTopK]], a
  * bounded k-entry heap with map-side partial aggregation: each map task
  * reduces its slice of a group to <= k entries before the exchange, the
  * final aggregation merges heaps, and nothing larger than k is ever
  * sorted. Shuffle volume drops from |rows| to <= k·|maps|·|keys|, and the
  * plan is ObjectHashAggregate → exchange → ObjectHashAggregate — no Sort
  * node at all (PlanSpec pins this).
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
}
