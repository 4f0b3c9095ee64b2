package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation maintenance: persistable per-bucket PARTIAL
  * aggregate state plus an exact merge — the pattern behind every
  * "aggregate 100 TB once, then fold in each new day" pipeline. Instead of
  * re-scanning history, each ingest bucket (day, hour, file batch) is
  * collapsed once to mergeable state, and the rollup only ever touches
  * state rows (keys × buckets — millions, not the raw trillions).
  *
  * The state carries only aggregates that merge EXACTLY: count, sum,
  * min, max, non-null count, and an optional HLL sketch for mergeable
  * distinct counts (Spark's DataSketches `hll_sketch_agg`, whose union is
  * register-wise max — merging bucket sketches is bit-identical to
  * sketching the union). Averages and variances derive from (n, sum) at
  * read time; they are never stored, so no partial is ever "averaged
  * twice". Sums run on a caller-scaled integer column for cross-engine
  * bit-exactness, the repo-wide fixed-point convention.
  */
object Incremental {

  private val stateCols =
    Seq("n_rows", "n_vals", "sum_scaled", "min_scaled", "max_scaled")

  /** Collapse raw rows to one state row per (keys, bucketCol). ONE
    * map-side-combining hash aggregation — at 100 TB each executor emits
    * one row per local (key, bucket) before the shuffle. `scaledValueCol`
    * must already be integer fixed-point (e.g. `floor(v * 100)`).
    */
  def partialStats(
      df: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      scaledValueCol: String,
      withSketch: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val all = keys :+ bucketCol :+ scaledValueCol
    require(all.forall(df.columns.contains),
      s"missing columns: ${all.filterNot(df.columns.contains).mkString(", ")}")
    val v = col(scaledValueCol)
    val base = Seq(
      count(lit(1)).as("n_rows"),
      count(v).as("n_vals"),
      sum(v).as("sum_scaled"),
      min(v).as("min_scaled"),
      max(v).as("max_scaled"))
    val aggs = if (withSketch) base :+ hll_sketch_agg(v).as("hll_state") else base
    df.groupBy((keys :+ bucketCol).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fold state rows (any number of buckets, from any number of
    * [[partialStats]] runs) into the rollup per `keys`. Pure state-space
    * aggregation: cost ∝ state rows. Works on a union of persisted
    * partials — the incremental path is `mergeStats(old_state ∪ new_day)`.
    */
  def mergeStats(partials: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(stateCols.forall(partials.columns.contains),
      s"not a partialStats frame; need ${stateCols.mkString(", ")}")
    val withSketch = partials.columns.contains("hll_state")
    val base = Seq(
      sum(col("n_rows")).as("n_rows"),
      sum(col("n_vals")).as("n_vals"),
      sum(col("sum_scaled")).as("sum_scaled"),
      min(col("min_scaled")).as("min_scaled"),
      max(col("max_scaled")).as("max_scaled"))
    val aggs =
      if (withSketch)
        base :+ hll_sketch_estimate(hll_union_agg(col("hll_state"))).as("approx_distinct")
      else base
    partials.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
