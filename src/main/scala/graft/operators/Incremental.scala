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

  /** Floor division on longs, both-engine exact: Spark `div` and DuckDB
    * `//` both TRUNCATE toward zero, which would give negatives a
    * double-width bin straddling 0 — so both sides compute
    * `(v − mod⁺(v, w)) div w` with the non-negative modulus instead
    * (DuckDB: `(v - ((v % w + w) % w)) // w`). `div` keeps the arithmetic
    * in exact longs — a double division would silently round past 2⁵³.
    */
  private def floorDiv(v: org.apache.spark.sql.Column, w: Long) =
    call_function("div", v - pmod(v, lit(w)), lit(w))

  /** Mergeable QUANTILE state: fixed-width integer histogram bins — the
    * exact-merge alternative to a t-digest/KLL sketch. State rows are
    * `(keys, bucket, bin = ⌊v/binWidth⌋, n)`; merging buckets is plain
    * bin-count addition, so (unlike every float-centroid sketch) merge
    * order is irrelevant and partial-then-merge is BIT-IDENTICAL to
    * one-shot aggregation. Rank error is zero — the reported bin provably
    * contains the exact rank-`⌈q·N⌉` value — and VALUE resolution is
    * `binWidth` (choose it like a sketch accuracy knob: value_range /
    * binWidth bins of state per key×bucket).
    */
  def partialQuantiles(
      df: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      scaledValueCol: String,
      binWidth: Long): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    // resolve like col() does (exact name first, else case-insensitive) —
    // a bare df.schema(name) lookup is case-SENSITIVE and would reject
    // case-mismatched names the query itself resolves fine
    val vType = df.schema.fields.find(_.name == scaledValueCol)
      .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(scaledValueCol)))
      .getOrElse(throw new IllegalArgumentException(
        s"column '$scaledValueCol' not found in ${df.columns.mkString(", ")}"))
      .dataType
    val integral = vType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    require(integral,
      s"scaledValueCol '$scaledValueCol' must be integral fixed-point for exact bins, got $vType" +
        " — scale doubles onto an integer grid (e.g. cents) first")
    df.filter(col(scaledValueCol).isNotNull)
      .groupBy((keys :+ bucketCol).map(col) :+
        floorDiv(col(scaledValueCol), binWidth).as("bin"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Fold [[partialQuantiles]] state (any bucket mix) into per-`keys`
    * quantile bins: for each requested quantile q (in ppm, so thresholds
    * stay exact integers), the bin containing the rank-`⌈q·N/10⁶⌉` value,
    * reported as the CLOSED scaled-value range `[q_lo_scaled,
    * q_hi_scaled]`. Cost ∝ state rows: one bin-sum aggregation, one
    * per-key cumulative window over ≤ range/binWidth bins, and an in-row
    * quantile explode.
    */
  def mergeQuantiles(
      partials: DataFrame,
      keys: Seq[String],
      quantilesPpm: Seq[Long],
      binWidth: Long): DataFrame = {
    require(keys.nonEmpty && quantilesPpm.nonEmpty, "keys and quantiles must be non-empty")
    require(quantilesPpm.forall(q => q >= 0 && q <= 1000000),
      s"quantiles are ppm in [0, 1000000]: $quantilesPpm")
    require(Seq("bin", "n").forall(partials.columns.contains),
      s"not a partialQuantiles frame; need bin, n — has ${partials.columns.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val binned = partials
      .groupBy((keys :+ "bin").map(col): _*)
      .agg(sum(col("n")).as("n"))
    val kw = Window.partitionBy(keys.map(col): _*)
    val cum = binned
      .withColumn("__cum", sum(col("n")).over(kw.orderBy(col("bin"))))
      .withColumn("__total", sum(col("n")).over(kw))
    cum
      .select((keys.map(col) :+ col("bin") :+ col("n") :+ col("__cum") :+ col("__total")) :+
        explode(array(quantilesPpm.map(lit): _*)).as("q_ppm"): _*)
      // ceil(q·N/1e6) in exact LONG arithmetic (overflow-safe to ~9·10¹²
      // rows per key), clamped to rank ≥ 1 so q_ppm = 0 selects the MIN
      // bin instead of matching nothing; the containing bin is the first
      // whose cumulative count reaches the threshold
      .withColumn("__thresh",
        greatest(expr("(q_ppm * __total + 999999) div 1000000"), lit(1L)))
      .filter(col("__cum") >= col("__thresh") && col("__cum") - col("n") < col("__thresh"))
      .select(
        (keys.map(col) :+ col("q_ppm") :+
          (col("bin") * binWidth).as("q_lo_scaled") :+
          (col("bin") * binWidth + (binWidth - 1)).as("q_hi_scaled") :+
          col("__total").as("n_rows")): _*)
  }
}
