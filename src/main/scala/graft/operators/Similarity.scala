package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via position-explode +
  *    join + aggregate, with components quantized to fixed-point longs so
  *    dot products and norms are EXACT integer sums — bit-deterministic
  *    regardless of partitioning/summation order (floating-point sums are
  *    order-dependent). This is the correctness baseline and is fine
  *    whenever |queries| × |corpus| pairs fit a shuffle.
  *  - [[lshBucketedTopK]] — the scale path: random-hyperplane LSH signs
  *    bucket the corpus, so each query only scores its own bucket(s).
  *    Sub-linear per query; recall governed by number of planes/tables.
  *
  * An IVF-style variant is the same shape with learned centroids instead
  * of random planes — plug a centroid table into the bucket column.
  */
object Similarity {

  /** Fixed-point quantization scale for exact integer dot products: float
    * components are ~O(0.1), so ×1e8 keeps full float precision while
    * 64-dim dots stay far below Long.Max (64 · (1e8)² ≈ 6.4e17).
    */
  private val Q = 1e8

  /** Positional explode of an embedding column, quantized:
    * (id, pos, qv = round(v·1e8) as long). Integer quantization makes every
    * downstream sum EXACT and hence independent of partitioning/summation
    * order AND of engine-specific decimal rounding — bit-identical scores
    * everywhere, at the cost of ~1e-8 relative quantization error.
    */
  private def exploded(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("id"), posexplode(col(embCol)))
      .select(col("id"), col("pos"),
        round(col("col").cast("double") * lit(Q)).cast("long").as("qv"))

  /** Σ qv² per id — exact long arithmetic. */
  private def norms(e: DataFrame): DataFrame =
    e.groupBy("id").agg(sum(col("qv") * col("qv")).as("n2"))

  /** Exact cosine top-k: for every query row (`queryPred`), the `k` nearest
    * corpus rows (`!queryPred`) by cosine similarity, ties broken by id.
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val e = exploded(df, idCol, embCol)
    val n = norms(e)
    val q = df.filter(queryPred)
    val c = df.filter(!queryPred)
    val eq = exploded(q, idCol, embCol).withColumnRenamed("id", "query_id")
    val ec = exploded(c, idCol, embCol).withColumnRenamed("id", "cand_id")
    val dots = eq.join(ec, "pos")
      .groupBy("query_id", "cand_id")
      .agg(sum(eq("qv") * ec("qv")).as("dot"))
    val scored = dots
      .join(n.select(col("id").as("query_id"), col("n2").as("nq")), "query_id")
      .join(n.select(col("id").as("cand_id"), col("n2").as("nc")), "cand_id")
      .withColumn(
        "cosine",
        col("dot").cast("double") /
          (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
    scored
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rn") <= k)
      .select("query_id", "cand_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, pos):
    * a fixed integer hash mapped to ±1-ish weights — no RNG, identical
    * plan on every executor.
    */
  private def planeWeight(plane: Int, pos: Column): Column = {
    val h = xxhash64(lit(plane), pos)
    when(h % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Random-hyperplane LSH bucket id: the sign bits of `numPlanes` random
    * projections packed into a long. Narrow projection — no shuffle.
    */
  def lshBuckets(df: DataFrame, idCol: String, embCol: String, numPlanes: Int = 6): DataFrame = {
    val e = exploded(df, idCol, embCol)
    val projections = (0 until numPlanes).map(p =>
      sum(col("qv").cast("double") * planeWeight(p, col("pos"))).as(s"p$p"))
    e.groupBy("id")
      .agg(projections.head, projections.tail: _*)
      .select(
        col("id"),
        (0 until numPlanes)
          .map(p => when(col(s"p$p") >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b))
          .as("bucket"))
  }

  /** LSH-bucketed ANN top-k: score only candidates sharing the query's
    * bucket. Same scoring math as [[bruteForceTopK]]; the bucket equi-join
    * replaces the all-pairs position join, so the shuffle volume is
    * Σ bucket² instead of |Q|×|C|.
    */
  def lshBucketedTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      numPlanes: Int = 6): DataFrame = {
    // Alias the buckets frame's id before joining: a bare .drop("id") would
    // also drop the caller's id column whenever idCol is literally "id".
    val buckets = lshBuckets(df, idCol, embCol, numPlanes)
      .withColumnRenamed("id", "__bucket_id")
    val withBucket = df.join(buckets, df(idCol) === col("__bucket_id"))
      .drop("__bucket_id")
    val q = withBucket.filter(queryPred)
      .select(col(idCol).as("query_id"), col("bucket"), col(embCol).as("qe"))
    val c = withBucket.filter(!queryPred)
      .select(col(idCol).as("cand_id"), col("bucket"), col(embCol).as("ce"))
    val pairs = q.join(c, "bucket")
    val scored = pairs.withColumn(
      "cosine",
      cosineExpr(col("qe"), col("ce")))
    scored
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rn") <= k)
      .select("query_id", "cand_id", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs within blocks: all pairs of rows
    * sharing `blockCol` (a cluster id, LSH bucket, shard key …) whose cosine
    * similarity meets `threshold`. Norms ride along each exploded component
    * as per-row expressions — computing Σqv² with an in-row `aggregate`
    * over the materialized quantized array costs NO shuffle, so the whole
    * operator is one equi-join on (position, block) plus one aggregation.
    * For an unblocked corpus, feed `lshBuckets` output as the block column.
    */
  def embeddingNearDuplicates(
      df: DataFrame,
      idCol: String,
      embCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val e = df
      .select(
        col(idCol).as("id"), col(blockCol).as("blk"),
        transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")).as("qa"))
      .withColumn("n2", aggregate(col("qa"), lit(0L), (acc, x) => acc + x * x))
      .select(col("id"), col("blk"), col("n2"), posexplode(col("qa")))
      .withColumnRenamed("col", "qv")
    e.as("a")
      .join(e.as("b"),
        col("a.pos") === col("b.pos") && col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(
        sum(col("a.qv") * col("b.qv")).as("dot"),
        min(col("a.n2")).as("na"), min(col("b.n2")).as("nb"))
      .withColumn(
        "cosine",
        col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** In-row cosine via higher-order array functions (zip_with + aggregate).
    * Float-order-deterministic because the fold is sequential within the
    * row — no partitioning dependence. Used on pre-joined pairs.
    */
  def cosineExpr(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")), lit(0.0), _ + _)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
