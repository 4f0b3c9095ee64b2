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

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, pos):
    * xxhash64 parity — no RNG, identical plan on every executor; the fast
    * default. Long-valued so projections over quantized components stay
    * EXACT integer sums (bit-identical bucket signs everywhere).
    */
  def xxPlaneWeight(plane: Int, pos: Column): Column =
    when(xxhash64(lit(plane), pos) % 2 === 0, lit(1L)).otherwise(lit(-1L))

  /** Cross-engine-reproducible ±1 plane weight: parity of the first hex
    * digit of sha256("&lt;plane&gt;:&lt;pos&gt;"). Any engine with sha256 can
    * replicate the bucket assignment (DuckDB:
    * `CAST(concat('0x', substr(sha256(p || ':' || pos), 1, 1)) AS INT) % 2`),
    * which makes the whole LSH pipeline oracle-checkable. Slower than
    * [[xxPlaneWeight]] — use for validation, not the 100 TB hot path.
    */
  def shaPlaneWeight(plane: Int, pos: Column): Column =
    when(
      conv(substring(sha2(concat(lit(s"$plane:"), pos.cast("string")), 256), 1, 1), 16, 10)
        .cast("int") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))

  /** Multi-table random-hyperplane LSH: `numTables` independent tables of
    * `numPlanes` sign bits each → one (id, table, bucket) row per table.
    * All numTables·numPlanes projections come out of ONE aggregation pass
    * (a single shuffle on id); the per-table explode is narrow.
    *
    * Scale sizing: candidate cost per query ≈ numTables · E[bucket size]
    * = numTables · N / 2^numPlanes. The round-1 default (one table, 6
    * planes = 64 buckets total) went quadratic at any real N; 16 planes
    * gives 65 536 buckets per table and `numTables` independent probes
    * recover the recall a single sharper table loses.
    */
  def lshBuckets(
      df: DataFrame,
      idCol: String,
      embCol: String,
      numPlanes: Int = 16,
      numTables: Int = 8,
      weight: (Int, Column) => Column = xxPlaneWeight): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 62, s"numPlanes out of range: $numPlanes")
    val e = exploded(df, idCol, embCol)
    // qv is a quantized long and weight is ±1L, so every projection is an
    // exact integer sum — bucket signs are bit-deterministic regardless of
    // partitioning or summation order.
    val projections = (0 until numTables).flatMap(t =>
      (0 until numPlanes).map { p =>
        val g = t * numPlanes + p // global plane index
        sum(col("qv") * weight(g, col("pos"))).as(s"p$g")
      })
    val bucketOfTable = (t: Int) =>
      (0 until numPlanes)
        .map(p => when(col(s"p${t * numPlanes + p}") >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
    e.groupBy("id")
      .agg(projections.head, projections.tail: _*)
      .select(
        col("id"),
        posexplode(array((0 until numTables).map(bucketOfTable): _*)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
  }

  /** LSH-bucketed ANN top-k: score only candidates sharing any of the
    * query's `numTables` buckets. Scoring uses the same fixed-point-exact
    * math as [[bruteForceTopK]] but in-row (zip_with over the pre-quantized
    * arrays — no position explode, no extra shuffle); the (table, bucket)
    * equi-join replaces the all-pairs join, so shuffle volume is
    * Σ buckets² per table instead of |Q|×|C|.
    */
  def lshBucketedTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      numPlanes: Int = 16,
      numTables: Int = 8,
      weight: (Int, Column) => Column = xxPlaneWeight): DataFrame = {
    // Quantized array + norm ride per row (narrow projections).
    val base = df
      .withColumn("__qa", transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")))
      .withColumn("__n2", aggregate(col("__qa"), lit(0L), (acc, x) => acc + x * x))
    // Alias the buckets frame's id before joining: a bare .drop("id") would
    // also drop the caller's id column whenever idCol is literally "id".
    val buckets = lshBuckets(df, idCol, embCol, numPlanes, numTables, weight)
      .withColumnRenamed("id", "__bucket_id")
    val withBucket = base.join(buckets, col(idCol) === col("__bucket_id"))
      .drop("__bucket_id")
    val q = withBucket.filter(queryPred)
      .select(col(idCol).as("query_id"), col("table"), col("bucket"),
        col("__qa").as("qa"), col("__n2").as("qn"))
    val c = withBucket.filter(!queryPred)
      .select(col(idCol).as("cand_id"), col("table"), col("bucket"),
        col("__qa").as("ca"), col("__n2").as("cn"))
    val pairs = q.join(c, Seq("table", "bucket"))
      // a pair colliding in several tables must score once
      .dropDuplicates("query_id", "cand_id")
    val scored = pairs
      .withColumn("__dot", aggregate(zip_with(col("qa"), col("ca"), (x, y) => x * y), lit(0L), _ + _))
      .withColumn(
        "cosine",
        col("__dot").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))))
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
