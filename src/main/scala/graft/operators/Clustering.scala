package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.longDot

/** First-class k-means clustering over an embedding column — the corpus
  * organization step of a training-data pipeline (topic-ish grouping,
  * per-cluster sampling quotas, cluster-stratified dedup and splits).
  * [[Similarity]] uses Lloyd internally to learn IVF cells; this exposes
  * clustering itself, with cluster assignments and a per-cluster summary
  * as the product.
  *
  * Arithmetic is EXACT integer end-to-end, on the same `Q = 10⁸` grid as
  * the ANN family: embeddings quantize to long vectors, assignment
  * minimizes the integer squared Euclidean distance
  * `‖x‖² − 2·x·c + ‖c‖²` (ties → lowest cluster id), and the Lloyd
  * update computes per-dimension FLOOR-division means
  * `⌊Σ x_d / n⌋` (floor via `(s − pmod(s, n)) div n`, exact in any
  * engine — the subtraction makes the dividend an exact multiple, so the
  * division is rounding-mode-proof). Truncation to the integer grid IS
  * the spec, so k iterations replay closed-form in external SQL — the
  * catalog oracle unrolls them as CTEs, like PageRank's.
  *
  * Initial centroids are the first `k` corpus vectors in
  * `(sha256-hash(id), id)` order ([[Similarity.shaPivotHash]]) — a
  * deterministic, engine-replicable pseudo-random sample (kmeans++ would
  * need a sequential scan per seed; a hash sample is the distributed
  * default, as in cluster-pruning IVF).
  *
  * Scale shape: every iteration is one corpus pass — the k-row centroid
  * table BROADCASTS into the scan, the per-row argmin is a
  * `min(struct(...))` aggregation that partial-combines map-side inside
  * the cross-join stage (a window would shuffle AND sort the N·k
  * explosion), and the centroid update shuffles only the partial
  * per-(cluster, dim) sums — ≤ k·dim rows reach the reduce side
  * regardless of corpus size. Nothing materializes more than the corpus
  * itself; at 100 TB the cost is `iters + 1` scans, each embarrassingly
  * parallel. Clusters that capture no members vanish from later rounds
  * (standard Lloyd-on-samples behavior; every seed captures itself at
  * round 1 unless an identical twin with a lower id absorbs it).
  */
object Clustering {

  private val Q = 1e8

  // (id, __qa quantized long vector, __n2 its square norm)
  private def quantize(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.withColumn("__qa",
        transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")))
      .withColumn("__n2", longDot(col("__qa"), col("__qa")))
      .select(col(idCol), col("__qa"), col("__n2"))

  // nearest centroid per row — argmin via min(struct): (sqdist, cluster)
  // is unique per (row, centroid), so the trailing qa field never
  // influences the order; the aggregation partial-combines map-side, so
  // the only shuffle after the broadcast cross-join carries one row per
  // corpus vector (a window would shuffle AND sort the N·k explosion).
  private def assign(base: DataFrame, idCol: String, cents: DataFrame): DataFrame =
    base
      .crossJoin(broadcast(cents))
      .withColumn("__d",
        col("__n2") - lit(2L) * longDot(col("__qa"), col("cvec")) + col("cn2"))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d").as("d"), col("cluster").as("c"),
        col("__qa").as("qa"))).as("b"))
      .select(col(idCol), col("b.c").as("cluster"), col("b.d").as("sqdist"),
        col("b.qa").as("__qa"))

  // Lloyd update: floor-divided per-dimension integer means. The explode
  // partial-aggregates (cluster, pos) map-side; only ≤ k·dim summed rows
  // reach the reduce side, then fold back into ≤ k centroid vectors.
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("__qa")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("cnt"))
      .withColumn("m", expr("(s - pmod(s, cnt)) div cnt"))
      .groupBy("cluster")
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster"),
        transform(col("pm"), x => x.getField("m")).as("cvec"))
      .withColumn("cn2", longDot(col("cvec"), col("cvec")))

  // the centroid table after `iters` Lloyd rounds from the sha-sampled seeds
  private def finalCentroids(
      base: DataFrame, idCol: String, k: Int, iters: Int): DataFrame = {
    val c0 = base
      .orderBy(Similarity.shaPivotHash(col(idCol)), col(idCol))
      .limit(k)
      .select(col(idCol).cast("long").as("cluster"), col("__qa").as("cvec"),
        col("__n2").as("cn2"))
    // lazy localCheckpoint per round: the centroid frame is ≤ k rows but
    // its LINEAGE is a full corpus pass per round — without truncation the
    // final table's two consumers (assignment + checksum) would each
    // replay every round's pass, and plans grow multiplicatively with
    // iters. Lazy = no construction-time job (fills on first use); the
    // frame is only ever broadcast, so losing its partitioning is free.
    (0 until iters).foldLeft(c0)((c, _) =>
      update(assign(base, idCol, c)).localCheckpoint(false))
  }

  private def checkArgs(k: Int, iters: Int): Unit = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0 && iters <= 50, s"iters must be in [0, 50], got $iters")
  }

  /** Per-row cluster assignment after `iters` Lloyd rounds:
    * `(idCol, cluster, sqdist)` where `cluster` is the seed row's id and
    * `sqdist` the integer squared distance to the final centroid.
    */
  def kmeansAssign(
      df: DataFrame, idCol: String, embCol: String, k: Int, iters: Int): DataFrame = {
    checkArgs(k, iters)
    val base = quantize(df, idCol, embCol)
    assign(base, idCol, finalCentroids(base, idCol, k, iters))
      .select(col(idCol), col("cluster"), col("sqdist"))
  }

  /** Per-cluster summary after `iters` Lloyd rounds: `(cluster, n_members,
    * total_sqdist_scaled, centroid_checksum)`.
    *
    *  - `total_sqdist_scaled` — Σ over members of `sqdist div 10⁶`
    *    (per-row truncation BEFORE the sum keeps the total in long range
    *    at any corpus size: a 10⁹-row cluster of max-distance vectors sums
    *    to ~10²¹ raw but ~10¹⁵ scaled; the truncation is deterministic and
    *    part of the spec).
    *  - `centroid_checksum` — Σ of the final centroid's integer
    *    components: a compact exact fingerprint of the centroid vector,
    *    so the oracle pins the centroids themselves, not just the
    *    partition sizes.
    */
  def kmeans(
      df: DataFrame, idCol: String, embCol: String, k: Int, iters: Int): DataFrame = {
    checkArgs(k, iters)
    val base = quantize(df, idCol, embCol)
    val cents = finalCentroids(base, idCol, k, iters)
    assign(base, idCol, cents)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        sum(expr("sqdist div 1000000")).as("total_sqdist_scaled"))
      .join(
        cents.select(col("cluster"),
          aggregate(col("cvec"), lit(0L), (a, x) => a + x).as("centroid_checksum")),
        Seq("cluster"))
  }
}
