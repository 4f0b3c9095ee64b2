package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed undirected-graph analytics beyond the connected components
  * in [[Dedup.connectedComponents]] — the structural profile of a pair
  * graph (near-dup families, co-occurrence networks, record-linkage
  * candidates): how dense, how hub-dominated, how transitive.
  */
object Graphs {

  /** One-row structural profile: `(n_nodes, n_edges, max_degree,
    * n_wedges, n_triangles, transitivity_ppm)` where
    * `transitivity_ppm = 3·triangles·10⁶ div wedges` (the global clustering
    * coefficient — near 0 for random pairing, high for clique-like
    * near-dup families).
    *
    * Triangle counting uses DEGREE-ORDERED edge orientation (the classic
    * node-iterator refinement): every edge points from its
    * `(degree, node)`-smaller endpoint to the larger, each triangle
    * a<b<c then appears as exactly the wedge (a→b, a→c) closed by b→c —
    * counted ONCE, no post-hoc dedup — and wedge fan-out at a node is its
    * OUT-degree, which the ordering caps at O(√m) amortized: a hub with a
    * million neighbors emits ~nothing (its edges all point INTO it), where
    * the naive all-wedges join would emit 10¹² pairs. The closing check is
    * a plain equi-join on the oriented edge list; nothing in the plan
    * exceeds Σ out-deg² rows. Self-loops are dropped; duplicate/reversed
    * input pairs collapse.
    */
  def graphProfile(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val edges = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull && col(aCol) =!= col(bCol))
      .select(
        least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .distinct()
    val degrees = edges.select(col("lo").as("n"))
      .union(edges.select(col("hi").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orient by (deg, n): strict total order, so orientation is acyclic
    val withDeg = edges
      .join(degrees.withColumnRenamed("n", "lo").withColumnRenamed("deg", "dlo"), Seq("lo"))
      .join(degrees.withColumnRenamed("n", "hi").withColumnRenamed("deg", "dhi"), Seq("hi"))
    val oriented = withDeg.select(
      when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")), col("lo"))
        .otherwise(col("hi")).as("src"),
      when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")), col("hi"))
        .otherwise(col("lo")).as("dst"))
    // wedges at src: unordered out-neighbor pairs, canonicalized by the
    // SAME (deg, n) order so the closing edge matches its oriented form
    val o1 = oriented.select(col("src"), col("dst").as("v"))
    val o2 = oriented.select(col("src"), col("dst").as("w"))
    val rank = degrees.select(col("n"), col("deg"))
    val wedges = o1.join(o2, Seq("src"))
      .join(rank.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), Seq("v"))
      .join(rank.withColumnRenamed("n", "w").withColumnRenamed("deg", "dw"), Seq("w"))
      .filter(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v").as("src"), col("w").as("dst"))
    val triangles = wedges.join(oriented, Seq("src", "dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val base = edges.agg(count(lit(1)).as("n_edges"))
    val nodeStats = degrees.agg(
      count(lit(1)).as("n_nodes"),
      max(col("deg")).as("max_degree"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    base.crossJoin(broadcast(nodeStats)).crossJoin(broadcast(triangles))
      .select(
        col("n_nodes"), col("n_edges"), col("max_degree"),
        col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("n_triangles * 3000000L div n_wedges")).as("transitivity_ppm"))
  }

  /** PageRank over the undirected pair graph in EXACT integer arithmetic —
    * centrality for near-dup families ("which document anchors this
    * cluster"), co-occurrence networks, linkage graphs. Ranks live on a
    * `scale`-unit integer grid and every step is integer division
    * (truncation is part of the deterministic spec, identical in any
    * engine), so k iterations are replayable closed-form:
    * `r₀ = scale div n`, then
    * `r'(u) = ((10⁶ − damp)·r₀ + damp·Σ_{v∼u} (r(v) div deg(v))) div 10⁶`.
    * Each iteration is one equi-join of the rank frame with the
    * (bidirectional) edge list plus one map-side-combined aggregation —
    * shuffle ∝ edges, driver sees nothing but the loop counter;
    * `localCheckpoint` truncates the k-deep lineage. Isolated nodes never
    * appear (no edges ⇒ no rank mass to receive); every listed node has
    * deg ≥ 1, so no dangling-mass redistribution is needed. Output:
    * `(node, rank_scaled)` — Σ rank drifts below `scale` by the truncation
    * (deterministically), relative order is what centrality consumes.
    */
  def pageRank(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int = 3,
      dampPpm: Long = 850000L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(dampPpm >= 0 && dampPpm <= 1000000, s"dampPpm must be ppm, got $dampPpm")
    val edges = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull && col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("lo"), greatest(col(aCol), col(bCol)).as("hi"))
      .distinct()
    val bidir = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint(false)
    val degrees = bidir.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = degrees.count()
    require(n > 0, "graph has no edges")
    val base0 = scale / n
    var ranks = degrees.select(col("src").as("node"), lit(base0).as("rank_scaled"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(degrees.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("node").as("src"), expr("rank_scaled div deg").as("c"))
        .join(bidir, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("__in"))
      // `div`, never `/`: Spark's `/` on longs returns DOUBLE (rounding),
      // while `div` truncates like every other engine's integer division
      ranks = ranks.select(col("node"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          call_function("div",
            lit(1000000L - dampPpm) * lit(base0) +
              lit(dampPpm) * coalesce(col("__in"), lit(0L)),
            lit(1000000L)).as("rank_scaled"))
        .localCheckpoint(false)
    }
    ranks
  }
}
