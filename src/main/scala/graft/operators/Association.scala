package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset / association-rule mining, the 2-itemset A-priori pass:
  * which items CO-OCCUR in baskets beyond chance — co-purchase analysis,
  * "documents tagged X are usually also tagged Y", co-click mining. Distinct
  * from [[graft.functions.TextAnalysis.pmiPairs]]: baskets are SETS (no
  * order, no distance, duplicates collapse) and the outputs are the
  * classical rule metrics, in exact parts-per-million integers.
  *
  * Scale shape: baskets collapse to sorted distinct-item arrays in one hash
  * aggregation (map-side combined), pair emission is IN-ROW over the sorted
  * array (index-sliced, so each unordered pair emits exactly once; no
  * within-basket self-join), and a `maxItems` guard drops degenerate
  * mega-baskets whose C(m,2) blow-up would otherwise dominate — at 100 TB
  * the cost is Σ C(|basket|,2) with |basket| capped, then one count shuffle
  * keyed by item pair (sha-uniform cardinality, skew-free).
  */
object Association {

  /** Association rules over `(basketCol, itemCol)` rows: for every ordered
    * rule a→b whose unordered pair co-occurs in ≥ `minSupport` baskets,
    * `(ante, cons, n_baskets, supp_pair, supp_ante, supp_cons,
    * confidence_ppm, lift_ppm)` where
    * `confidence_ppm = supp_pair·10⁶ div supp_ante` and
    * `lift_ppm = supp_pair·n_baskets·10⁶ div (supp_ante·supp_cons)`
    * (lift > 10⁶ ⇔ positively associated). Both directions of each pair
    * emit. Baskets with more than `maxItems` distinct items are DROPPED
    * from pair counting (their pair blow-up is quadratic and their
    * associations are mostly noise) — item supports still count them, the
    * standard mining trade-off, so confidences are conservative.
    */
  def pairRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L,
      maxItems: Int = 64): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxItems >= 2, s"maxItems must be >= 2, got $maxItems")
    val rows = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
    val baskets = rows
      .groupBy(col("__b"))
      .agg(sort_array(collect_set(col("__i"))).as("__items"))
    val nBaskets = baskets.select(count(lit(1)).as("n_baskets"))
    val itemSupp = baskets
      .select(explode(col("__items")).as("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("supp"))
    // each unordered pair once: element i pairs with every LATER element of
    // the sorted array — index-sliced in-row, no self-join
    val pairSupp = baskets
      .filter(size(col("__items")) <= maxItems)
      .select(explode(flatten(transform(col("__items"), (x, i) =>
        transform(
          slice(col("__items"), i + lit(2), size(col("__items")) - i - lit(1)),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(count(lit(1)).as("supp_pair"))
      .filter(col("supp_pair") >= minSupport)
    val directed = pairSupp
      .select(col("a").as("ante"), col("b").as("cons"), col("supp_pair"))
      .union(pairSupp
        .select(col("b").as("ante"), col("a").as("cons"), col("supp_pair")))
    directed
      .join(itemSupp.withColumnRenamed("item", "ante")
        .withColumnRenamed("supp", "supp_ante"), Seq("ante"))
      .join(itemSupp.withColumnRenamed("item", "cons")
        .withColumnRenamed("supp", "supp_cons"), Seq("cons"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("ante"), col("cons"), col("n_baskets"),
        col("supp_pair"), col("supp_ante"), col("supp_cons"),
        // DECIMAL(38,0) products (the repo's exact-big-product convention):
        // supp·n·10⁶ wraps a BIGINT near 10¹² baskets — silently in Spark,
        // as a hard error in engines that promote (divergence either way)
        expr("cast(supp_pair as decimal(38,0)) * 1000000 div supp_ante")
          .as("confidence_ppm"),
        expr("cast(supp_pair as decimal(38,0)) * n_baskets * 1000000" +
          " div (cast(supp_ante as decimal(38,0)) * supp_cons)")
          .as("lift_ppm"))
  }
}
