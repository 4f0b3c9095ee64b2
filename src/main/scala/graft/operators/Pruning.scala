package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Scan-side join pruning via Bloom filters.
  *
  * The 100 TB shape this exists for: a huge fact/corpus table joined
  * against a key set that is too large to broadcast as a join hash table
  * (tens of millions of ids → GBs of hash map) but tiny as a Bloom filter
  * (~1.2 bytes/key at 3% fpp). Shuffling the full big side just to discard
  * 95% of it in the join is the single largest avoidable cost in that
  * query; a Bloom filter built from the key side and applied BEFORE the
  * exchange cuts the big side's shuffle volume to roughly the join
  * selectivity (plus the fpp).
  *
  * Spark's own runtime row-level filtering (InjectRuntimeFilter) does this
  * automatically, but only under narrow conditions (selective filter on
  * the creation side, shuffle-join plan shape, size thresholds). This
  * operator is the explicit, always-on form, built from the same native
  * codegen'd expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — NOT a UDF).
  *
  * Exactness: the Bloom filter has false positives but NO false negatives,
  * and the pruned big side still goes through the exact semi join — so the
  * result is row-identical to the unpruned semi join (the fpp only costs
  * shuffle bytes, never correctness). The dual (anti-join pruning) is
  * deliberately ABSENT: a false positive there would wrongly drop a row,
  * so anti joins must stay exact.
  */
object Pruning {

  // The Bloom aggregate is built as a scalar-subquery expression —
  // `might_contain` requires its filter input to be a constant or scalar
  // subquery (the form InjectRuntimeFilter emits), so the build side is
  // executed once as a subquery stage and its result ships to the scan
  // tasks as a literal.

  /** Semi join `big` ⋉ `small` on `bigKey = smallKey`, with the big side
    * Bloom-pruned before its exchange.
    *
    * `expectedItems` sizes the filter (pass the approximate DISTINCT count
    * of `smallKey`; oversizing wastes broadcast bytes, undersizing raises
    * the effective fpp and with it the pruned-but-discarded volume — never
    * correctness). NULL big-side keys are dropped by the filter, matching
    * semi-join semantics (NULL never matches).
    */
  def bloomPrunedSemiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame =
    bloomPrunedSemiJoinMulti(big, small, Seq(bigKey), Seq(smallKey), expectedItems, fpp)

  /** The multi-column generalization of [[bloomPrunedSemiJoin]]: membership
    * is tested on `xxhash64` over the KEY TUPLE, then the pruned big side
    * goes through the exact tuple-equality semi join. Same exactness
    * argument — false positives only cost shuffle bytes. The comparison
    * engine's mismatch refetch (composite primary keys) is the in-house
    * consumer.
    */
  def bloomPrunedSemiJoinMulti(
      big: DataFrame, small: DataFrame,
      bigKeys: Seq[String], smallKeys: Seq[String],
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = bloomPruneFilter(big, small, bigKeys, smallKeys, expectedItems, fpp)
    val cond = bigKeys.zip(smallKeys)
      .map { case (b, s) => pruned(b) === small(s) }
      .reduce(_ && _)
    pruned.join(small, cond, "left_semi")
  }

  /** Scan-side Bloom PRUNE of `big` on its `bigKeys` tuple against
    * `small`'s `smallKeys` tuple set — the filter HALF of
    * [[bloomPrunedSemiJoinMulti]], with NO exact join appended. The result
    * is a SUPERSET of the semi join (false positives pass), so a caller
    * must make itself exact downstream. The comparison engine's mismatch
    * refetch is the intended consumer: its mismatch-key inner join and
    * checksum-mismatch filter are already exact, so appending the semi
    * join there would only re-shuffle the pruned side a second time for
    * rows the downstream joins discard anyway.
    *
    * SESSION-CONF SIDE EFFECT, permanent by contract: the call RAISES
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`/`maxNumItems`
    * when this filter's sizing exceeds them and leaves them raised (the
    * clamp re-applies lazily at execution time, so a set-and-restore would
    * restore before the aggregate ever evaluates — see the body comment).
    * The raise is MONOTONIC — a user's already-higher setting is never
    * lowered (spec-pinned) — but in a shared session it also widens the
    * budget Spark's automatic InjectRuntimeFilter may spend on unrelated
    * queries; callers who care should read and re-assert the two confs at
    * their own session boundaries.
    */
  def bloomPruneFilter(
      big: DataFrame, small: DataFrame,
      bigKeys: Seq[String], smallKeys: Seq[String],
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    require(bigKeys.nonEmpty && bigKeys.size == smallKeys.size,
      s"key lists must be non-empty and same-length: $bigKeys vs $smallKeys")
    require(expectedItems >= 1, s"expectedItems must be >= 1, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // Spark SILENTLY clamps BloomFilterAggregate's numBits/estimatedNumItems
    // to session confs (defaults: 67,108,864 bits / 4M items — sized for
    // InjectRuntimeFilter's automatic use). A 35M-key build under the
    // default ceiling degrades to ~2 bits/key ≈ 60-90% effective fpp —
    // measured at the sf100 rung as a 90%-permeable "prune" that shuffled
    // 128M of 142M rows. Raise the ceilings (never lower) to what this
    // EXPLICIT filter was sized for, and leave them raised: the clamp is
    // also applied lazily at execution time, so a set-and-restore around
    // construction would restore before the aggregate ever evaluates.
    val spark = big.sparkSession
    val maxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val maxItemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    if (spark.conf.get(maxBitsKey, "67108864").toLong < numBits)
      spark.conf.set(maxBitsKey, numBits.toString)
    if (spark.conf.get(maxItemsKey, "4000000").toLong < expectedItems)
      spark.conf.set(maxItemsKey, expectedItems.toString)
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(smallKeys.map(col): _*)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bf = ScalarSubquery(
      small.agg(GraftColumnBridge.column(agg).as("__bf")).queryExecution.analyzed)
    big.filter(GraftColumnBridge.column(new BloomFilterMightContain(
      bf, GraftColumnBridge.expression(xxhash64(bigKeys.map(col): _*)))))
  }
}
