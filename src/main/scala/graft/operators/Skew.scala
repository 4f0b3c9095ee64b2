package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for shuffled equi-joins: key salting.
  *
  * AQE's skew-join splitting (on by default, pinned in PlanSpec) already
  * handles most skew at runtime — prefer it. Salting is the explicit
  * fallback for the cases AQE cannot touch: full-outer joins (neither side
  * splittable), aggregations with one dominant key, or engines/configs
  * without AQE. It trades one extra narrow projection and an `explode` of
  * the small side for a `saltFactor`-way spread of every hot key.
  */
object Skew {

  /** Inner/left equi-join with the big side's keys salted `saltFactor`
    * ways.
    *
    * The big side gets a DETERMINISTIC per-row salt (hash of the whole row
    * mod `saltFactor` — no RNG, so retries/speculative tasks agree); the
    * small side is replicated once per salt value. Each hot key's rows
    * then land on `saltFactor` different reducers instead of one. Join
    * results are identical to the unsalted join because every big-side row
    * still meets every matching small-side row exactly once (at its own
    * salt value).
    *
    * Cost model at 100 TB: small-side shuffle volume × saltFactor versus
    * hot-partition wall-time ÷ saltFactor — size `saltFactor` to the
    * observed skew ratio, not higher. For broadcast-able small sides use
    * `broadcast()` instead; salting only pays when BOTH sides must
    * shuffle.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics for inner/left joins only, got $joinType")
    val salt = "__salt"
    val bigSalted = big.withColumn(
      salt, pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val smallSalted = small.withColumn(
      salt, explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted
      .join(smallSalted, keys :+ salt, joinType)
      .drop(salt)
  }

  /** Two-phase (partial → final) aggregation with salted keys: sums/counts
    * of one dominant key spread over `saltFactor` partial groups before
    * the final combine. Use for algebraic aggregates (sum/count/min/max)
    * over heavily skewed grouping keys; Spark's own partial aggregation
    * usually suffices — this is for the pathological case where even the
    * map-side-combined partials of one key overwhelm a single reducer.
    */
  def saltedSum(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salt = "__salt"
    // Salt from the WHOLE row (as saltedJoin does), not the value column: a
    // hot group summing a constant/low-cardinality value would otherwise
    // hash to a handful of salts and still funnel to one reducer. Fully
    // identical rows still collapse map-side (same group+salt partial), so
    // whole-row hashing loses nothing there.
    df.withColumn(salt, pmod(xxhash64(df.columns.map(col): _*), lit(saltFactor)).cast("int"))
      .groupBy((groupCols :+ salt).map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  private def pmod(c: Column, m: Column): Column = ((c % m) + m) % m
}
