package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality/frequency sketches with DETERMINISTIC, cross-engine
  * reproducible state — the approximate counterpart to
  * [[Incremental]]'s exact partial aggregates.
  *
  * Why another HLL when Spark ships DataSketches (`hll_sketch_agg`, used by
  * [[Incremental.partialStats]])? Two reasons:
  *
  *   1. '''Auditability.''' DataSketches state is an opaque binary blob tied
  *      to one library's hash; these sketches are plain integer ROWS keyed by
  *      a sha256-derived hash, so any engine with sha256 (DuckDB, Trino, a
  *      Python notebook) can rebuild byte-identical state from the raw data
  *      and verify a persisted sketch — the oracle gate does exactly that.
  *   2. '''Merge-law transparency.''' State merges are visible relational
  *      operations (register-wise `max`, k-smallest-of-union, counter `sum`),
  *      so "sketch of union == merge of sketches" is checkable row-for-row,
  *      not an opaque library invariant.
  *
  * The scale shape is the same for all three: each ingest bucket collapses to
  * bounded state (HLL: ≤ m rows/key; KMV: ≤ k rows/key; CMS: ≤ d·w rows), and
  * the rollup only ever touches state rows — a 100 TB history is never
  * re-scanned. All estimators are computed in exact integer arithmetic
  * (`div`, shifts) so Spark and any replayer agree bit-for-bit; the repo-wide
  * fixed-point convention.
  *
  * References (public literature): Flajolet et al., "HyperLogLog" (AofA
  * 2007); Beyer et al., "On Synopses for Distinct-Value Estimation" (KMV,
  * SIGMOD 2007); Cormode & Muthukrishnan, "Count-Min Sketch" (J.Alg 2005).
  */
object Sketches {

  // ---------------------------------------------------------------- HLL ----

  /** Register count m (2^6). 64 registers ≈ 13% standard error — sized for
    * auditable per-key state (64 rows max); raise p for tighter error.
    */
  val HllM = 64

  /** rho is capped so every denominator term 2^(cap−rho) stays an exact
    * non-negative power of two in a BIGINT sum: rho ∈ [1, 30].
    */
  val HllRhoCap = 30

  /** alpha_64 = 0.709 (Flajolet's small-m constant), in parts-per-million so
    * the whole estimator is integer: E = alphaPpm·m²·2^cap / (denom·10⁶).
    */
  val HllAlphaPpm = 709000L

  /** alphaPpm·m²·2^cap, precomputed so neither engine re-derives it with
    * (overflow-prone, reassociation-prone) inline arithmetic. ≈3.1e18 —
    * inside BIGINT with ~3× headroom.
    */
  val HllNumShifted: Long = HllAlphaPpm * HllM * HllM << HllRhoCap

  /** Raw-estimator cutoff 5m/2 below which (with empty registers present)
    * linear counting is the better estimator, per the HLL paper.
    */
  val HllLcThreshold = 5L * HllM / 2

  /** Linear-counting lookup: V empty registers → round(m·ln(m/V)). A
    * PRECOMPUTED table (V has only m−1 possible values) rather than a
    * runtime `ln`, so both engines use these exact integers and no libm
    * ulp difference can flip a round-half boundary.
    */
  val HllLcTable: Seq[Long] =
    (1 until HllM).map(v => math.round(HllM * math.log(HllM.toDouble / v)))

  /** 60-bit sha-derived hash (see [[Sampling.hash60]]); re-exported here so
    * the sketch family reads self-contained.
    */
  def hash60(key: Column, salt: String): Column = Sampling.hash60(key, salt)

  /** 48-bit variant (first 12 sha256 hex chars) for the KMV/CMS estimators,
    * whose integer arithmetic needs (k−1)·2^48 to fit a BIGINT.
    * DuckDB: `CAST(concat('0x', substr(sha256(v || ':' || salt), 1, 12)) AS BIGINT)`.
    */
  def hash48(key: Column, salt: String): Column =
    conv(
      substring(
        sha2(concat(coalesce(key.cast("string"), lit("")), lit(":" + salt)), 256), 1, 12),
      16, 10).cast("long")

  /** Floor division for non-negative longs; Spark `div` == DuckDB `//`. */
  private def intDiv(n: Column, d: Column): Column = call_function("div", n, d)

  /** Trailing-zero count of w ∈ [0, 2^54), capped at [[HllRhoCap]]−1, as the
    * loop-free sum Σ_{k=1..cap−1} [w mod 2^k = 0] — tz zeros make exactly tz
    * terms true. Chosen over `log2`/`bin()` because modulo arithmetic is the
    * one formulation EVERY SQL engine reproduces exactly; the 29 codegen'd
    * comparisons cost nothing next to the sha256 that produced w.
    */
  def trailingZeros(w: Column): Column =
    (1 until HllRhoCap)
      .map(k => when(w % lit(1L << k) === 0, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** The same sum as DuckDB SQL over a column named `colName`. */
  def trailingZerosSql(colName: String): String =
    (1 until HllRhoCap)
      .map(k => s"(CASE WHEN $colName % ${1L << k} = 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** The linear-counting lookup as a DuckDB CASE over `colName` (= V). */
  def hllLcSql(colName: String): String =
    s"CASE $colName " +
      HllLcTable.zipWithIndex.map { case (e, i) => s"WHEN ${i + 1} THEN $e" }.mkString(" ") +
      " END"

  /** HLL register state per `keys`: one row per OCCUPIED register,
    * `(keys…, reg ∈ [0,m), rho ∈ [1,cap])`. One map-side-combining hash
    * aggregation — at 100 TB each executor emits ≤ m rows per local key
    * before the shuffle, and duplicate values collapse for free (equal
    * values hash to the same (reg, rho)). Empty registers are implicit
    * (m − rows), so no register-grid join is ever materialized.
    */
  def hllPartial(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salt: String = "hll"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val h = hash60(col(valueCol), salt)
    val w = intDiv(h, lit(HllM.toLong))
    df.filter(col(valueCol).isNotNull)
      .select(
        keys.map(col) :+
          (h % HllM).as("reg") :+
          (trailingZeros(w) + lit(1L)).as("rho"): _*)
      .groupBy((keys :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge register states (any bucket mix, any number of
    * [[hllPartial]] runs): register-wise max. Associative and idempotent, so
    * merge-of-partials is BIT-IDENTICAL to a one-shot sketch of the union —
    * re-ingesting a batch is harmless (exactly the property a retried
    * 100 TB backfill needs).
    */
  def hllMerge(partials: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(Seq("reg", "rho").forall(partials.columns.contains),
      s"not an hllPartial frame; need reg, rho — has ${partials.columns.mkString(", ")}")
    partials
      .groupBy((keys :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Collapse register state to `(keys…, n_occupied, est_distinct)`.
    * Integer-exact raw estimator: denom = Σ_occupied 2^(cap−rho) +
    * (m − n_occupied)·2^cap, est = (alphaPpm·m²·2^cap div denom) div 10⁶;
    * linear counting (precomputed table) replaces it when est ≤ 5m/2 and
    * empty registers remain — the paper's small-range regime.
    */
  def hllEstimate(registers: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val denomTerm = expr(s"cast(shiftleft(1L, $HllRhoCap - rho) as bigint)")
    registers
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_occupied"),
        sum(denomTerm).as("__denom_occ"))
      .withColumn("__v", lit(HllM.toLong) - col("n_occupied"))
      .withColumn("__denom",
        col("__denom_occ") + col("__v") * lit(1L << HllRhoCap))
      .withColumn("__est_raw",
        intDiv(intDiv(lit(HllNumShifted), col("__denom")), lit(1000000L)))
      .withColumn("est_distinct",
        when(col("__est_raw") <= HllLcThreshold && col("__v") > 0,
          element_at(array(HllLcTable.map(lit): _*), col("__v").cast("int")))
          .otherwise(col("__est_raw")))
      .select(keys.map(col) :+ col("n_occupied") :+ col("est_distinct"): _*)
  }

  // ---------------------------------------------------------------- KMV ----

  /** KMV (k-minimum-values) state per `keys`: the k smallest DISTINCT 48-bit
    * hashes, one row each `(keys…, h)`. The distinct is the one real shuffle
    * (identical to what exact count-distinct would pay); the k-smallest rank
    * filter then runs under Spark's WindowGroupLimit pushdown, so each
    * partition keeps only k candidates before the window sort.
    */
  def kmvPartial(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(k >= 2, s"k must be >= 2, got $k")
    val hashes = df
      .filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ hash48(col(valueCol), salt).as("h"): _*)
      .distinct()
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("h"))
    hashes
      .withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= k)
      .drop("__pos")
  }

  /** Merge KMV states: k smallest of the deduplicated union. Same code path
    * as [[kmvPartial]] post-hash, so merge-of-partials ≡ one-shot by
    * construction.
    */
  def kmvMerge(partials: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(partials.columns.contains("h"),
      s"not a kmvPartial frame; need h — has ${partials.columns.mkString(", ")}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("h"))
    partials
      .select(keys.map(col) :+ col("h"): _*)
      .distinct()
      .withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= k)
      .drop("__pos")
  }

  /** Collapse KMV state to `(keys…, n_state, est_distinct)`: fewer than k
    * distinct hashes means the state IS the distinct set (exact count);
    * otherwise est = (k−1)·2^48 div max(h) — the KMV estimator on the
    * uniform 48-bit hash space, in exact integers.
    */
  def kmvEstimate(state: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    state
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_state"), max(col("h")).as("__kth"))
      .withColumn("est_distinct",
        when(col("n_state") < k, col("n_state"))
          .otherwise(intDiv(lit((k - 1).toLong << 48), greatest(col("__kth"), lit(1L)))))
      .drop("__kth")
  }

  /** Set-overlap estimate between two frames' value sets from ONE bounded
    * union-KMV pass — the 100 TB corpus-overlap question ("how much of
    * corpus B is already in A?") answered without materializing either
    * distinct set. The k smallest hashes of A ∪ B form a uniform sample of
    * the union, so the fraction also present in both sides estimates
    * Jaccard; est_intersection re-scales by the union-KMV size estimate.
    *
    * Output (one row): `n_state` (= min(k, |A∪B|)), `n_matches`,
    * `jaccard_ppm`, `est_union`, `est_intersection` — all exact-integer
    * arithmetic. The k-smallest-of-union is `orderBy(h).limit(k)`, a
    * distributed TakeOrdered (per-partition top-k, never a global sort).
    */
  def kmvOverlap(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val a = dfA.filter(col(valueCol).isNotNull)
      .select(hash48(col(valueCol), salt).as("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
    val b = dfB.filter(col(valueCol).isNotNull)
      .select(hash48(col(valueCol), salt).as("h"), lit(0L).as("in_a"), lit(1L).as("in_b"))
    a.union(b)
      .groupBy(col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .orderBy(col("h"))
      .limit(k)
      .agg(
        count(lit(1)).as("n_state"),
        sum(col("in_a") * col("in_b")).as("n_matches"),
        max(col("h")).as("__kth"))
      .withColumn("jaccard_ppm",
        intDiv(col("n_matches") * lit(1000000L), col("n_state")))
      .withColumn("est_union",
        when(col("n_state") < k, col("n_state"))
          .otherwise(intDiv(lit((k - 1).toLong << 48), greatest(col("__kth"), lit(1L)))))
      .withColumn("est_intersection",
        intDiv(col("jaccard_ppm") * col("est_union"), lit(1000000L)))
      .drop("__kth")
  }

  // ---------------------------------------------------------------- CMS ----

  /** Count-Min counter state: `(r ∈ [0,depth), cell ∈ [0,width), cnt)`,
    * ≤ depth·width rows regardless of input size. Each input row lands in
    * one cell per hash row (salt embeds r, so the depth hash functions are
    * independent sha streams); the posexplode costs depth× rows ONLY until
    * the map-side combine, which caps every task's output at depth·width.
    */
  def cmsPartial(
      df: DataFrame,
      valueCol: String,
      depth: Int,
      width: Int,
      salt: String = "cms",
      bucketCol: Option[String] = None): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got $depth, $width")
    val bucket = bucketCol.map(col).toSeq
    df.filter(col(valueCol).isNotNull)
      .select(bucket :+ posexplode(array(
        (0 until depth).map(r => hash48(col(valueCol), s"$salt:$r") % width): _*))
        .as(Seq("r", "cell")): _*)
      .groupBy(bucket :+ col("r") :+ col("cell"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge CMS states: counter addition per (r, cell). */
  def cmsMerge(partials: DataFrame): DataFrame = {
    require(Seq("r", "cell", "cnt").forall(partials.columns.contains),
      s"not a cmsPartial frame; need r, cell, cnt — has ${partials.columns.mkString(", ")}")
    partials.groupBy(col("r"), col("cell")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-query the sketch for each distinct value in `candidates`:
    * est = min over hash rows of the addressed counter — an upper bound on
    * the true count (collisions only ever inflate), within 2N/width with
    * probability 1−2^−depth. The counter table (≤ depth·width rows)
    * broadcasts; candidates never shuffle.
    */
  def cmsEstimate(
      counters: DataFrame,
      candidates: DataFrame,
      valueCol: String,
      depth: Int,
      width: Int,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got $depth, $width")
    // exactly (r, cell, cnt): a BUCKETED partial frame would satisfy a
    // column-subset check but fan each candidate across buckets, where the
    // min picks one bucket's count (or an empty cell's 0) and silently
    // UNDERCOUNTS — run cmsMerge first
    require(counters.columns.sorted.sameElements(Array("cell", "cnt", "r")),
      s"counters must be a merged (r, cell, cnt) frame, got ${counters.columns.mkString(", ")}" +
        " — fold bucketed partials through cmsMerge first")
    val addressed = candidates
      .select(col(valueCol)).distinct()
      .select(col(valueCol), posexplode(array(
        (0 until depth).map(r => hash48(col(valueCol), s"$salt:$r") % width): _*))
        .as(Seq("r", "cell")))
    addressed
      // LEFT join: an absent counter row means the cell was never touched,
      // i.e. count 0 — an inner join would silently drop never-seen values
      // instead of reporting their true estimate of 0
      .join(broadcast(counters), Seq("r", "cell"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
