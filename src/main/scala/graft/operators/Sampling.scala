package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / mixing for training-data curation.
  *
  * All decisions key off a 60-bit sha256-derived hash of (row key, salt) —
  * never `rand()` — so a sample is: reproducible across runs, engines and
  * partitionings (the same formula is closed-form SQL anywhere with sha256,
  * like [[Similarity.shaPivotHash]]); stable under corpus growth (a row's
  * keep/drop never changes when other rows arrive); and a pure FILTER — no
  * shuffle, no state, pushes down past column pruning. Distinct `salt`
  * values give independent samples of the same table (train/eval splits
  * that must not correlate, per-source mixing rates).
  *
  * At 100 TB this is the only sampler shape that works: `rand()` samples
  * are irreproducible under retry/speculation (a re-run task re-draws), and
  * `df.sample` seeds per-partition, so any repartition changes the sample.
  */
object Sampling {

  /** 60-bit positive hash of (key, salt): first 15 hex chars of
    * sha256("&lt;key&gt;:&lt;salt&gt;"). DuckDB:
    * `CAST(concat('0x', substr(sha256(coalesce(CAST(k AS VARCHAR), '') || ':' || salt), 1, 15)) AS BIGINT)`.
    *
    * NULL keys hash as the empty string — sha256(":&lt;salt&gt;") — via an
    * EXPLICIT `coalesce` (not `concat_ws`, whose null-skipping also eats
    * the separator and silently diverges from the `||` recipe above), so
    * NULL-keyed rows travel TOGETHER (all kept or all dropped at a given
    * rate), never silently vanish, and the formula above reproduces them
    * exactly. Sample on a non-null key (the row id) when possible.
    *
    * MIGRATION NOTE (round 6): NULL keys previously hashed via `concat_ws`,
    * which skipped the NULL *and* its separator — i.e. sha256("salt"), not
    * sha256(":salt") — diverging from the documented DuckDB recipe. The fix
    * aligns code with the recipe, but persisted sample/split membership of
    * NULL-keyed rows from pre-fix runs differs from re-runs; re-materialize
    * any retained NULL-keyed samples (non-NULL keys are unaffected).
    */
  def hash60(key: Column, salt: String): Column =
    conv(
      substring(
        sha2(concat(coalesce(key.cast("string"), lit("")), lit(":" + salt)), 256), 1, 15),
      16, 10).cast("long")

  /** [[hash60]] folded onto a `granularity`-bucket grid. */
  def hashBucket(key: Column, salt: String, granularity: Int): Column = {
    require(granularity >= 1, s"granularity must be >= 1, got $granularity")
    hash60(key, salt) % granularity
  }

  /** Keep ~`fraction` of rows, deterministically by `keyCol`. The kept set
    * at fraction p is a SUBSET of the kept set at any p' > p (nested
    * samples — shrinking a mix rate only removes rows).
    */
  def hashSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = "",
      granularity: Int = 1000000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    df.filter(hashBucket(col(keyCol), salt, granularity) < math.round(fraction * granularity))
  }

  /** Deterministic disjoint-and-exhaustive split: appends `splitCol` with
    * the name of the bucket-range each row's hash lands in. Weights are
    * normalized; cumulative thresholds are rounded on the granularity grid
    * (so with granularity 1000, (0.8, 0.1, 0.1) is exactly 800/100/100
    * buckets).
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      weights: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split",
      granularity: Int = 1000000): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), s"weights must be positive: $weights")
    val total = weights.map(_._2).sum
    val thresholds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * granularity)
    }.tail
    val b = hashBucket(col(keyCol), salt, granularity)
    // last split takes everything remaining — rounding can't orphan a row
    val expr = weights.init.zip(thresholds.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), t), rest) => when(b < t, name).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic k-per-group sample: for every group, the k rows whose
    * (hash60(key), key) sorts lowest — a stable "random" k per group with
    * no `rand()` and no full-data sort, e.g. building a fixed eval slice
    * per language/source. One shuffle (the window's hash partitioning on
    * the group column); adding rows to a group only ever displaces, never
    * reshuffles, the selection.
    */
  def groupSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("__rn"),
      "input already has a '__rn' column (reserved as this helper's scratch name) — rename it first")
    import org.apache.spark.sql.expressions.Window
    df.withColumn(
        "__rn",
        row_number().over(
          Window.partitionBy(col(groupCol))
            .orderBy(hash60(col(keyCol), salt), col(keyCol))))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weight-proportional deterministic Bernoulli sample: keep each row with
    * probability `min(1, fraction * weight / refWeight)` — e.g. sampling a
    * corpus proportional to a per-document quality score, where a row at
    * `refWeight` is kept at exactly `fraction` and heavier rows
    * proportionally more often (weight ≥ refWeight/fraction ⇒ always kept;
    * weight 0 ⇒ never).
    *
    * The decision is EXACT integer arithmetic on the [[hashBucket]] grid —
    * `bucket * refWeight < round(fraction*granularity) * weight` in
    * DECIMAL(38,0) — so there is no float rounding to diverge between
    * engines, and all [[hashSample]] guarantees carry over: reproducible
    * under retry/repartitioning, nested in `fraction` AND in `weight`
    * (raising either only adds rows), and a pure scan-side filter.
    * At `weight == refWeight` the kept set is exactly
    * `hashSample(df, keyCol, fraction, salt, granularity)`.
    *
    * DuckDB mirror (integer weights):
    * `(hash60_bucket % granularity) * refWeight < CAST(round(fraction*granularity) AS BIGINT) * weight`
    * with both products as HUGEINT.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      fraction: Double,
      refWeight: Long,
      salt: String = "",
      granularity: Int = 1000000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    require(refWeight >= 1, s"refWeight must be >= 1, got $refWeight")
    // Integral weights only: casting a fractional score to DECIMAL(38,0)
    // would silently ROUND it (0.4 -> never kept, 0.6 -> full rate),
    // turning the advertised proportionality into a step function. Scale
    // fractional scores onto an integer grid (micro-units) first.
    val wType = df.schema(weightCol).dataType
    val integral = wType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    require(integral,
      s"weightCol '$weightCol' must be an integral type for the exact keep-decision, got $wType " +
        "— multiply fractional scores onto an integer grid (e.g. micro-units) first")
    val dec = "decimal(38,0)"
    df.filter(
      hashBucket(col(keyCol), salt, granularity).cast(dec) * lit(refWeight).cast(dec) <
        lit(math.round(fraction * granularity)).cast(dec) * col(weightCol).cast(dec))
  }

  /** Weighted deterministic corpus mix: each source is hash-sampled at its
    * rate (salted by the SOURCE NAME, so rates are independent across
    * sources even when keys collide) and tagged. Sources must share a
    * schema. The standard way to dial a pre-training data mixture — and
    * because samples are nested in the rate, raising one source's rate only
    * ADDS documents.
    */
  def mixCorpora(
      sources: Seq[(String, DataFrame, Double)],
      keyCol: String,
      sourceCol: String = "source",
      granularity: Int = 1000000): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    sources.map { case (name, df, rate) =>
      hashSample(df, keyCol, rate, salt = name, granularity = granularity)
        .withColumn(sourceCol, lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Epoch-aware mixture materialization: emit each row of source `s`
    * `epochs(s)` times — the REPETITION half of pre-training data mixing,
    * where a small high-quality source runs several epochs while a large
    * crawl runs a fraction of one. A weight w = ⌊w⌋ + f yields ⌊w⌋ full
    * copies of every document plus one extra copy of the deterministic
    * [[hash60]] f-slice (the hash key is id#source, so slices are
    * independent across sources), each copy tagged with a 0-based
    * `epochCol`:
    *  - deterministic — no `rand()`; retries/repartitions reproduce the
    *    exact output, and an external engine can replay the keep-decision;
    *  - nested — raising 2.3 → 2.5 only ADDS rows (the f-slices of
    *    [[hashSample]] are nested in f), so budget revisions are
    *    incremental;
    *  - sources absent from `epochs` are DROPPED: a mixture is an explicit
    *    contract, and silently carrying unlisted sources at weight 1 would
    *    skew the token budget.
    *
    * Scale shape: one narrow per-row `explode(sequence)` — no shuffle, no
    * join; cost is the output volume Σ_s w_s·|s| itself, which is the
    * point. Downstream training-order shuffles see `epochCol` and can
    * interleave copies instead of replaying the corpus ⌊w⌋ times.
    */
  def epochMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      epochs: Map[String, Double],
      salt: String = "",
      granularity: Int = 1000000,
      epochCol: String = "epoch"): DataFrame = {
    require(epochs.nonEmpty, "epochMix needs at least one source weight")
    require(epochs.values.forall(w => w >= 0.0 && !w.isNaN && !w.isInfinite),
      s"epoch weights must be finite and >= 0: $epochs")
    require(!df.columns.contains(epochCol),
      s"input already has a '$epochCol' column — pass a different epochCol")
    require(!df.columns.contains("__n"),
      "input already has a '__n' column (reserved as this helper's scratch name) — rename it first")
    val frac = (w: Double) => math.round((w - math.floor(w)) * granularity)
    // per-source (full copies, extra-copy threshold) as a when-chain over
    // the (small, driver-known) mixture map — evaluated scan-side per row
    val fullCopies = epochs.foldLeft(lit(null).cast("int")) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(math.floor(w).toInt)).otherwise(acc)
    }
    val extraThresh = epochs.foldLeft(lit(null).cast("long")) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(frac(w))).otherwise(acc)
    }
    val bucket = hashBucket(
      concat(col(idCol).cast("string"), lit("#"), col(sourceCol)), salt, granularity)
    val n = (fullCopies + when(bucket < extraThresh, 1).otherwise(0)).as("__n")
    df.withColumn("__n", n)
      .filter(col("__n") >= 1) // unlisted sources (NULL __n) drop here too
      .withColumn(epochCol, explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n")
  }

  /** Leakage-safe train/eval split: [[hashSplit]], but hashed on the
    * NEAR-DUPLICATE CLUSTER id instead of the row key, so every member of
    * a duplicate cluster lands in the same split. A plain per-document
    * hash split puts ~`2·p·(1−p)` of each near-dup pair across the
    * train/eval boundary — eval answers sitting verbatim in train, the
    * classic contamination bug this operator exists to prevent.
    *
    * `pairs` is the upstream near-dup pair list (minhash/simhash/jaccard/
    * embedding — any of the Dedup family); clusters are its connected
    * components, labeled by min member id. Rows in no pair keep their own
    * key as a singleton group, so the split stays disjoint-and-exhaustive
    * over the whole corpus and membership of untouched rows never changes
    * when new pairs appear.
    *
    * Scale design: the component frame holds only documents that occur in
    * a pair (the near-dup minority, ≪ corpus), so AQE broadcasts the
    * cluster-id join and the corpus never shuffles; the split itself is
    * the usual scan-side hash filter. Emits `groupCol` alongside
    * `splitCol` for audits.
    */
  def leakageSafeSplit(
      df: DataFrame,
      keyCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      weights: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split",
      groupCol: String = "split_group",
      granularity: Int = 1000000): DataFrame = {
    require(!df.columns.contains(groupCol) && !df.columns.contains("component"),
      s"input already has a '$groupCol'/'component' column — rename it first")
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("node").as(keyCol), col("component"))
    val grouped = df
      .join(comp, Seq(keyCol), "left")
      .withColumn(groupCol, coalesce(col("component"), col(keyCol)))
      .drop("component")
    hashSplit(grouped, groupCol, weights, salt, splitCol, granularity)
  }

  /** [[hash60]] computed DRIVER-side for scalar parameters (e.g. the ring
    * offsets in [[negativeSample]]): byte-identical to the Column version —
    * sha256 of `"<key>:<salt>"` ASCII, first 15 hex chars as a long — so a
    * driver-derived constant and an executor-derived column never disagree.
    */
  def hash60Jvm(key: String, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"$key:$salt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Dense 0-based global rank in `(orderCols…)` order, WITHOUT a
    * single-partition window: range-repartition + within-partition sort put
    * rows in global order across partitions, and `zipWithIndex` stitches
    * per-partition offsets (one extra count job, no second shuffle) — the
    * standard distributed total-ranking shape, used for stable contiguous
    * id assignment (embedding tables, packed datasets) and the ring ranks
    * of [[negativeSample]]. `orderCols` must be a UNIQUE total order or
    * ranks within ties are partitioning-dependent. One of the few places
    * the RDD API is the right tool: no DataFrame-native operator produces a
    * global rank without collapsing to one partition.
    */
  def withGlobalRank(
      df: DataFrame,
      orderCols: Seq[String],
      rankCol: String = "rk"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column — rename it first")
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(rankCol, org.apache.spark.sql.types.LongType,
          nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(ranked, schema)
  }

  /** The three temperature points [[temperatureMix]] supports. Arbitrary
    * exponents are deliberately excluded: a keep-decision computed through
    * `pow` is NOT reproducible across engines (IEEE 754 requires correct
    * rounding of `+ - * / sqrt` but not of `pow`/`exp`/`ln`, so two
    * engines can disagree in the last ulp and flip rows at a grid
    * boundary), while every formula below is a composition of
    * correctly-rounded operations — bit-identical anywhere.
    */
  sealed trait Temperature
  object Temperature {
    /** α = 0: equal EXPECTED kept-count per domain (capped at keeping a
      * whole domain) — rate ∝ nMax/n. */
    case object Uniform extends Temperature
    /** α = ½ (τ = 2): the standard multilingual flattening — rate ∝
      * √(nMax/n), so kept counts grow with √n. */
    case object Sqrt extends Temperature
    /** α = 1: no flattening; every domain keeps `largestRate`. */
    case object Proportional extends Temperature
  }

  /** Temperature-weighted domain mixing — the "don't let English drown the
    * tail languages" knob of multilingual/multi-source pre-training: keep
    * each domain (language, source, …) at a rate that flattens the
    * corpus's natural size distribution toward the chosen temperature,
    * anchored so the LARGEST domain keeps exactly `largestRate` of its
    * rows. Unlike [[mixCorpora]], the rates are not hand-picked — they are
    * derived from the observed per-domain counts, which is how mixtures
    * are actually tuned when the corpus changes under you daily.
    *
    * Keep-rule (grid units, T = round(largestRate·granularity), n = domain
    * count, nMax = largest domain count, all integer or correctly-rounded
    * double arithmetic — see [[Temperature]]):
    *
    *   thresh = Proportional: T
    *            Sqrt:         min(gran, ⌊T·√(nMax/n)⌋)
    *            Uniform:      min(gran, ⌊T·(nMax/n)⌋)
    *   keep row ⇔ hashBucket(key, salt, gran) < thresh
    *
    * so the kept set inherits [[hashSample]]'s properties per domain:
    * deterministic, nested in `largestRate`, a pure filter.
    *
    * Scale shape: one map-side-combined count aggregation over the corpus
    * (tiny result: one row per domain — a mixture domain is low-cardinality
    * BY CONTRACT; don't point this at a key column), its 1-row max folded
    * in by an explicit-broadcast cross join, the count frame rejoined by
    * AQE broadcast, and the keep-decision is scan-side — the corpus itself
    * never shuffles. Rows with a NULL domain are excluded (an equi-join
    * drop, mirrored by the oracle): a mixture is an explicit contract over
    * named domains, and silently pooling NULLs would skew every rate.
    */
  def temperatureMix(
      df: DataFrame,
      keyCol: String,
      domainCol: String,
      temperature: Temperature,
      largestRate: Double,
      salt: String = "",
      granularity: Int = 10000): DataFrame = {
    require(largestRate > 0.0 && largestRate <= 1.0,
      s"largestRate out of (0,1]: $largestRate")
    require(granularity >= 1, s"granularity must be >= 1, got $granularity")
    val reserved = Seq("__n", "__nmax")
    require(reserved.forall(c => !df.columns.contains(c)),
      "input columns collide with temperatureMix's scratch names (__n, __nmax) — rename them first")
    val t = math.round(largestRate * granularity)
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val nMax = counts.agg(max(col("__n")).as("__nmax"))
    val thresh: Column = temperature match {
      case Temperature.Proportional => lit(t)
      case Temperature.Sqrt =>
        least(lit(granularity.toLong), floor(lit(t) * sqrt(col("__nmax") / col("__n"))))
      case Temperature.Uniform =>
        least(lit(granularity.toLong), floor(lit(t) * (col("__nmax") / col("__n"))))
    }
    df.join(counts, Seq(domainCol)) // tiny post-agg side: AQE broadcasts
      .crossJoin(broadcast(nMax))   // 1 row by construction
      .filter(hashBucket(col(keyCol), salt, granularity) < thresh)
      .drop("__n", "__nmax")
  }

  /** Deterministic NEGATIVE sampling for contrastive training: k
    * pseudo-random partner rows per anchor, reproducible across runs,
    * engines and partitionings — `df.sample`-style negatives re-draw under
    * task retry, which silently changes training data. Construction: rows
    * take positions on a hash ring (rank in `(hash60(id), id)` order), and
    * k GLOBAL salt-derived offsets rotate the ring — negative i of an
    * anchor is the row `offset_i` ring-steps ahead. Every join is a plain
    * equi-join on the target rank (co-partitioned shuffle, no cross
    * product, no window), offsets are never ≡ 0 (mod n) so self-pairs are
    * impossible by construction, and each anchor gets EXACTLY k negatives.
    * Because offsets are global rotations, every row also APPEARS as a
    * negative exactly k times — a uniformity guarantee per-anchor random
    * draws don't have.
    *
    * One bounded scalar action (the ring size) computes the offsets
    * driver-side via [[hash60Jvm]]; the oracle re-derives them in SQL from
    * the same sha recipe. Output: `(anchor_id, probe_idx, neg_id)`.
    */
  def negativeSample(
      df: DataFrame,
      idCol: String,
      k: Int,
      salt: String = "neg"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ids = df.select(col(idCol)).distinct()
      .withColumn("__pos", hash60(col(idCol), salt))
    // eager checkpoint: the ring is consumed three times (size count, probe
    // side, rotation-target side) — uncached, the distinct + range-sort +
    // zipWithIndex pipeline would run once per consumer
    val ring = withGlobalRank(ids, Seq("__pos", idCol)).drop("__pos")
      .localCheckpoint(true)
    val n = ring.count()
    require(n > k, s"need more than k=$k distinct ids for k distinct rotations, got $n")
    // k DISTINCT offsets, first-come in probe order j = 0, 1, …: colliding
    // raw residues (probability ~k²/2n) would otherwise make two probe
    // indices the IDENTICAL rotation — every anchor receiving a duplicated
    // negative, corpus-wide, with no error. The probe sequence (and cap)
    // is mirrored verbatim in the q_sample_negatives oracle SQL.
    val maxProbes = 4 * k + 64
    val offsets = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      var j = 0
      while (seen.size < k && j < maxProbes) {
        val o = hash60Jvm(j.toString, salt) % n
        seen += (if (o == 0L) 1L else o)
        j += 1
      }
      require(seen.size == k,
        s"could not derive $k distinct ring offsets in $maxProbes draws (n=$n)")
      seen.toSeq.zipWithIndex.map { case (o, i) => (i, o) }
    }
    val probes = ring.select(
      col(idCol).as("anchor_id"),
      col("rk"),
      explode(array(offsets.map { case (i, o) =>
        struct(lit(i).as("probe_idx"), lit(o).as("off"))
      }: _*)).as("__p"))
      .select(
        col("anchor_id"),
        col("__p.probe_idx").as("probe_idx"),
        ((col("rk") + col("__p.off")) % n).as("rk"))
    probes
      .join(ring.withColumnRenamed(idCol, "neg_id"), Seq("rk"))
      .select(col("anchor_id"), col("probe_idx"), col("neg_id"))
  }
}
