package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-column data profiling — the validation engine's sibling report:
  * before comparing two datasets, profile ONE (row count, per-column null
  * and exact distinct counts) to catch schema drift, null explosions, and
  * key-cardinality changes.
  *
  * Plan shape: ONE aggregation job computes every number — `count(*)`,
  * per-column null sums, and per-column `count(distinct)` — then the
  * (#columns)-row report is built driver-side, like the comparison
  * engine's column-level report. Spark expands multi-distinct aggregates
  * with an internal `expand` (one pass over the input, #distinct-columns
  * replication in the map stage, partial aggregation before the shuffle) —
  * at 100 TB that is still one scan and one shuffle of partial states, vs
  * the naive #columns separate jobs.
  *
  * All outputs are exact integers: no float mins/maxes whose string
  * formatting differs across engines — the report is bit-reproducible
  * anywhere (the q_profile oracle recomputes it in DuckDB).
  */
object Profiling {

  /** Profile `df`: one row per column — (column_name, n_rows, n_nulls,
    * n_distinct) in schema order. `n_distinct` counts distinct NON-NULL
    * values (SQL `COUNT(DISTINCT col)` semantics).
    *
    * Columns are referenced POSITIONALLY (via a rename to synthetic names),
    * so names containing dots/backticks and even duplicate names — both
    * legal in DataFrames — profile correctly instead of failing analysis
    * or binding ambiguously.
    */
  /** The single-row aggregation both profile flavors execute, un-executed —
    * exposed for plan audits (PlanSpec pins that the approx path has no
    * `Expand` node). `rsd = None` → exact `countDistinct`.
    */
  private[graft] def profileAgg(df: DataFrame, rsd: Option[Double]): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    val safe = df.toDF(cols.indices.map(i => s"__c$i"): _*)
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        cols.indices.map { i =>
          sum(when(col(s"__c$i").isNull, 1L).otherwise(0L)).as(s"__null$i")
        } ++
        cols.indices.map { i =>
          rsd match {
            case Some(r) => approx_count_distinct(col(s"__c$i"), r).as(s"__dist$i")
            case None    => countDistinct(col(s"__c$i")).as(s"__dist$i")
          }
        }
    safe.agg(aggs.head, aggs.tail: _*)
  }

  private def report(spark: SparkSession, cols: Seq[String], agg: DataFrame): DataFrame = {
    import spark.implicits._
    val row = agg.head()
    val n = row.getAs[Long]("__n")
    cols.zipWithIndex.map { case (c, i) =>
      (c, n, row.getAs[Long](s"__null$i"), row.getAs[Long](s"__dist$i"))
    }.toDF("column_name", "n_rows", "n_nulls", "n_distinct")
  }

  def profile(spark: SparkSession, df: DataFrame): DataFrame =
    report(spark, df.columns.toSeq, profileAgg(df, None))

  /** [[profile]] with HyperLogLog++ distinct counts
    * (`approx_count_distinct`, relative standard deviation `rsd`) — the
    * default choice for WIDE tables at scale. Exact multi-column distincts
    * make Spark `Expand` the input ~(#columns)× in the map stage (one row
    * copy per distinct aggregate); the HLL sketch needs no Expand and no
    * per-value dedup state, so a 30-column 100 TB profile does one plain
    * scan + one tiny shuffle of fixed-size sketches. Use [[profile]] when
    * the counts must be exact (key-cardinality equality checks); use this
    * when "how distinct is this column" is the question. Same output
    * schema and positional column binding; `n_distinct` is approximate
    * (±rsd, default 5%).
    */
  def approxProfile(spark: SparkSession, df: DataFrame, rsd: Double = 0.05): DataFrame = {
    require(rsd > 0.0 && rsd < 1.0, s"rsd out of (0,1): $rsd")
    report(spark, df.columns.toSeq, profileAgg(df, Some(rsd)))
  }

  /** Equi-width histogram of a numeric column: `nBins` bins over
    * `[lo, hi)`, out-of-range values clamped into the edge bins, NULLs
    * dropped. Output: (bin_no, lo_edge, hi_edge, n_rows) — only non-empty
    * bins appear (outer-join a bin spine if a dense axis is needed).
    *
    * Bounds are CALLER-provided on purpose: at scale the min/max either
    * come from [[profile]] or from domain knowledge, and baking a
    * bounds-discovery action in here would force a second full scan per
    * histogram. The whole thing is one scan + one ≤nBins-group hash
    * aggregation (map-side combine reduces each task to ≤nBins rows), so
    * histogramming a 100 TB column costs exactly one pass.
    */
  def histogram(df: DataFrame, column: String, nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / nBins
    // Clamp on the LongType floor result BEFORE the int cast: a far
    // out-of-range value (floor > 2^31) would otherwise overflow the cast —
    // a CAST_OVERFLOW error under ANSI mode rather than the documented
    // edge-bin clamp.
    val bin = least(lit(nBins - 1L),
      greatest(lit(0L), floor((col(column) - lo) / width))).cast("int")
    // NaN is neither clampable nor a real value: it must be dropped like
    // NULL, not land in bin 0 through floor(NaN). Harmless no-op for
    // non-floating columns (their double cast is never NaN).
    df.filter(col(column).isNotNull && !isnan(col(column).cast("double")))
      .groupBy(bin.as("bin_no"))
      .agg(count(lit(1)).as("n_rows"))
      .select(
        col("bin_no"),
        (lit(lo) + col("bin_no") * lit(width)).as("lo_edge"),
        (lit(lo) + (col("bin_no") + 1) * lit(width)).as("hi_edge"),
        col("n_rows"))
  }

  /** Distribution drift between two datasets of the same column — the
    * data-quality twin of the comparison engine: instead of row-by-row
    * equality, compare SHAPES (yesterday vs today, upstream vs downstream,
    * train vs serve). Each side is bucketed by the same [[histogram]]
    * grid; per bin the report carries both counts and the integer-exact
    * parts-per-million proportions `⌊n·10⁶/N⌋`, plus their signed delta.
    * `Σ|delta_ppm| / 2·10⁶` is the total-variation distance — an exact
    * integer drift score with none of the log/float divergence a
    * PSI/KL-based report would carry across engines.
    *
    * Scale design: each side pays exactly its histogram (one scan + one
    * ≤nBins-group shuffle with map-side combine); everything after — the
    * full-outer bin align, the totals window, the ppm math — runs on two
    * ≤nBins-row frames. No join or window ever touches row-level data,
    * so drifting a 100 TB pair costs two scans.
    */
  def driftReport(
      base: DataFrame,
      cur: DataFrame,
      column: String,
      nBins: Int,
      lo: Double,
      hi: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hb = histogram(base, column, nBins, lo, hi)
      .select(col("bin_no"), col("n_rows").as("n_base"))
    val hc = histogram(cur, column, nBins, lo, hi)
      .select(col("bin_no"), col("n_rows").as("n_cur"))
    // the single-partition window is deliberate: the frame is ≤ nBins rows
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hb.join(hc, Seq("bin_no"), "full_outer")
      .select(
        col("bin_no"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("__tb", sum(col("n_base")).over(all))
      .withColumn("__tc", sum(col("n_cur")).over(all))
      .select(
        col("bin_no"), col("n_base"), col("n_cur"),
        // nullif: an empty side yields NULL proportions, not a div-0 error
        expr("(n_base * 1000000L) div nullif(__tb, 0L)").as("p_base_ppm"),
        expr("(n_cur * 1000000L) div nullif(__tc, 0L)").as("p_cur_ppm"))
      .withColumn("delta_ppm", col("p_cur_ppm") - col("p_base_ppm"))
  }

  /** Schema drift between two frames: one row per column in either schema —
    * (column, base_type, cur_type, change ∈ added|removed|type_changed|
    * unchanged), types as Spark DDL strings. A pure METADATA operation
    * (schemas live on the driver; no job runs) — the cheap gate to run
    * BEFORE a full comparison or profile: a renamed or re-typed column
    * explains a hash mismatch in O(1) instead of O(data). Column order
    * follows the base schema, then added columns in current-schema order;
    * matching is by exact name (case-sensitive, like DataFrame resolution
    * under the default caseSensitive=false still preserves the declared
    * spelling here).
    */
  def schemaDiff(spark: SparkSession, base: DataFrame, cur: DataFrame): DataFrame = {
    val b = base.schema.fields.map(f => f.name -> f.dataType.sql)
    val c = cur.schema.fields.map(f => f.name -> f.dataType.sql)
    // a name-keyed diff is ambiguous over duplicate names (legal in Spark
    // after joins) — the map lookup would silently report the LAST
    // duplicate's type; refuse instead of reporting a wrong diff
    Seq("base" -> b, "current" -> c).foreach { case (side, fields) =>
      val dups = fields.groupBy(_._1).collect { case (n, fs) if fs.size > 1 => n }
      require(dups.isEmpty,
        s"$side schema has duplicate column names (${dups.mkString(", ")}) — " +
          "disambiguate (alias) before diffing")
    }
    val cMap = c.toMap
    val bNames = b.map(_._1).toSet
    val rows = b.map { case (name, bt) =>
      cMap.get(name) match {
        case None => (name, bt, null: String, "removed")
        case Some(ct) if ct == bt => (name, bt, ct, "unchanged")
        case Some(ct) => (name, bt, ct, "type_changed")
      }
    } ++ c.collect { case (name, ct) if !bNames.contains(name) =>
      (name, null: String, ct, "added")
    }
    import spark.implicits._
    rows.toSeq.toDF("column", "base_type", "cur_type", "change")
  }

  /** Cross-source duplicate-overlap matrix: one row per ORDERED source pair
    * (src_a, src_b) sharing at least one normalized document fingerprint,
    * with `containment = |fp(a) ∩ fp(b)| / |fp(a)|` — how much of a's
    * DISTINCT content also appears in b. The corpus-governance report
    * behind "source X is mostly a re-crawl of Y" calls: mixture-weight
    * corrections, crawl-dedup priorities, licensing audits. Directional by
    * design — a small source fully contained in a big one shows
    * (small → big) ≈ 1.0 while (big → small) stays near 0.
    *
    * Scale shape: only (fingerprint, source) pairs ever shuffle — 64-char
    * hashes, never text. One distinct, one per-fingerprint source-set fold
    * (arrays bounded by #sources, not docs), an in-row ordered-pair explode
    * over that set, and a final (a, b) count joined against the broadcast
    * per-source distinct counts. No doc×doc join anywhere.
    *
    * `maxSources` caps the per-fingerprint source set (the df-cap
    * convention of the dedup family): a fingerprint hosted on more than
    * `maxSources` sources is universal boilerplate — it carries no
    * pairwise-overlap signal but would emit k² pair structs from one row
    * (100 k mirror domains → 10¹⁰ pairs). Capped fingerprints leave the
    * overlap UNIVERSE entirely — pair counts AND the `n_a` denominators
    * both live in the capped space, so the ratio stays exact over it.
    */
  def sourceOverlap(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      maxSources: Int = 1000): DataFrame = {
    require(maxSources >= 2, s"maxSources must be >= 2, got $maxSources")
    // NULL text → NULL fingerprint: groupBy would pool every source's null
    // rows into ONE phantom "shared" fingerprint (and SQL mirrors drop NULL
    // keys at their equi-joins) — exclude them up front. No distinct here:
    // collect_set dedups sources per fingerprint with map-side partial
    // aggregation, so a pre-distinct would only add a second full shuffle.
    val fps = df.select(
        graft.functions.TextAnalysis.fingerprint(col(textCol)).as("fp"),
        col(sourceCol).as("src"))
      .filter(col("fp").isNotNull)
    val srcSets = fps.groupBy("fp").agg(collect_set(col("src")).as("__ss"))
      .filter(size(col("__ss")) <= maxSources)
    val sizes = srcSets.select(explode(col("__ss")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("n_a"))
    val pairs = srcSets
      .filter(size(col("__ss")) >= 2)
      .select(explode(flatten(transform(col("__ss"), a =>
        transform(filter(col("__ss"), b => b =!= a),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("src", "src_a")), "src_a")
      .withColumn("containment",
        col("n_shared").cast("double") / col("n_a").cast("double"))
  }

  /** Pairwise Pearson correlation over numeric columns, in ONE aggregation
    * pass and EXACT arithmetic until the final division: each column is
    * floored onto a `scale`-unit integer grid, all six moment sums per
    * pair (n, Σx, Σy, Σx², Σy², Σxy) accumulate in DECIMAL(38,0) — order-
    * independent, overflow-checked to ~10³⁸ — and
    * `r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))` is evaluated as
    * one double expression over those exact integers, so any engine
    * reproduces the bits (IEEE sqrt and division are correctly rounded;
    * the repo's fixed-point convention). Per-pair completeness: a row
    * enters a pair's sums only when BOTH columns are non-null. Output: one
    * row per pair `(col_a, col_b, n, corr)`, corr NULL for degenerate
    * (constant) columns. The whole matrix is one map-side-combined
    * aggregate to a single row — 100 TB costs one scan, p(p−1)/2·6
    * accumulators, no shuffle of data rows.
    */
  def correlationReport(
      df: DataFrame,
      cols: Seq[String],
      scale: Long = 100L): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    def scaled(c: String) = floor(col(c) * scale).cast("decimal(38,0)")
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), p) =>
      val both = col(a).isNotNull && col(b).isNotNull
      val (x, y) = (when(both, scaled(a)), when(both, scaled(b)))
      Seq(
        count(when(both, lit(1))).cast("decimal(38,0)").as(s"__n$p"),
        coalesce(sum(x), lit(0).cast("decimal(38,0)")).as(s"__sx$p"),
        coalesce(sum(y), lit(0).cast("decimal(38,0)")).as(s"__sy$p"),
        coalesce(sum(x * x), lit(0).cast("decimal(38,0)")).as(s"__sxx$p"),
        coalesce(sum(y * y), lit(0).cast("decimal(38,0)")).as(s"__syy$p"),
        coalesce(sum(x * y), lit(0).cast("decimal(38,0)")).as(s"__sxy$p"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), p) =>
      val (n, sx, sy) = (col(s"__n$p"), col(s"__sx$p"), col(s"__sy$p"))
      val (sxx, syy, sxy) = (col(s"__sxx$p"), col(s"__syy$p"), col(s"__sxy$p"))
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx
      val d2 = n * syy - sy * sy
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        n.cast("long").as("n"),
        when(d1 > 0 && d2 > 0,
          num.cast("double") / (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))))
          .as("corr"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }

  /** Per-group least-squares TREND of y over x — "is this source's quality
    * drifting?", "is per-user spend rising?" — fit at any group
    * cardinality in ONE map-side-combined aggregation: the same exact
    * DECIMAL(38,0) moment sums as [[correlationReport]], grouped by
    * `keys`, closed-form `slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)` and
    * `intercept = (Σy − slope·Σx)/n` as mirrored double expressions at the
    * end. Both columns scale onto integer grids (`xScale`/`yScale`); keep
    * x's magnitude modest (e.g. epoch SECONDS, or re-origin to a corpus
    * epoch) so nΣx² stays inside DECIMAL(38). NULL slope for degenerate
    * (single-x) groups. Output: `(keys…, n, slope, intercept)` — slope in
    * (y-units/yScale) per (x-unit/xScale).
    */
  def groupedTrend(
      df: DataFrame,
      keys: Seq[String],
      xCol: String,
      yCol: String,
      xScale: Long = 1L,
      yScale: Long = 1000000L): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(xScale >= 1 && yScale >= 1, s"scales must be >= 1: $xScale, $yScale")
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val x = when(both, floor(col(xCol) * xScale).cast("decimal(38,0)"))
    val y = when(both, floor(col(yCol) * yScale).cast("decimal(38,0)"))
    val dec0 = lit(0).cast("decimal(38,0)")
    val agged = df.groupBy(keys.map(col): _*).agg(
      count(when(both, lit(1))).cast("decimal(38,0)").as("__n"),
      coalesce(sum(x), dec0).as("__sx"),
      coalesce(sum(y), dec0).as("__sy"),
      coalesce(sum(x * x), dec0).as("__sxx"),
      coalesce(sum(x * y), dec0).as("__sxy"))
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = num.cast("double") / den.cast("double")
    agged
      // groups with ZERO complete (x, y) observations are omitted, matching
      // the relational formulation (a WHERE-filtered GROUP BY has no row to
      // emit) — without this, an all-null group yields an n=0 row here and
      // nothing in a SQL replica
      .filter(col("__n") > 0)
      .select(
      keys.map(col) :+
        col("__n").cast("long").as("n") :+
        when(den > 0, slope).as("slope") :+
        when(den > 0,
          (col("__sy").cast("double") - slope * col("__sx").cast("double")) /
            col("__n").cast("double")).as("intercept"): _*)
  }

  /** Approximate functional-dependency discovery over candidate column
    * pairs — the schema-inference profile behind "is `lhs` a key for
    * `rhs`?" (PK candidates, denormalization checks, join-key validation
    * before a Comparison run). For each `(lhs, rhs)` pair:
    *
    *  - `n_lhs_distinct`  — distinct non-degenerate lhs groups,
    *  - `n_pairs_distinct` — distinct (lhs, rhs) combinations,
    *  - `max_rhs_per_lhs` — worst-case rhs fan-out under one lhs value,
    *  - `exact_fd`        — true iff every lhs value maps to exactly one
    *    rhs (fan-out 1 everywhere),
    *  - `conf_ppm`        — n_lhs_distinct·10⁶ / n_pairs_distinct as an
    *    INTEGER ppm (10⁶ = exact FD; lower = more violating lhs groups).
    *    Integer division keeps the column oracle-exact.
    *
    * NULL handling is relational: a NULL lhs forms its own group (GROUP BY
    * semantics) and NULL rhs values don't count toward the fan-out
    * (COUNT(DISTINCT) semantics) — an lhs group whose rhs is always NULL
    * has fan-out 0 and cannot violate the FD.
    *
    * Scale shape: one `groupBy(lhs).agg(countDistinct(rhs))` + a scalar
    * roll-up per pair — each is a two-level hash aggregation with map-side
    * partial de-duplication, no window, no sort, no data collected. Pairs
    * run as independent jobs over the same scan (each prunes to its own 2
    * columns); at 100 TB profile a few pairs per pass rather than the full
    * p² grid.
    */
  def functionalDependencies(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "pairs must be non-empty")
    pairs.map { case (l, r) =>
      df.groupBy(col(l))
        .agg(countDistinct(col(r)).as("__fanout"))
        .agg(
          count(lit(1)).as("__n_lhs"),
          coalesce(sum(col("__fanout")), lit(0L)).as("__n_pairs"),
          coalesce(max(col("__fanout")), lit(0L)).as("__max_fan"))
        .select(
          lit(l).as("lhs"),
          lit(r).as("rhs"),
          col("__n_lhs").cast("long").as("n_lhs_distinct"),
          col("__n_pairs").cast("long").as("n_pairs_distinct"),
          col("__max_fan").cast("long").as("max_rhs_per_lhs"),
          (col("__max_fan") <= 1).as("exact_fd"),
          // floor() explicitly: Spark's double→long cast truncates but
          // DuckDB's ROUNDS, so the truncation must happen before the cast
          // on both sides for the ppm grid to hash-match
          when(col("__n_pairs") > 0,
            floor(col("__n_lhs").cast("long") * lit(1000000L) / col("__n_pairs").cast("long")))
            .cast("long").as("conf_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Winsorized (clipped) robust statistics per group: clip `valCol` to
    * the [lo, hi] RANK-quantile bounds of its group, then report the
    * clipped mean next to the raw mean — the outlier-robust location
    * estimate a metrics pipeline wants when a few rows are 1000× off.
    *
    * Quantiles are DISCRETE order statistics, not interpolated: the lo
    * bound is the value at 1-based rank `ceil(n·loPct/100)` (floored to
    * rank 1) in `(value, id)` order, likewise hi — every intermediate
    * stays on the integer cents grid (the rank itself is computed with
    * INTEGER ceil-division, `(n·pct + 99) / 100`, because `n * 0.05` in
    * IEEE doubles can ceil one rank higher than the exact decimal), so
    * sums are exact and the final means are single deterministic double
    * divisions. Ties break by `idCol`, making the bound total and
    * reproducible.
    *
    * Output: `(keys…, n, lo_cents, hi_cents, mean_cents, winsorized_mean_cents)`.
    *
    * Scale shape: one window (`row_number` per group, the unavoidable sort
    * behind an EXACT order statistic) + one hash agg. The sort is per
    * group and spills; for 100 TB-scale groups swap the bound computation
    * for `percentile_approx` and keep the clip/agg stages unchanged.
    */
  def winsorizedStats(
      df: DataFrame,
      keys: Seq[String],
      valCol: String,
      idCol: String,
      loPct: Int = 5,
      hiPct: Int = 95): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(loPct >= 0 && hiPct <= 100 && loPct < hiPct,
      s"need 0 <= loPct < hiPct <= 100, got $loPct, $hiPct")
    import org.apache.spark.sql.expressions.Window
    val cents = round(col(valCol) * 100).cast("long")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__cents"), col(idCol))
    val ranked = df
      .filter(col(valCol).isNotNull)
      .withColumn("__cents", cents)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
    // ceil(n·pct/100) in pure integer arithmetic: (n·pct + 99) div 100
    def ceilRank(pct: Int) =
      greatest(floor((col("__n") * lit(pct.toLong) + lit(99L)) / lit(100L)).cast("long"), lit(1L))
    val loRank = ceilRank(loPct)
    val hiRank = ceilRank(hiPct)
    val bounds = ranked
      .withColumn("__lo_rank", loRank)
      .withColumn("__hi_rank", hiRank)
      .groupBy(keys.map(col): _*)
      .agg(
        min(when(col("__rn") === col("__lo_rank"), col("__cents"))).as("lo_cents"),
        min(when(col("__rn") === col("__hi_rank"), col("__cents"))).as("hi_cents"))
    // no explicit broadcast hint: bounds has one row per GROUP, which is
    // small for low-cardinality keys but not by contract (per-user keys)
    // — let AQE size it, as semanticDecontaminate's anti-join does
    ranked
      .join(bounds, keys)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        min(col("lo_cents")).as("lo_cents"),
        min(col("hi_cents")).as("hi_cents"),
        (sum(col("__cents")).cast("double") / count(lit(1))).as("mean_cents"),
        (sum(least(greatest(col("__cents"), col("lo_cents")), col("hi_cents")))
          .cast("double") / count(lit(1))).as("winsorized_mean_cents"))
  }

  /** Exact equi-DEPTH histogram: `nBins` rank-quantile bins over an
    * INTEGRAL value column (pre-grid doubles with `round(x*100)` — the
    * cents convention every oracle-exact operator here uses). Equi-width
    * bins ([[histogram]]) starve on skewed distributions — one bin takes
    * 90% of the mass; equi-depth puts ~1/nBins of the ROWS in each bin,
    * which is what quantile-gate thresholds and drift comparisons want.
    *
    * A value is never split across bins: its bin is
    * `floor(rows_before_it · nBins / total_rows)` (pure integer
    * arithmetic), so a value whose mass straddles a boundary stays whole
    * in the earlier bin and a hot value occupying several bins' worth of
    * mass yields EMPTY bins after it rather than a lie. Output:
    * `(bin, lo, hi, n_rows, n_distinct)` — deterministic, engine-exact.
    *
    * Scale shape (the [[graft.operators.Curation.selectTokenBudget]]
    * argument): the corpus pays one hash aggregation to the DISTINCT-value
    * domain; the cumulative-sum window then runs over that domain only,
    * which is bounded by VALUE RESOLUTION (≤ a few million cents points),
    * not corpus size — so the single-partition window is a deliberate,
    * bounded choice, and 100 TB of rows never sorts.
    */
  def equiDepthHistogram(df: DataFrame, valCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val domain = df.filter(col(valCol).isNotNull)
      .groupBy(col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val before = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    domain
      .withColumn("__before", coalesce(sum(col("__c")).over(before), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(all))
      // integer floor-div: Spark `div` == DuckDB `//`, exact on the grid
      .withColumn("bin", call_function("div", col("__before") * lit(nBins.toLong), col("__n")))
      .groupBy("bin")
      .agg(
        min(col("__v")).as("lo"),
        max(col("__v")).as("hi"),
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_distinct"))
  }
}
