package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators Spark has no native plan for. */
object Temporal {

  /** Trailing-window EXACT distinct actors: for every active day, the
    * distinct `keyCol` count over the trailing `days` days — rolling
    * DAU/WAU/MAU-style engagement, computed exactly. Output:
    * (day, n_active) for each day that actually has events.
    *
    * A windowed `COUNT(DISTINCT)` has no native Spark plan (distinct
    * aggregates can't be window functions), and per-day set-union on the
    * driver doesn't distribute. Instead: collapse to distinct (day, key)
    * pairs FIRST (the big map-side-combining dedup — events collapse per
    * executor before any shuffle), then each surviving pair votes into the
    * `days` windows it serves via a narrow explode, and one hash
    * aggregation counts distinct keys per target day. Shuffle volume is
    * `days × |distinct pairs|` — independent of raw event count, the term
    * a 100 TB event log actually needs bounded. Target days are clipped to
    * days observed in the data (no phantom trailing days past the last
    * event).
    */
  def rollingDistinct(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      days: Int = 7): DataFrame = {
    require(days >= 1, s"days must be >= 1, got $days")
    val daily = df
      .select(to_date(col(tsCol)).as("day"), col(keyCol).as("k"))
      .where(col("day").isNotNull && col("k").isNotNull)
      .distinct()
    val observed = daily.select(col("day").as("obs_day")).distinct()
    daily
      .select(explode(sequence(col("day"), date_add(col("day"), days - 1))).as("obs_day"),
        col("k"))
      .join(observed, Seq("obs_day"), "left_semi")
      .groupBy(col("obs_day").as("day"))
      .agg(countDistinct(col("k")).as("n_active"))
  }

  /** The 100 TB shape of [[rollingDistinct]]: per-day HLL sketches vote
    * into their trailing windows and union per target day (DataSketches
    * union = register-wise max, so overlapping days never double-count).
    * Shuffle volume is `days × |active days| × sketch size` — independent
    * of the KEY CARDINALITY that makes exact rolling distinct expensive
    * (a billion distinct users/day ship as ~KB sketches instead of 7×10⁹
    * exploded pairs). Estimate error is the standard HLL ~1–2%; the spec
    * pins it against the exact path.
    */
  def rollingDistinctApprox(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      days: Int = 7): DataFrame = {
    require(days >= 1, s"days must be >= 1, got $days")
    val daily = df
      .select(to_date(col(tsCol)).as("day"), col(keyCol).as("k"))
      .where(col("day").isNotNull && col("k").isNotNull)
      .groupBy("day")
      .agg(hll_sketch_agg(col("k")).as("__sk"))
    val observed = daily.select(col("day").as("obs_day"))
    daily
      .select(explode(sequence(col("day"), date_add(col("day"), days - 1))).as("obs_day"),
        col("__sk"))
      .join(observed, Seq("obs_day"), "left_semi")
      .groupBy(col("obs_day").as("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("n_active_approx"))
  }

  /** As-of (last-known-value) join: attach to every left row the
    * `valueCols` of the LATEST right row with the same `keys` and
    * `rightTs <= leftTs` (inclusive), plus the matching right timestamp as
    * `<rightTs><suffix>`; left rows with no qualifying right row keep
    * NULLs (left-outer semantics — same as DuckDB/pandas ASOF LEFT JOIN).
    *
    * Spark-first plan: a range theta-join (`l.ts >= r.ts` + per-row argmax)
    * would explode to |L|·|R| pairs per key before pruning. Instead the two
    * sides are UNIONed with a side marker and a running
    * `last(..., ignoreNulls)` window ordered by (ts, side) carries each
    * key's most recent right values forward into the left rows — ONE
    * shuffle+sort on (keys, ts) over |L|+|R| rows, the same cost class as
    * a groupBy, independent of match distance and right-side density.
    * Right rows order before left rows at equal ts, which makes the match
    * inclusive.
    *
    * Requirements: the sides share key column names; right rows are unique
    * per (keys, rightTs) — pre-aggregate otherwise, or results depend on
    * sort ties. The matched right row is carried WHOLESALE as one struct
    * through a single `last(ignoreNulls)` window, so every output value
    * and the matched timestamp always come from the SAME right row — a
    * NULL in a matched row's value column attaches as NULL (exactly
    * DuckDB/pandas ASOF), never a stale (older-row value, newer-row ts)
    * mix. With `tolerance` the ts columns must be numeric: matches older
    * than `leftTs − tolerance` (exclusive) are nulled out, rows kept.
    */
  /** Retention cohorts: bucket every actor by its FIRST active time bucket
    * (the cohort), then count distinct actors per (cohort, offset) cell —
    * the classic "of the users who arrived in week W, how many were still
    * active k weeks later" triangle, the engagement readout every event
    * log eventually needs.
    *
    * Scale shape — no self-join, ONE wide shuffle: raw events collapse to
    * per-user active-bucket SETS in a single user-keyed aggregation
    * (collect_set partial-combines map-side, so shuffle volume is distinct
    * (user, bucket) pairs, not raw events), the cohort is `array_min` of
    * the set (no second aggregation, no cohort join back), and a narrow
    * explode feeds the final (cohort, offset) count — whose input rows are
    * distinct per (user, bucket) BY CONSTRUCTION, so a plain count IS the
    * distinct-user count. Per-user state is bounded by the calendar (a
    * user can occupy at most #buckets-in-history cells), which is what
    * keeps the aggregation safe at 100 TB of events.
    *
    * Output: `(cohort_bucket, offset_buckets, n_users)`; offset 0 is the
    * cohort's own size.
    */
  def retentionCohorts(
      df: DataFrame,
      keyCol: String,
      tsNsCol: String,
      bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"bucketNs must be positive, got $bucketNs")
    // floor bucketing via the compensated-div idiom: Spark's `div`
    // truncates toward zero while DuckDB's `//` floors, so a bare div
    // diverges on pre-1970 (negative) timestamps; (s - pmod(s,n)) div n
    // floors identically on both engines for any sign
    df.filter(col(keyCol).isNotNull && col(tsNsCol).isNotNull)
      .select(col(keyCol).as("__u"),
        call_function("div",
          col(tsNsCol) - pmod(col(tsNsCol), lit(bucketNs)),
          lit(bucketNs)).as("__b"))
      .groupBy("__u")
      .agg(collect_set(col("__b")).as("__bs"))
      .select(array_min(col("__bs")).as("__c"), explode(col("__bs")).as("__b"))
      .groupBy(col("__c").as("cohort_bucket"),
        (col("__b") - col("__c")).as("offset_buckets"))
      .agg(count(lit(1)).as("n_users"))
  }

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None,
      suffix: String = "_asof"): DataFrame = {
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lCols = left.columns.toSeq
    val tsOut = s"$rightTs$suffix"
    val outCols = valueCols.map(c => s"$c$suffix") :+ tsOut
    require(!lCols.exists(outCols.contains),
      s"left frame already defines ${outCols.filter(lCols.contains).mkString(", ")}")
    val payload = lCols.filterNot(keys.contains)
    val lSel = keys.map(col) ++
      Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
      payload.map(col) ++
      valueCols.map(c => lit(null).cast(rTypes(c)).as(s"$c$suffix"))
    val rSel = keys.map(col) ++
      Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
      payload.map(c => lit(null).cast(lTypes(c)).as(c)) ++
      valueCols.map(c => col(c).as(s"$c$suffix"))
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    // one window spec and ONE carried expression → a single Window operator
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The whole right row rides as one struct (non-null exactly on right
    // rows), so last(ignoreNulls) picks the latest qualifying right row
    // WHOLESALE — per-column windows would pair an older non-null value
    // with a newer row's timestamp whenever the matched row has a NULL.
    val rightStruct = when(
      col("__side") === 0,
      struct(col("__ts").as("__rts") +: valueCols.map(c => col(s"$c$suffix")): _*))
    val carried = u
      .withColumn("__asof", last(rightStruct, ignoreNulls = true).over(w))
      .withColumns(valueCols.map(c =>
        s"$c$suffix" -> col(s"__asof.$c$suffix")).toMap)
      .withColumn(tsOut, col("__asof.__rts"))
    val leftRows = carried.filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        val inTol = col(tsOut).isNotNull && (col("__ts") - col(tsOut) <= lit(tol))
        leftRows.withColumns(
          (valueCols.map(c => s"$c$suffix" -> when(inTol, col(s"$c$suffix"))) :+
            (tsOut -> when(inTol, col(tsOut)))).toMap)
      case None => leftRows
    }
    bounded.select((lCols ++ outCols).map(col): _*)
  }

  /** Ordered-funnel completion: for every entity that performed
    * `steps.head`, the earliest in-order completion times of the remaining
    * steps — t₁ = min ts of step 1; tₖ = min ts of step k STRICTLY after
    * tₖ₋₁ and within `maxSpan` of t₁. One row per step-1 entity with
    * nullable `t_<step>` columns (NULL from the first uncompleted step on).
    *
    * Plan: one aggregation for step 1, then per further step a LEFT join
    * of that step's events back on the entity key + a re-aggregation —
    * every stage hash-partitions on the SAME key, so the k-step funnel is
    * one logical shuffle by entity plus co-partitioned passes; per-step
    * event frames are filtered before joining (each pass ships only that
    * step's events). No window over the full event stream, no
    * sessionization state.
    */
  def funnel(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxSpan: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"funnel steps must be distinct: $steps")
    require(maxSpan >= 1, s"maxSpan must be >= 1, got $maxSpan")
    val e = events.select(col(keyCol).as("__k"), col(typeCol).as("__t"), col(tsCol).as("__ts"))
    def tCol(s: String) = s"t_$s"
    var acc = e.filter(col("__t") === steps.head)
      .groupBy("__k").agg(min(col("__ts")).as(tCol(steps.head)))
    steps.sliding(2).foreach {
      case Seq(prev, cur) =>
        val carried = acc.columns.toSeq // __k, t_<s1> … t_<prev>
        val cand = when(
          col("__ts") > col(tCol(prev)) &&
            col("__ts") <= col(tCol(steps.head)) + maxSpan,
          col("__ts"))
        acc = acc
          .join(e.filter(col("__t") === cur).select(col("__k"), col("__ts")), Seq("__k"), "left")
          .groupBy(carried.map(col): _*)
          .agg(min(cand).as(tCol(cur)))
      case _ => () // single-step funnel
    }
    acc.withColumnRenamed("__k", keyCol)
  }

  /** Binned range join: inner-join every left row (a point at `leftTs`) to
    * the right rows sharing `keys` whose `[rightStart, rightEnd]` interval
    * (inclusive both ends) contains it.
    *
    * Spark plans a bare `l.ts BETWEEN r.start AND r.end` theta-join as an
    * equi-join on the keys with the range as a POST-JOIN filter — a per-key
    * cross product (and with no keys at all, a broadcast nested-loop join).
    * Binning restores a true equi-join: each interval explodes into the
    * ⌈span/binWidth⌉+1 bins it overlaps, each point lives in exactly ONE
    * bin, and the join key becomes (keys, bin) — shuffle volume is
    * |L| + |R|·(avg span/binWidth), with no cross product anywhere. A
    * point's bin is unique, so a pair cannot match twice and no post-join
    * dedup is needed (the residual BETWEEN filter keeps semantics exact).
    *
    * Sizing: pick `binWidth` near the TYPICAL interval span — ~1-2 explode
    * rows per interval; residual bin-population skew mirrors real data
    * density, which AQE's skew-join splitting handles (the join is a plain
    * inner equi-join, always splittable). `maxBinsPerInterval` fails fast
    * on a mis-sized binWidth instead of silently exploding a 10⁶-bin
    * interval. Timestamps must be integral (µs/ns longs): binning uses
    * exact integer `div`, never double division (epoch nanos exceed
    * double's 53-bit mantissa).
    *
    * Columns: all left columns plus `rightCols` (which must not collide).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightStart: String,
      rightEnd: String,
      binWidth: Long,
      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(maxBinsPerInterval >= 1, s"maxBinsPerInterval must be >= 1, got $maxBinsPerInterval")
    val rightCols = right.columns.toSeq.filterNot(keys.contains)
    val collisions = left.columns.toSeq.intersect(rightCols)
    require(collisions.isEmpty, s"column collision between sides: ${collisions.mkString(", ")}")
    def binOf(c: String): Column = expr(s"CAST(`$c` AS BIGINT) div $binWidth")

    val l = left.withColumn("__bin", binOf(leftTs))
    val r = right
      .filter(col(rightEnd) >= col(rightStart))
      .withColumn("__b0", binOf(rightStart))
      // the guard lives INSIDE the sequence bound so Catalyst cannot prune
      // it: an unreferenced guard column would be optimized away unevaluated
      .withColumn(
        "__b1",
        when(
          binOf(rightEnd) - col("__b0") >= maxBinsPerInterval,
          raise_error(concat(
            lit(s"rangeJoin: interval spans >= $maxBinsPerInterval bins of width $binWidth at "),
            col(rightStart).cast("string"), lit(".."), col(rightEnd).cast("string"),
            lit(" — raise binWidth or maxBinsPerInterval"))).cast("long"))
          .otherwise(binOf(rightEnd)))
      .withColumn("__bin", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")
    l.join(r, keys :+ "__bin")
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop("__bin")
  }

  /** Rolling z-score anomaly flags over a per-key ordered series,
    * integer-exact so the result is bit-identical in any engine.
    *
    * The value is fixed-point-quantized (`floor(value * scale)` — exact on
    * identical IEEE doubles), then each row is compared against the
    * TRAILING window of the previous `lookback` rows (the row itself
    * excluded, so an outlier never masks itself). The textbook test
    * `|x - mean| > z * stddev` is cleared of division and sqrt by
    * multiplying through by `n²`:
    *
    *   (n·x − S1)² > z² · (n·S2 − S1²)        [S1=Σv, S2=Σv², n=window count]
    *
    * which is all BIGINT arithmetic. Rows with fewer than `minN` prior
    * rows are never flagged (cold start).
    *
    * Scale design: ONE shuffle on `keys`; count/sum/sum-of-squares ride a
    * single ROWS frame over one sort, and the flag is a codegen'd scalar
    * projection. Overflow bound: |scaled value| up to B needs
    * `lookback · B² · max(lookback, z²) < 2⁶³` — e.g. B=10⁶, lookback=10³,
    * z=3 gives 10³·10¹²·10³ = 10¹⁸ < 9.2·10¹⁸. The default scale keeps
    * typical metric ranges far inside that.
    */
  def rollingAnomaly(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      scale: Long = 1000L,
      lookback: Int = 50,
      z: Long = 3L,
      minN: Int = 10): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols must be non-empty")
    require(lookback >= 1 && minN >= 1 && z >= 1 && scale >= 1,
      "lookback, minN, z and scale must be positive")
    val scratch = Seq("__v", "__n", "__s1", "__s2")
    require(scratch.forall(c => !df.columns.contains(c)),
      s"input already has a ${scratch.mkString("/")} column (reserved scratch names) — rename it first")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback.toLong, -1L)
    val dev = col("__n") * col("__v") - col("__s1")
    val flagged = df
      .withColumn("__v", floor(col(valueCol) * scale))
      .withColumn("__n", count(col("__v")).over(w))
      .withColumn("__s1", sum(col("__v")).over(w))
      .withColumn("__s2", sum(col("__v") * col("__v")).over(w))
    flagged.select(
      (keys ++ orderCols).map(col) :+
        col("__v").as("v_scaled") :+
        col("__n").as("win_n") :+
        (col("__n") >= minN &&
          dev * dev > lit(z * z) * (col("__n") * col("__s2") - col("__s1") * col("__s1")))
          .as("is_anomaly"): _*)
  }

  /** Merge overlapping (and, within `gap`, nearly-adjacent) per-key
    * intervals into maximal disjoint spans — interval UNION, the
    * gaps-and-islands primitive behind validity-window flattening,
    * activity-coverage reports, and span-level dedup bookkeeping. An
    * interval opens a new span iff it starts strictly more than `gap`
    * after the running maximum end of every earlier interval (earlier in
    * `(start, end)` order), so containment chains (`[0,100] ⊃ [10,20]`)
    * collapse correctly where a naive `lag(end)` comparison would split
    * them.
    *
    * Plan shape: ONE shuffle by `keys` drives both window passes (running
    * max + running boundary sum share the sort), then the island
    * aggregation reuses the same partitioning — no self-join, no explode,
    * no per-key cross product, which is what makes a 100 TB validity log
    * flattenable. Output: `(keys…, span_start, span_end, n_intervals)`.
    * Columns must be integers (µs, the repo convention) so `gap`
    * arithmetic is exact.
    */
  def mergeIntervals(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      gap: Long = 0L): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(gap >= 0L, s"gap must be >= 0, got $gap")
    val scratch = Seq("__pmax", "__new", "__island")
    require(scratch.forall(c => !df.columns.contains(c)),
      s"input already has a ${scratch.mkString("/")} column (reserved scratch names) — rename it first")
    val ord = Window.partitionBy(keys.map(col): _*).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    df
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__pmax", prevMax)
      .withColumn("__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax") + gap, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys :+ "__island").map(col): _*)
      .agg(
        min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** The complement of [[mergeIntervals]]: the uncovered gaps BETWEEN a
    * key's merged spans — coverage holes in an event/validity log. Each
    * consecutive span pair emits `(gap_start = prev span_end, gap_end =
    * next span_start)`; merged spans are separated by construction
    * (anything closer than `gap` was merged), so every emitted hole has
    * positive width > `gap`. One extra lag window on the already-tiny
    * merged frame.
    */
  def intervalGaps(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      gap: Long = 0L): DataFrame = {
    val merged = mergeIntervals(df, keys, startCol, endCol, gap)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("span_start"))
    merged
      .withColumn("__prev_end", lag(col("span_end"), 1).over(w))
      .filter(col("__prev_end").isNotNull)
      .select(keys.map(col) :+
        col("__prev_end").as("gap_start") :+
        col("span_start").as("gap_end"): _*)
  }
}
