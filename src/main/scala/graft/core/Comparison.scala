package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.Constants._
import graft.config.{DatasetParams, TestParams}

/** The four comparison reports for one dataset.
  *
  * Same shape as the reference's result dict (`comparison_job.py:251-256`,
  * keys at `common_constants.py:58-61`); `cachedFrames` additionally exposes
  * every frame the pipeline persisted so long-lived sessions can release
  * them (`unpersist()`) — the reference never unpersists, which is fine for
  * a one-shot job but leaks storage in a shared session.
  */
final case class ComparisonResult(
    overallTestReport: DataFrame,
    rowLvlTestReport: DataFrame,
    colLvlTestReport: DataFrame,
    unmatchedRecords: Map[String, DataFrame],
    private[graft] val cachedFrames: Seq[DataFrame] = Seq.empty,
    // datasetName -> error message, for datasets a continue_on_error job
    // captured instead of aborting on (each also has a FAILED overall row).
    failures: Map[String, String] = Map.empty) {
  def unpersist(): Unit = cachedFrames.foreach(_.unpersist())
}

/** The comparison engine: full-outer-join source and target on the primary
  * keys, match rows via a 128-bit salted-xxhash row checksum, re-examine
  * checksum mismatches column-by-column with a numeric tolerance, and emit
  * four reports (overall / row-level / column-level / per-column unmatched
  * extracts).
  *
  * Faithful to the reference algorithm (`comparison_job.py:186-256`) and its
  * pinned semantics (SURVEY §2.10: `MISSTING_AT_TARGET` literal, M·N−1
  * row-level duplicate counts, NULL-poisoned numeric tolerance, PASSED ⇔
  * both side counts equal matched count), but re-planned Spark-first:
  *
  *  - non-key columns are derived AFTER select/drop projection, in schema
  *    order (deterministic; fixes the reference's latent crash when
  *    select/drop removes a column, `comparison_job.py:187` vs SURVEY
  *    §2.10.1 — observable behavior is unchanged on the default path);
  *    nested struct/array columns compare STRUCTURALLY without the
  *    canonicalization flag — the xxhash checksum and the null-safe
  *    per-column predicate both take struct/array values natively (with an
  *    isnull marker in the hash chain so NULL and empty containers stay
  *    distinct), where the reference's string-concat checksum crashed on
  *    structs; MAP-bearing columns are routed through `to_json`
  *    automatically (Spark 4 can neither hash nor equality-compare maps)
  *    and `canonicalizeNestedTypes` remains for JSON-canonical semantics
  *    on everything nested;
  *  - the alignment join is SLIM: only the primary keys and a 16-byte
  *    (two-long) row checksum per side go through the one unavoidable wide
  *    shuffle, so its exchange ships ~24-50 bytes/row REGARDLESS of table
  *    width. Full-width rows are touched exactly twice: the columnar scan
  *    that derives the checksums, and — only when mismatches exist — a
  *    PRUNED refetch of the mismatched-present keys (broadcast semi join
  *    below [[BroadcastMismatchKeysMax]] keys, Bloom-pruned semi join
  *    above it, `operators/Pruning.scala`) that feeds the per-column
  *    tolerance pass and the extracts. The r11 predecessor carried every
  *    renamed non-key column of both sides through the full-outer shuffle
  *    and persisted the full-width joined frame — at the sf100 ladder
  *    rung that spilled ~60 GB/side and exhausted the box's scratch; the
  *    slim shape completes the same rung in bounded scratch;
  *  - the slim sides are cached PRE-PARTITIONED by the primary keys — ONE
  *    exchange per side for the whole engine. The full-outer join runs on
  *    the co-partitioned layouts (sorts only), and the match stats, side
  *    counts (the reference's four per-side actions,
  *    `comparison_job.py:67-84`, as exchange-free per-key aggregations),
  *    duplicate window, and fold-back all reuse them. Eager actions:
  *    two cache fills + the slim stats job, then — only when mismatch
  *    keys exist — the tolerance stats job over the refetched mismatch
  *    set (`comparison_job.py:101-118`). A CLEAN compare (the common case
  *    for a 100 TB regression gate) never materializes a full-width row
  *    past the checksum scan. Overall and column-level reports are built
  *    driver-side from the collected values; the row-level report stays
  *    lazy — vs the reference's seven-plus full-table jobs;
  *  - persisted frames use MEMORY_AND_DISK and are surfaced for explicit
  *    release.
  *
  * Scale notes: the full-outer join (J1) can never broadcast — it
  * shuffle-partitions both (slim) sides by the primary keys, and the
  * downstream key-wise aggregations and the fold-back reuse that hash
  * partitioning. The tolerance refetch rebuilds the M·N cross product for
  * MISMATCHED keys only, from the pruned full-width sides, and re-derives
  * the checksums deterministically — the rebuilt pair set is row-identical
  * to filtering the (no longer materialized) full-width join.
  *
  * Skew: AQE skew-join splitting (enabled in [[graft.GraftSession]],
  * demonstrated in PlanSpec) engages on the splittable joins — notably the
  * tolerance fold-back LEFT join, whose big (left) side Spark can split.
  * Spark can NOT skew-split a full-outer sort-merge join (replicating
  * either side would fabricate unmatched rows), but the alignment join is
  * structurally protected: its keys are the PRIMARY keys, so a hot key can
  * only come from duplicated PKs — a data-quality defect this engine
  * exists to surface (duplicate counts in the overall/row-level reports),
  * with the same M·N cross-product cost the reference pays by definition.
  * Partition-level imbalance from hash collisions of distinct keys is
  * negligible at any corpus size.
  */
object Comparison {

  /** Reference numeric set (`comparison_job.py:14-17`): membership by
    * instance equality, so `DecimalType()` means exactly DecimalType(10, 0).
    */
  private def refNumeric(dt: DataType): Boolean = dt match {
    case d: DecimalType => d == DecimalType(10, 0)
    case _ => dt.isInstanceOf[NumericType]
  }

  private def isNumeric(dt: DataType, params: TestParams): Boolean =
    if (params.legacyDecimalComparison) refNumeric(dt)
    else dt.isInstanceOf[NumericType]

  private def isNested(dt: DataType): Boolean = dt match {
    case _: StructType | _: MapType | _: ArrayType => true
    case _ => false
  }

  /** True when the type holds a MapType at any depth. Spark 4's `xxhash64`
    * REJECTS maps (DATATYPE_MISMATCH unless the legacy allowHashOnMapType
    * flag is set) and `<=>`/`=` reject them too (maps are unorderable), so
    * the structural no-flag path cannot take map-bearing columns natively —
    * they are routed through `to_json` automatically (checksum, per-column
    * predicate, AND the unmatched extracts, whose `distinct()` is a set
    * operation maps are also banned from).
    */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: ArrayType => containsMap(a.elementType)
    case _ => false
  }

  /** Column `c` must go through `to_json` everywhere the engine touches it:
    * either the caller asked for JSON-canonical nested semantics, or the
    * type carries a map Spark can neither hash nor equality-compare.
    */
  private def jsonRouted(dt: DataType, params: TestParams): Boolean =
    isNested(dt) && (params.canonicalizeNestedTypes || containsMap(dt))

  /** Key-order canonicalization for map-bearing values. Map equality is
    * SEMANTIC — `{a:1, b:2}` and `{b:2, a:1}` are the same map — but
    * `to_json` renders entries in physical insertion order, so without
    * canonicalization the JSON route would report semantically-equal maps
    * built in different orders as unmatched (and checksum-mismatched).
    * Entries sort by key via an explicit comparator (keys are unique and
    * non-null, so the order is total; the comparator ignores the value,
    * so unorderable VALUE types — nested maps — never break the sort),
    * recursively through array elements, struct fields and map values.
    *
    * Documented limit: a map whose KEY type itself contains a map cannot
    * sort (maps are unorderable in Spark, so `k1 < k2` would not
    * resolve) — such pathological columns keep physical entry order at
    * that level, canonicalizing beneath it.
    */
  private def canonMaps(c: Column, dt: DataType): Column = dt match {
    case m: MapType =>
      val valuesCanon =
        if (containsMap(m.valueType)) transform_values(c, (_, v) => canonMaps(v, m.valueType))
        else c
      if (containsMap(m.keyType)) valuesCanon
      else map_from_entries(array_sort(map_entries(valuesCanon), (l, r) =>
        when(l("key") < r("key"), -1).when(l("key") > r("key"), 1).otherwise(0)))
    case a: ArrayType if containsMap(a.elementType) =>
      transform(c, x => canonMaps(x, a.elementType))
    case s: StructType if containsMap(s) =>
      // Rebuilding a struct loses its top-level NULL (struct() of NULL
      // fields is a present struct of NULLs) — guard it explicitly.
      when(c.isNull, lit(null).cast(s)).otherwise(
        struct(s.fields.toSeq.map(f => canonMaps(c.getField(f.name), f.dataType).as(f.name)): _*))
    case _ => c
  }

  /** The engine's one JSON rendering: canonicalized (maps key-sorted) then
    * `to_json` — per-column predicates and unmatched extracts agree on it.
    * The ROW CHECKSUM of JSON-routed columns hashes [[hashableNested]]
    * instead (r16): a native canonical form exactly as fine as this text,
    * without materializing a string per row in the one unavoidable
    * full-width scan.
    */
  private def jsonCanonical(c: Column, dt: DataType): Column = to_json(canonMaps(c, dt))

  /** Native canonical form of a JSON-routed value for the ROW CHECKSUM
    * (guide §4 — keep the hot full-width scan on expressions, not on
    * per-row Jackson string rendering). The value is rewrapped as
    * `(isnull-marker, value)` structs at EVERY level, maps become
    * key-sorted entry arrays (same comparator as [[canonMaps]], so the
    * same unorderable-map-key limit applies: physical entry order is kept
    * at that level), and float/double leaves carry an explicit
    * sign-of-zero marker. The wrapping makes hash equality of the result
    * EXACTLY as fine as equality of the canonical JSON text, which is
    * what keeps every report identical to the `to_json` checksum it
    * replaces:
    *
    *  - `xxhash64` contributes nothing for a NULL input and nothing for
    *    an empty container, so without the per-level markers `[NULL]` vs
    *    `[]`, a NULL struct vs an all-NULL-fields struct, and a value
    *    shifting across a NULL element would all FALSELY checksum-match
    *    where the JSON text distinguishes them — a checksum-matched row
    *    never reaches the per-column pass, so a false match would be
    *    silent. The markers render every null explicitly, like the JSON
    *    text does.
    *  - Spark's hash (and `<=>`) normalize `-0.0` to `0.0` while the JSON
    *    text keeps the sign; the zero-sign marker (string-cast begins with
    *    `-`, evaluated only inside the `x = 0` branch — a division probe
    *    would trip ANSI's DIVIDE_BY_ZERO) restores the distinction.
    *  - All NaN bit patterns collapse in BOTH paths (the hash goes through
    *    `doubleToLongBits`, the JSON writer prints one `NaN`), so no
    *    marker is needed there.
    *  - Maps never reach the hash as MapType (Spark 4 rejects hashing
    *    maps); the sorted entry array is hashable and order-canonical.
    *
    * The finer-only direction is also safe BY CONSTRUCTION: a checksum
    * mismatch on JSON-equal values (impossible under the mapping above,
    * but the argument matters for future edits) would only route the key
    * through the tolerance refetch, whose per-column predicate still uses
    * [[jsonCanonical]] — the key comes back "rescued" and every report is
    * unchanged; only a false MATCH could alter results, and the markers
    * exist to rule exactly that out.
    */
  private def hashableNested(c: Column, dt: DataType): Column = dt match {
    case m: MapType =>
      val entries =
        if (containsMap(m.keyType)) map_entries(c)
        else array_sort(map_entries(c), (l, r) =>
          when(l("key") < r("key"), -1).when(l("key") > r("key"), 1).otherwise(0))
      val wrapped = transform(entries, e => struct(
        hashableNested(e("key"), m.keyType).as("k"),
        hashableNested(e("value"), m.valueType).as("v")))
      struct(isnull(c).cast(IntegerType).as("n"), wrapped.as("v"))
    case a: ArrayType =>
      struct(
        isnull(c).cast(IntegerType).as("n"),
        transform(c, x => hashableNested(x, a.elementType)).as("v"))
    case s: StructType =>
      struct(
        isnull(c).cast(IntegerType).as("n"),
        struct(s.fields.toSeq.map(f =>
          hashableNested(c.getField(f.name), f.dataType).as(f.name)): _*).as("v"))
    case FloatType | DoubleType =>
      val negZero = when(c === lit(0.0) && c.cast(StringType).startsWith("-"), 1).otherwise(0)
      struct(isnull(c).cast(IntegerType).as("n"), c.as("v"), negZero.as("z"))
    case _ =>
      struct(isnull(c).cast(IntegerType).as("n"), c.as("v"))
  }

  /** Per-column match predicate (`comparison_job.py:19-34`): numerics match
    * within tolerance (NULL-vs-NULL numeric pairs yield NULL, kept — SURVEY
    * §2.10.4); everything else null-safe equality.
    */
  private def matchedPredicate(field: StructField, params: TestParams): Column = {
    val s = col(srcCol(field.name))
    val t = col(tgtCol(field.name))
    if (isNumeric(field.dataType, params)) {
      val withinTol = abs(s - t) <= lit(params.differenceTolerance)
      // Reference-numeric types keep the reference's exact semantics,
      // NULL-poisoning included. Decimals the reference does NOT treat as
      // numeric (any precision/scale other than (10,0)) get tolerance as a
      // graft extension — made null-safe so that at tolerance=0 the
      // predicate is exactly the reference's eqNullSafe, and at
      // tolerance>0 only the tolerance semantics differ, never NULL
      // handling (a NULL≡NULL decimal pair must not flip PASSED→FAILED).
      if (refNumeric(field.dataType)) withinTol
      else (s <=> t) || withinTol
    }
    else if (jsonRouted(field.dataType, params))
      jsonCanonical(s, field.dataType) <=> jsonCanonical(t, field.dataType)
    else s <=> t
  }

  /** Recursively force every nullability flag true. Two types equal under
    * this normalization differ only in flags the engine's null-safe
    * semantics never consult — `containsNull`/`valueContainsNull`/field
    * `nullable` drift routinely across parquet round-trips and
    * `withColumn` transforms and must neither reject a dataset nor force
    * a no-op cast into the hot path.
    */
  private def asNullable(dt: DataType): DataType = dt match {
    case s: StructType =>
      // Metadata.empty, not f.metadata: field metadata (parquet comments,
      // annotations) drifts as routinely as nullability flags and is just
      // as invisible to the comparison semantics — carrying it here made
      // two otherwise-identical struct columns "different" and injected a
      // no-op cast into the hot path, against this method's stated intent.
      StructType(s.fields.map(f =>
        StructField(f.name, asNullable(f.dataType), nullable = true, Metadata.empty)))
    case a: ArrayType => ArrayType(asNullable(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(asNullable(m.keyType), asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Widest-of-two numeric type, following Spark's own coercion order
    * (byte < short < int < long < float < double; decimal-vs-integral
    * widens to the covering decimal; decimal-vs-fractional goes to
    * double). Integral results are LOSSLESS; the two lossy corners —
    * long/decimal-vs-double, and a widened decimal capped at precision
    * 38 — are exactly the coercions Spark's tolerance subtraction would
    * perform anyway, so hashing the widened value never admits a false
    * match the per-column predicate wouldn't also admit.
    */
  private val NumericPrecedence =
    Seq[DataType](ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  private def decimalFor(dt: DataType): DecimalType = dt match {
    case d: DecimalType => d
    case ByteType => DecimalType(3, 0)
    case ShortType => DecimalType(5, 0)
    case IntegerType => DecimalType(10, 0)
    case LongType => DecimalType(20, 0)
    case other => throw new IllegalStateException(s"no decimal widening for $other")
  }

  /** Covering decimal of two decimals: max integer digits, max scale. When
    * that needs more than 38 total digits, INTEGER DIGITS WIN and the scale
    * shrinks to what fits (`decimal(38,20)` vs `bigint` → `decimal(38,18)`,
    * not `decimal(38,20)`): `intDigits` is ≤38 by construction (both inputs
    * fit in 38), so the upfront cast can never overflow. The alternative —
    * keeping max scale and capping precision, Spark's pre-adjustment
    * arithmetic — loses integer range instead, and an overflowing cast is
    * the one failure mode this whole reconciliation exists to prevent:
    * under non-ANSI the overflow becomes NULL before the checksum, so a
    * present 19-digit bigint silently MATCHES a null on the other side;
    * under ANSI (Spark 4's default) it throws deep in an executor task.
    * The rounding of sub-scale fractional digits this trades for is the
    * same lossy-coercion class as the long/decimal-vs-double corner
    * documented on [[NumericPrecedence]] — and it applies to BOTH sides
    * identically, so it can only forgive differences below the retained
    * scale, exactly as Spark's own precision-loss-adjusted subtraction
    * (`DecimalType.adjustPrecisionScale`) would in the tolerance pass.
    */
  private def widerDecimal(a: DecimalType, b: DecimalType): DecimalType = {
    val scale = math.max(a.scale, b.scale)
    val intDigits = math.max(a.precision - a.scale, b.precision - b.scale)
    if (intDigits + scale <= DecimalType.MAX_PRECISION) DecimalType(intDigits + scale, scale)
    else DecimalType(DecimalType.MAX_PRECISION, DecimalType.MAX_PRECISION - intDigits)
  }

  private def widerNumeric(a: DataType, b: DataType): DataType = (a, b) match {
    case _ if a == b => a
    case (_: DecimalType, FloatType | DoubleType) => DoubleType
    case (FloatType | DoubleType, _: DecimalType) => DoubleType
    case (d: DecimalType, o) => widerDecimal(d, decimalFor(o))
    case (o, d: DecimalType) => widerDecimal(decimalFor(o), d)
    case _ =>
      NumericPrecedence(
        math.max(NumericPrecedence.indexOf(a), NumericPrecedence.indexOf(b)))
  }

  /** Least common comparable type of a source/target column pair, or None
    * when the pair is irreconcilable (e.g. bigint vs string, or structs
    * with different field names). Numeric width mixes reconcile to the
    * wider type AT ANY NESTING DEPTH — `array<int>` vs `array<bigint>`
    * widens to `array<bigint>` under the same rule that makes top-level
    * int-vs-bigint legal — and nullability flags union rather than
    * reject.
    */
  private def commonType(s: DataType, t: DataType): Option[DataType] = (s, t) match {
    case _ if s == t => Some(s)
    case (a: NumericType, b: NumericType) => Some(widerNumeric(a, b))
    case (a: ArrayType, b: ArrayType) =>
      commonType(a.elementType, b.elementType)
        .map(ArrayType(_, a.containsNull || b.containsNull))
    case (a: MapType, b: MapType) =>
      for {
        k <- commonType(a.keyType, b.keyType)
        v <- commonType(a.valueType, b.valueType)
      } yield MapType(k, v, a.valueContainsNull || b.valueContainsNull)
    case (a: StructType, b: StructType)
        if a.fields.map(_.name).sameElements(b.fields.map(_.name)) =>
      val fieldTypes = a.fields.zip(b.fields).map { case (fa, fb) =>
        commonType(fa.dataType, fb.dataType)
          .map(ct => StructField(fa.name, ct, fa.nullable || fb.nullable))
      }
      if (fieldTypes.forall(_.isDefined)) Some(StructType(fieldTypes.map(_.get)))
      else None
    case _ => None
  }

  /** Fail LOUDLY — before any job runs — on column types the engine cannot
    * compare, and return the cast plan for the ones it can. Without the
    * guard, a source BIGINT vs target STRING column builds a plan whose
    * per-column predicate and checksum coerce under ANSI semantics and
    * blow up as a `CAST_INVALID_INPUT` deep inside an executor task
    * (measured: the 50-dataset consolidation bench died mid-stage-505 on
    * exactly this shape). Reconcilable mixes — numeric widths at any
    * nesting depth — return a `column -> commonType` cast entry applied
    * to BOTH sides upfront, so the row checksums hash identical
    * representations and a width-mixed but equal dataset keeps the
    * clean-compare fast path (unwidened, `xxhash64(10: int)` ≠
    * `xxhash64(10L)` would checksum-mismatch EVERY present key and force
    * the full-width refetch over the whole corpus). Pairs equal modulo
    * nullability flags need no cast at all. Both sides' MISSING columns
    * are not this check's business — the downstream projection errors on
    * those with Spark's own unresolved-column message.
    */
  private[graft] def reconcileTypes(
      src: DataFrame, tgt: DataFrame, params: DatasetParams): Map[String, DataType] = {
    val tgtTypes = tgt.schema.fields.map(f => f.name -> f.dataType).toMap
    val shared = src.schema.fields.toSeq.flatMap(f => tgtTypes.get(f.name).map(f -> _))
    val bad = shared.collect {
      case (f, t) if commonType(f.dataType, t).isEmpty =>
        s"'${f.name}' (source ${f.dataType.simpleString} vs target ${t.simpleString})"
    }
    require(bad.isEmpty,
      s"dataset '${params.datasetName}': irreconcilable source/target column types — " +
        s"cast upstream or exclude the column: ${bad.mkString(", ")}")
    shared.collect {
      case (f, t) if asNullable(f.dataType) != asNullable(t) =>
        f.name -> commonType(f.dataType, t).get
    }.toMap
  }

  /** select → drop, as the reference applies them (`comparison_job.py:38-39`). */
  private def project(df: DataFrame, params: DatasetParams): DataFrame = {
    val selected =
      if (params.selectCols == Seq("*")) df
      else df.select(params.selectCols.map(col): _*)
    if (params.dropCols.isEmpty) selected else selected.drop(params.dropCols: _*)
  }

  /** Row-checksum salts: two arbitrary odd constants prepended as the first
    * hashed field so the checksum's two 64-bit halves chain from different
    * states. 128 bits puts a same-key pair collision (a truly-different row
    * silently reported matched) at ~n²/2¹²⁹ — immaterial at any corpus size
    * this engine will ever see (10⁻²⁰ at a billion rows per key).
    */
  private val ChkSaltA = 0x9e3779b97f4a7c15L
  private val ChkSaltB = 0x85ebca77c2b2ae63L

  /** Checksum + per-side rename (`comparison_job.py:36-47`): one row
    * checksum over the non-key columns turns the N-column row match into a
    * single compare; non-key columns get the side suffix so the full-outer
    * join only coalesces the key columns. The checksum is a STRUCT of two
    * differently-salted `xxhash64` longs — internal (never reported), only
    * ever tested for null-safe equality and nullness.
    *
    * Why not the reference's `sha256(concat_ws("", cols))`
    * (`comparison_job.py:41`): (1) cost — the checksum scan is the one
    * unavoidable pass over the full-width table, and codegen'd xxhash64 on
    * native values runs an order of magnitude faster than a crypto digest
    * over a row-rendered string, with no string materialization per row;
    * (2) width — 16 bytes vs 32 on the slim alignment shuffle's dominant
    * column; (3) correctness — hashing fields through a seed CHAIN removes
    * two false-match classes the concat formula has: concatenation
    * ambiguity (`("ab","c")` ≡ `("a","bc")`) and NULL≡"" (concat_ws skips
    * NULLs entirely). The per-column report predicates already treat NULL
    * and "" as distinct (null-safe equality), so the chained hash brings
    * the row gate INTO line with the column semantics instead of silently
    * short-circuiting them. One ambiguity class survives, SHARED with the
    * reference formula: xxhash64 passes a NULL field through the chain
    * unchanged, so a value shifting across a NULL column — `("x", NULL,
    * "y")` vs `("x", "y", NULL)` — still checksum-matches, exactly as the
    * reference's `"x"+""+"y"` = `"x"+"y"+""` does; the reports stay
    * reference-faithful on it.
    *
    * Nested columns on the structural (no-flag) path additionally hash an
    * `isnull(c)` MARKER before the value: Spark's hash contributes nothing
    * for a NULL input and nothing for an empty container, so without the
    * marker a NULL array vs an empty array (or a NULL struct vs an
    * all-NULL-fields struct) would checksum-match while the per-column
    * null-safe predicate calls them different — and checksum-matched rows
    * never reach the per-column pass, making that a silent false match.
    * The marker removes the NULL-vs-empty class (and, for nested columns
    * only, the NULL-shift class above). Residual, documented: ambiguity
    * WITHIN one container value — `[NULL]` vs `[]`, or a value shifting
    * across a NULL struct field — still collides, because Spark's hash
    * skips NULL elements/fields inside a container; set
    * `canonicalizeNestedTypes` (JSON text renders NULL elements
    * explicitly) where that class matters. Map-bearing columns always go
    * through `to_json` (see [[containsMap]]) — their NULL-vs-empty is
    * already distinct (`NULL` vs `"{}"`).
    */
  private def transformSide(
      df: DataFrame,
      suffix: String => String,
      nonKeyCols: Seq[String],
      params: TestParams): DataFrame = {
    val schemaByName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val chkInputs = nonKeyCols.flatMap { c =>
      val dt = schemaByName(c)
      // JSON-routed columns hash the NATIVE canonical form (r16): the
      // checksum scan is the one unavoidable pass over the full-width
      // table, and rendering a JSON string per row there cost an order of
      // magnitude over hashing expressions; hashableNested is exactly as
      // fine as the canonical text, so match classification — and every
      // report — is unchanged. Predicates and extracts (mismatch-pruned,
      // tiny) keep the JSON rendering.
      if (jsonRouted(dt, params)) Seq(hashableNested(col(c), dt))
      else if (isNested(dt)) Seq(isnull(col(c)).cast(IntegerType), col(c))
      else Seq(col(c))
    }
    df.withColumn(suffix(ChkSumCol), struct(
        xxhash64(lit(ChkSaltA) +: chkInputs: _*).as("a"),
        xxhash64(lit(ChkSaltB) +: chkInputs: _*).as("b")))
      .withColumnsRenamed(nonKeyCols.map(c => c -> suffix(c)).toMap)
  }

  /** Append one `<col>_matched` boolean per non-key field and their AND-fold
    * (`comparison_job.py:49-64`).
    */
  private def withPerColumnMatches(
      unmatched: DataFrame,
      nonKeyFields: Seq[StructField],
      params: TestParams): DataFrame = {
    val withCols = unmatched
      .drop(AllRowsMatchedCol)
      .withColumns(
        nonKeyFields.map(f => matchedCol(f.name) -> matchedPredicate(f, params)).toMap)
    withCols.withColumn(
      AllRowsMatchedAfterTolCol,
      nonKeyFields
        .map(f => col(matchedCol(f.name)))
        .reduceOption(_ && _)
        .getOrElse(lit(true)))
  }

  /** Row-level report (`comparison_job.py:134-161`): per key — M·N−1
    * duplicate count over the joined cross product, missing-side status from
    * checksum nulls (a present row always has a non-null checksum), and the
    * final matched flag, collapsed to one row per distinct combination.
    *
    * Planned as AGGREGATE-then-window: rows collapse to one per
    * `(key, status, matched)` combo BEFORE the duplicate-count window.
    * Output-identical to the reference's window-then-`distinct` (status is
    * a per-key constant — it depends only on which sides are present — and
    * the dataset/dup-count columns are per-key constants too, so the only
    * within-key variation is `matched`), but the window sorts ~|keys|
    * 30-byte rows instead of the full M·N join with two 16-byte checksums
    * aboard, and the old post-window distinct pass disappears — at the
    * sf100 rung that sort+distinct dominated the report materialization.
    * ONE slim exchange in the whole report, pinned explicitly (see the
    * repartition below; PlanSpec asserts the count): the report plans on
    * the consumer side, outside the cached-partitioning conf scope, so
    * "reuse the slim join's partitioning" is not something the planner
    * can see there — left to itself it exchanged the slim rows twice.
    */
  private def rowLevelReport(
      datasetName: String,
      joined: DataFrame,
      keyCols: Seq[String],
      nPartitions: Int): DataFrame = {
    val keyColumns = keyCols.map(col)
    // ONE exchange for the whole report, pinned explicitly (r15): the
    // report is lazy and materializes on the CONSUMER side, outside the
    // cached-partitioning conf scope compareDataFrames sets — so the
    // planner cannot see the slim caches' hash(keys) layout there and
    // answered with TWO slim exchanges (traced: the groupBy exchanged by
    // (keys, status, matched), then the duplicate-count window re-exchanged
    // the same rows by the keys alone). Repartitioning by the KEYS first
    // costs the one exchange, and both downstream operators then consume
    // it in place: hash(keys) satisfies the aggregation's clustering (the
    // grouping set is a superset of the keys) and the window's partitionBy
    // exactly. At the sf100 rung this removes a |keys|-row exchange from
    // every row-level materialization.
    val grouped = joined
      .select(
        keyColumns
          :+ when(col(srcCol(ChkSumCol)).isNull, MissingAtSourceStatus)
            .when(col(tgtCol(ChkSumCol)).isNull, MissingAtTargetStatus)
            .otherwise(lit(PresentInBothStatus).cast(StringType))
            .as(MissingRowStatusCol)
          :+ col(AllRowsMatchedCol): _*) // project BEFORE the exchange: the
      // checksum structs must not ride the shuffle (guide §2.3); partition
      // count matches the slim caches' scale-derived layout (same sizing
      // rule, same cap — see slimPartitions in buildComparison)
      .repartition(nPartitions, keyColumns: _*)
      .groupBy(keyColumns :+ col(MissingRowStatusCol) :+ col(AllRowsMatchedCol): _*)
      .agg(count(lit(1)).as("__pairs"))
    val dupWindow = Window
      .partitionBy(keyColumns: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grouped
      .withColumn(DuplicateCountCol, sum(col("__pairs")).over(dupWindow) - 1)
      .withColumn(DatasetNameCol, lit(datasetName))
      .select(
        col(DatasetNameCol) +: keyColumns
          :+ col(DuplicateCountCol) :+ col(MissingRowStatusCol) :+ col(AllRowsMatchedCol): _*)
  }

  /** Per-column unmatched-record extracts (`comparison_job.py:120-132`),
    * built lazily for the offending columns only (names already known from
    * the collected per-column sums — no extra action).
    */
  private def unmatchedExtracts(
      datasetName: String,
      unmatchedRecords: DataFrame,
      offending: Seq[String],
      keyCols: Seq[String]): Map[String, DataFrame] = {
    val typeByName = unmatchedRecords.schema.fields.map(f => f.name -> f.dataType).toMap
    offending.map { c =>
      // Map-bearing value columns are JSON-rendered in the extract: the
      // dedup `distinct()` is a set operation Spark bans maps from (same
      // ban as the checksum/predicate paths, see containsMap) — the JSON
      // text keeps the extract materializable with the same column names.
      def sideCol(name: String): Column =
        if (containsMap(typeByName(name)))
          jsonCanonical(col(name), typeByName(name)).as(name)
        else col(name)
      s"$datasetName/$c" -> unmatchedRecords
        .where(!col(matchedCol(c)))
        .select(keyCols.map(col) :+ sideCol(srcCol(c)) :+ sideCol(tgtCol(c)): _*)
        .distinct()
    }.toMap
  }

  /** Broadcast-vs-Bloom cutover for the mismatch refetch: up to this many
    * mismatched keys the prune is a broadcast semi join (exact, zero scan
    * passes wasted); above it the key set is too large to ship as a join
    * hash table and the refetch goes through
    * [[graft.operators.Pruning.bloomPrunedSemiJoinMulti]] (~1.2 bytes/key
    * at 3% fpp, scan-side filter + exact semi join).
    *
    * Where the default sits and why (r14 mismatch-rate sweep, sf10 =
    * 15M keys/side, both branches FORCED at every rate in fresh JVMs):
    * broadcast beat Bloom 1.9× at 150k mismatched keys (34.9 s vs
    * 67.1 s) and STILL beat it 1.4× at 1.5M keys (35.5 s vs 50.7 s) —
    * the r13 1M cutover was conservative by at least 1.5×. The binding
    * constraint is memory, not speed: a single-long-key hash relation
    * costs ~48 bytes/key, so 4M keys ≈ 200 MB — comfortably inside a
    * 16 GB executor, and the broadcast cost is flat while Bloom always
    * pays its filter build plus a second pass. Deployments with wide
    * composite keys or smaller executors tune the cutover DOWN via
    * [[BroadcastMismatchKeysMaxConf]]; the sweep bench A/Bs both
    * branches through exactly that knob.
    */
  private val BroadcastMismatchKeysMax = 4000000L
  val BroadcastMismatchKeysMaxConf = "spark.graft.compare.broadcastMismatchKeysMax"

  /** Target bytes per partition of the slim cached layout (and of the
    * row-level report keyed on it). Slim rows are ~30 B regardless of
    * table width, so the default packs ~2M keys per task — inside the
    * guide's 100 MB - 1 GB shuffle-partition band once join/sort working
    * state is counted. The derived count is CAPPED at
    * `spark.sql.shuffle.partitions`, so a cluster deployment that sizes
    * that knob for its data keeps today's layout exactly; the estimate
    * only shrinks task waves when the input is provably small.
    */
  private val SlimPartitionBytes = 64L << 20
  val SlimPartitionBytesConf = "spark.graft.compare.slimPartitionBytes"

  private def broadcastMismatchKeysMax(spark: SparkSession): Long =
    spark.conf.getOption(BroadcastMismatchKeysMaxConf)
      .map(_.toLong).getOrElse(BroadcastMismatchKeysMax)

  /** The FIRST (always-run) eager job: every slim report number — per-key
    * missing/checksum-matched/mismatch flags folded to totals, plus the
    * reference's four per-side count actions (`comparison_job.py:67-84`)
    * as one exchange-free per-key aggregation per side — as tagged
    * (k, map) rows collected once.
    *
    * ZERO exchanges in this job beyond the two cache fills: the slim sides
    * are cached pre-partitioned by the primary keys, so the full-outer
    * join needs no exchange (sorts only), the per-key match aggregation
    * reuses the join's partitioning, and each side-count aggregation runs
    * directly on its side's cached layout. Per-key `max` makes every flag
    * duplicate-blind (the fold-back join only ever multiplies rows WITHIN
    * a key).
    *
    * Returns ((miss_src, miss_tgt, checksum-matched keys, mismatch keys),
    * (src_total, src_dups, tgt_total, tgt_dups)).
    */
  private def collectSlimStats(
      srcSlim: DataFrame,
      tgtSlim: DataFrame,
      joinedSlim: DataFrame,
      keyCols: Seq[String]): ((Long, Long, Long, Long), (Long, Long, Long, Long)) = {
    val keyColumns = keyCols.map(col)
    val bothPresent =
      col(srcCol(ChkSumCol)).isNotNull && col(tgtCol(ChkSumCol)).isNotNull
    val matchRow = joinedSlim
      .groupBy(keyColumns: _*)
      .agg(
        max(when(col(srcCol(ChkSumCol)).isNull, 1L).otherwise(0L)).as("ms"),
        max(when(col(tgtCol(ChkSumCol)).isNull, 1L).otherwise(0L)).as("mt"),
        max(when(col(AllRowsMatchedCol), 1L).otherwise(0L)).as("cm"),
        max(when(bothPresent && !col(AllRowsMatchedCol), 1L).otherwise(0L)).as("mk"))
      .agg(
        coalesce(sum("ms"), lit(0L)).as("miss_src"),
        coalesce(sum("mt"), lit(0L)).as("miss_tgt"),
        coalesce(sum("cm"), lit(0L)).as("chk_matched"),
        coalesce(sum("mk"), lit(0L)).as("mismatch_keys"))
      .select(
        lit("match").as("k"),
        map(
          lit("miss_src"), col("miss_src"), lit("miss_tgt"), col("miss_tgt"),
          lit("chk_matched"), col("chk_matched"),
          lit("mismatch_keys"), col("mismatch_keys")).as("m"))
    // total = Σ per-key counts, dups = #keys with count > 1 — identical by
    // construction to the reference's four side actions; each side's
    // per-key count aggregates its own cached hash(keys) layout, no
    // exchange, no source re-scan.
    def sideRow(slim: DataFrame, tag: String, totalKey: String, dupsKey: String): DataFrame =
      slim
        .groupBy(keyColumns: _*)
        .agg(count(lit(1)).as("c"))
        .agg(
          coalesce(sum(col("c")), lit(0L)).as("total"),
          coalesce(sum(when(col("c") > 1, 1L)), lit(0L)).as("dups"))
        .select(
          lit(tag).as("k"),
          map(lit(totalKey), col("total"), lit(dupsKey), col("dups")).as("m"))
    val byK = matchRow
      .unionByName(sideRow(srcSlim, "side_src", "src_total", "src_dups"))
      .unionByName(sideRow(tgtSlim, "side_tgt", "tgt_total", "tgt_dups"))
      .collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1))
      .toMap
    val mk = byK("match")
    val ss = byK("side_src")
    val st = byK("side_tgt")
    ((mk("miss_src"), mk("miss_tgt"), mk("chk_matched"), mk("mismatch_keys")),
      (ss("src_total"), ss("src_dups"), st("tgt_total"), st("tgt_dups")))
  }

  /** The SECOND eager job (mismatch keys only): tolerance rescues and the
    * per-column mismatch sums (`comparison_job.py:101-118`) over the
    * refetched mismatch set.
    *
    * A key counts as RESCUED iff some refetched pair passes the full
    * tolerance fold (`<=> true`, matching the fold-back's null-dropping
    * filter) AND no pair of that key already checksum-matched (the
    * [[graft.Constants.ChkMatchedKeyCol]] flag — without it a duplicated
    * PK with one matching and one tolerance-passing pair would count
    * twice). Per-column sums count after-tolerance-unmatched ROWS whose
    * predicate is strictly false — a NULL-poisoned predicate counts 0,
    * like the reference.
    */
  private def collectToleranceStats(
      afterTolerance: DataFrame,
      keyCols: Seq[String],
      nonKeyCols: Seq[String]): (Long, Map[String, Long]) = {
    val tolTrue = col(AllRowsMatchedAfterTolCol) <=> lit(true)
    val perKey =
      Seq(
        max(when(tolTrue, 1L).otherwise(0L)).as("tolm"),
        max(when(col(ChkMatchedKeyCol), 1L).otherwise(0L)).as("chkm")) ++
        nonKeyCols.zipWithIndex.map { case (c, i) =>
          sum(when(!tolTrue && when(!col(matchedCol(c)), true).otherwise(false), 1L)
            .otherwise(0L)).as(s"cs$i")
        }
    val totals =
      Seq(
        coalesce(
          sum(when(col("tolm") === 1L && col("chkm") === 0L, 1L).otherwise(0L)),
          lit(0L)).as("rescued")) ++
        nonKeyCols.indices.map(i => coalesce(sum(col(s"cs$i")), lit(0L)).as(s"cs$i"))
    val row = afterTolerance
      .groupBy(keyCols.map(col): _*)
      .agg(perKey.head, perKey.tail: _*)
      .agg(totals.head, totals.tail: _*)
      .collect()(0)
    (row.getLong(0),
      nonKeyCols.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 1) }.toMap)
  }

  /** Overall report (`comparison_job.py:66-99`): one row of per-side
    * count/duplicate/missing maps plus PASSED ⇔ `source_count ==
    * matched_count == target_count`. Built driver-side from the collected
    * stats — no further Spark jobs.
    */
  private def overallReport(
      spark: SparkSession,
      datasetName: String,
      sideTotals: (Long, Long, Long, Long),
      missSrc: Long,
      missTgt: Long,
      matchedCount: Long): DataFrame = {
    import spark.implicits._
    val (srcTotal, srcDups, tgtTotal, tgtDups) = sideTotals
    Seq((
      datasetName,
      Map(SourceCol -> srcTotal, TargetCol -> tgtTotal),
      matchedCount,
      Map(SourceCol -> srcDups, TargetCol -> tgtDups),
      Map(SourceCol -> missSrc, TargetCol -> missTgt),
      if (srcTotal == matchedCount && tgtTotal == matchedCount) PassedStatus
      else FailedStatus))
      .toDF(DatasetNameCol, CountCol, MatchedCountCol, DuplicateCountCol,
        MissingRowsCol, TestStatusCol)
  }

  /** Column-level report (`comparison_job.py:101-118`) built driver-side
    * from the sums [[sideAndColumnStats]] already collected — one row per
    * non-key column, in schema order, zero Spark jobs.
    */
  private def columnLevelReport(
      spark: SparkSession,
      datasetName: String,
      nonKeyCols: Seq[String],
      colSums: Map[String, Long]): DataFrame = {
    import spark.implicits._
    nonKeyCols.map(c => (datasetName, c, colSums(c)))
      .toDF(DatasetNameCol, ColNameCol, UnmatchedRowsCountCol)
  }

  /** One FAILED overall row for a dataset whose read or compare THREW —
    * the `continue_on_error` capture shape. Zero counts are unambiguous:
    * a genuinely empty dataset compares PASSED (0 == 0 == 0), so
    * FAILED-with-zeros can only mean "this dataset never ran"; the error
    * text travels in [[ComparisonResult.failures]].
    */
  private[graft] def failedOverallReport(
      spark: SparkSession, datasetName: String): DataFrame = {
    import spark.implicits._
    Seq((
      datasetName,
      Map(SourceCol -> 0L, TargetCol -> 0L),
      0L,
      Map(SourceCol -> 0L, TargetCol -> 0L),
      Map(SourceCol -> 0L, TargetCol -> 0L),
      FailedStatus))
      .toDF(DatasetNameCol, CountCol, MatchedCountCol, DuplicateCountCol,
        MissingRowsCol, TestStatusCol)
  }

  /** The core pipeline (`compare_dataframes`, `comparison_job.py:186-256`). */
  def compareDataFrames(
      spark: SparkSession,
      sourceDf: DataFrame,
      targetDf: DataFrame,
      params: DatasetParams): ComparisonResult = {
    // The slim sides are cached PRE-PARTITIONED by the primary keys, and
    // everything keyed downstream — the full-outer join, the match stats,
    // the side counts, the fold-back — reuses that one exchange per side.
    // InMemoryRelation only keeps a cached layout visible to the planner
    // under canChangeCachedPlanOutputPartitioning=false (the PageRank
    // lesson, Graphs.scala); scope it around construction exactly.
    val cacheKey = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val prevCacheConf = spark.conf.getOption(cacheKey)
    spark.conf.set(cacheKey, "false")
    try buildComparison(spark, sourceDf, targetDf, params)
    finally {
      prevCacheConf match {
        case Some(v) => spark.conf.set(cacheKey, v)
        case None => spark.conf.unset(cacheKey)
      }
    }
  }

  private def buildComparison(
      spark: SparkSession,
      sourceDf: DataFrame,
      targetDf: DataFrame,
      params: DatasetParams): ComparisonResult = {
    val keyCols = params.primaryKeys
    val keyColumns = keyCols.map(col)
    val rawSrc = project(sourceDf, params)
    val rawTgt = project(targetDf, params)
    // Width-mixed columns (keys included — the slim sides' co-partitioning
    // requires identical key types) cast to the common type on BOTH sides
    // before anything hashes, joins or compares: checksum, predicate and
    // extracts all see one representation, so width-mixed equal datasets
    // keep the clean-compare fast path and the reports show the widened
    // values the tolerance pass compares anyway.
    val widen = reconcileTypes(rawSrc, rawTgt, params)
    def widened(df: DataFrame): DataFrame =
      if (widen.isEmpty) df
      else df.withColumns(widen.map { case (c, t) => c -> col(c).cast(t) })
    val projectedSrc = widened(rawSrc)
    val projectedTgt = widened(rawTgt)
    // Deterministic schema order, derived post-projection (SURVEY §2.10.1-2).
    val nonKeyCols = projectedSrc.columns.toSeq.filterNot(keyCols.contains)
    val nonKeyFields =
      projectedTgt.schema.fields.toSeq.filter(f => nonKeyCols.contains(f.name))

    // Full-width transformed sides stay LAZY — consumed by the slim
    // projection below (one columnar scan) and, only when mismatches
    // exist, by the pruned refetch (a second, key-pruned scan). NOT
    // persisted: at 100 TB a full-width persist is exactly the scratch
    // footprint the slim alignment exists to avoid.
    val srcFull = transformSide(projectedSrc, srcCol, nonKeyCols, params.testParams)
    val tgtFull = transformSide(projectedTgt, tgtCol, nonKeyCols, params.testParams)

    // Slim sides: (keys, 16-byte checksum), hash-partitioned by the keys
    // and cached columnar. Materialized EAGERLY before any downstream plan
    // is built — an unmaterialized InMemoryRelation does not report its
    // partitioning, and every keyed consumer below (join, stats, side
    // counts) would plan its own exchange of the very rows this layout
    // exists to shuffle once (the sf100 profile measured the previous
    // shape's separate side-count subtree at ~80 s of re-scan + re-shuffle).
    def slimProjected(full: DataFrame, chk: String): DataFrame =
      full.select(keyColumns :+ col(chk): _*)
    // SCALE-ADAPTIVE slim layout width (guide §2.2): the cached layout's
    // partition count is derived from the ESTIMATED slim bytes (Catalyst
    // plan stats — key columns + 16-byte checksum, so ~30 B/row at any
    // table width), targeting [[SlimPartitionBytes]] per partition and
    // capped at the session's shuffle partitions. The previous shape used
    // spark.sql.shuffle.partitions unconditionally — right at cluster
    // scale (the cap keeps that behavior bit-identical there), but at
    // small inputs it spread kilobyte partitions over dozens of tasks and
    // every downstream stage (join, stats, window, fold-back) paid a full
    // task-launch wave for microseconds of work per task; AQE cannot
    // repair it because the engine deliberately pins cached-plan
    // partitioning (canChangeCachedPlanOutputPartitioning=false), which
    // also disables coalescing inside the cached plans. Both sides use
    // the SAME count, so the full-outer join stays exchange-free.
    val slimPartitions: Int = {
      val targetBytes = spark.conf.getOption(SlimPartitionBytesConf)
        .map(_.toLong).getOrElse(SlimPartitionBytes)
      val est = Seq(
        slimProjected(srcFull, srcCol(ChkSumCol)),
        slimProjected(tgtFull, tgtCol(ChkSumCol)))
        .map(_.queryExecution.optimizedPlan.stats.sizeInBytes).max
      val wanted = (est + targetBytes - 1) / targetBytes
      // Parallelism floor of min(4, defaultParallelism): plan-stats bytes
      // are a rough LOWER bound on useful parallelism (projection-scaled
      // scan sizes underestimate the checksum-bearing slim rows), and an
      // underestimate serializes every keyed stage of the engine onto one
      // core — measured +0.3-0.7 s on the flat-column scenarios at sf0.1.
      // The floor bounds that harm at the cost of at most 3 extra tasks
      // per stage wave (~10 ms each); at any real size the bytes-derived
      // count dominates and the floor is inert.
      val floor = BigInt(math.min(4, spark.sparkContext.defaultParallelism))
      wanted
        .max(floor)
        .min(BigInt(spark.sessionState.conf.numShufflePartitions))
        .max(BigInt(1))
        .toInt
    }
    def slimSide(full: DataFrame, chk: String): DataFrame =
      slimProjected(full, chk)
        .repartition(slimPartitions, keyColumns: _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
    val srcSlim = slimSide(srcFull, srcCol(ChkSumCol))
    val tgtSlim = slimSide(tgtFull, tgtCol(ChkSumCol))
    // The two fills are independent jobs; run them CONCURRENTLY (guide
    // §2.6 — actions are only sequential because the driver calls them
    // sequentially) so one side's checksum-scan tail back-fills the other
    // side's idle cores. Both caches are still fully materialized before
    // any downstream plan is built, which is what the co-partitioned
    // zero-exchange planning below requires.
    Par.runAll(Seq(() => srcSlim.count(), () => tgtSlim.count()))

    // Align the sides: the full-outer join (J1, never broadcastable) runs
    // on the co-partitioned cached layouts — sorts only, NO exchange.
    // Primary row match = checksum null-safe equality; a present row
    // always has a non-null checksum.
    //
    // The joined cache is RE-KEYED before the persist (r16): Spark reports
    // UnknownPartitioning for a full-outer SMJ's output (the coalesced key
    // columns' clustering is real but unmodeled), so every keyed consumer
    // of this cache — the match-stats aggregation, the mismatch-key frame —
    // planned its own |keys|-row exchange of the very rows the cache holds
    // (traced r16 at sf0.1: two 150k-row exchanges per mismatch scenario).
    // The explicit repartition satisfies the in-plan aggregation's
    // clustering directly (no extra exchange in the stats job — it
    // REPLACES the one the aggregation would have inserted) and, once the
    // cache is filled, mkInfo's groupBy consumes the cached layout with no
    // exchange at all. Same derived partition count as the slim sides.
    val joinedSlim = srcSlim
      .join(tgtSlim, keyCols, FullOuterJoin)
      .withColumn(AllRowsMatchedCol, col(srcCol(ChkSumCol)) <=> col(tgtCol(ChkSumCol)))
      .repartition(slimPartitions, keyColumns: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // FIRST eager stats job: every slim report number (fills the
    // joinedSlim persist as a side effect), including the mismatch-key
    // count that decides whether — and how — the refetch runs.
    val ((missSrc, missTgt, chkMatched, mismatchKeyCount), sideTotals) =
      collectSlimStats(srcSlim, tgtSlim, joinedSlim, keyCols)

    val bothPresent =
      col(srcCol(ChkSumCol)).isNotNull && col(tgtCol(ChkSumCol)).isNotNull

    // SECOND eager job, skipped entirely on a clean compare: refetch FULL
    // rows for the mismatched-present keys and run the per-column
    // tolerance pass over them. The rebuilt pair set is row-identical to
    // filtering the full-width join (checksums re-derive
    // deterministically; the !(chk <=> chk) filter drops the
    // checksum-matched pairs a duplicated PK smuggles back in).
    val (rescued, colSums, afterTolOpt, phase2Cached) =
      if (mismatchKeyCount == 0L)
        (0L, nonKeyCols.map(_ -> 0L).toMap, Option.empty[DataFrame], Seq.empty[DataFrame])
      else {
        val mkInfo = joinedSlim
          .groupBy(keyColumns: _*)
          .agg(
            max(when(col(AllRowsMatchedCol), 1L).otherwise(0L)).as("__chkm"),
            max(when(bothPresent && !col(AllRowsMatchedCol), 1L).otherwise(0L)).as("__mm"))
          .filter(col("__mm") === 1L)
          .select(keyColumns :+ (col("__chkm") === 1L).as(ChkMatchedKeyCol): _*)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val mkKeys = mkInfo.select(keyColumns: _*)
        val broadcastable = mismatchKeyCount <= broadcastMismatchKeysMax(spark)
        // The prune need not be exact here: the mkInfo inner join below is
        // an exact filter on the mismatch key set, so the Bloom path skips
        // the semi join's second shuffle of the pruned side and lets its
        // ≤fpp false positives die at that join (or at the checksum filter).
        def prune(sideFull: DataFrame): DataFrame =
          if (broadcastable) sideFull.join(broadcast(mkKeys), keyCols, LeftSemiJoin)
          else graft.operators.Pruning.bloomPruneFilter(
            sideFull, mkKeys, keyCols, keyCols, mismatchKeyCount)
        val mismatchedPresent = prune(srcFull)
          .join(prune(tgtFull), keyCols, InnerJoin)
          .filter(!(col(srcCol(ChkSumCol)) <=> col(tgtCol(ChkSumCol))))
          .join(if (broadcastable) broadcast(mkInfo) else mkInfo, keyCols, InnerJoin)
        val afterTolerance =
          withPerColumnMatches(mismatchedPresent, nonKeyFields, params.testParams)
            .persist(StorageLevel.MEMORY_AND_DISK)
        val (resc, sums) = collectToleranceStats(afterTolerance, keyCols, nonKeyCols)
        (resc, sums, Some(afterTolerance), Seq(mkInfo, afterTolerance))
      }
    val matchedCount = chkMatched + rescued

    // Fold tolerance passes back in for the row-level report (left join on
    // keys reuses the slim join's hash partitioning — no second wide
    // shuffle); stays lazy, like the report it feeds.
    val joined = afterTolOpt match {
      case None => joinedSlim
      case Some(afterTolerance) =>
        joinedSlim
          .join(
            afterTolerance
              .filter(col(AllRowsMatchedAfterTolCol))
              .select((keyCols :+ AllRowsMatchedAfterTolCol).map(col): _*),
            keyCols,
            LeftJoin)
          .withColumn(
            AllRowsMatchedCol,
            col(AllRowsMatchedCol) ||
              coalesce(col(AllRowsMatchedAfterTolCol), lit(false).cast(BooleanType)))
    }

    val colLvl = columnLevelReport(spark, params.datasetName, nonKeyCols, colSums)
    val rowLvl = rowLevelReport(params.datasetName, joined, keyCols, slimPartitions)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val offending = nonKeyCols.filter(c => colSums(c) > 0)
    val extracts = afterTolOpt match {
      case None => Map.empty[String, DataFrame]
      case Some(afterTolerance) =>
        unmatchedExtracts(
          params.datasetName,
          afterTolerance.filter(!col(AllRowsMatchedAfterTolCol)),
          offending,
          keyCols)
    }
    val overall =
      overallReport(spark, params.datasetName, sideTotals, missSrc, missTgt, matchedCount)

    ComparisonResult(
      overallTestReport = overall,
      rowLvlTestReport = rowLvl,
      colLvlTestReport = colLvl,
      unmatchedRecords = extracts,
      cachedFrames = Seq(srcSlim, tgtSlim, joinedSlim) ++ phase2Cached ++ Seq(rowLvl))
  }
}
