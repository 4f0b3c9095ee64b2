package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.{doubleDot, longDot}

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via position-explode +
  *    join + aggregate, with components quantized to fixed-point longs so
  *    dot products and norms are EXACT integer sums — bit-deterministic
  *    regardless of partitioning/summation order (floating-point sums are
  *    order-dependent). This is the correctness baseline and is fine
  *    whenever |queries| × |corpus| pairs fit a shuffle.
  *  - [[lshBucketedTopK]] — the scale path: random-hyperplane LSH signs
  *    bucket the corpus, so each query only scores its own bucket(s).
  *    Sub-linear per query; recall governed by number of planes/tables.
  *
  * An IVF-style variant is the same shape with learned centroids instead
  * of random planes — plug a centroid table into the bucket column.
  */
object Similarity {

  /** Fixed-point quantization scale for exact integer dot products: float
    * components are ~O(0.1), so ×1e8 keeps full float precision while
    * 64-dim dots stay far below Long.Max (64 · (1e8)² ≈ 6.4e17).
    */
  private val Q = 1e8

  /** Per-vector symmetric integer quantization of an embedding column —
    * the pre-shuffle compaction for high-dimensional corpora: an
    * `array<float>` costs 4 bytes/component through every bucket/band
    * join; int8 compaction quarters the shuffled volume (int16 halves it)
    * at ~0.4% (int8) worst-case per-component error. Returns
    * `struct(scale: double, q: array<tinyint|smallint>)` with
    * `component ≈ q · scale`, scale chosen per vector so the largest
    * |component| maps to the integer max. Zero/empty/null-element vectors
    * quantize under scale 1.0 (no division by zero, NULL elements → NULL
    * quanta).
    *
    * Collapse-safe by construction: the per-vector `scale` rides into the
    * lambda via `array_repeat` + `zip_with` (element-value binding), so it
    * is evaluated once per ROW even when the optimizer inlines this whole
    * expression — a `transform` lambda referencing `scale` directly would
    * re-evaluate the O(d) max per ELEMENT (see
    * [[graft.functions.TextAnalysis.shinglesOfWords]] for the same trap).
    */
  def compactEmbedding(emb: Column, bits: Int = 8): Column = {
    require(bits == 8 || bits == 16, s"bits must be 8 or 16, got $bits")
    val qMax = (1 << (bits - 1)) - 1
    val qType = if (bits == 8) "byte" else "short"
    val absMax = array_max(transform(emb, v => abs(v.cast("double"))))
    val scale = when(absMax.isNull || absMax === 0.0, lit(1.0))
      .otherwise(absMax / lit(qMax.toDouble))
    struct(
      scale.as("scale"),
      zip_with(emb, array_repeat(scale, size(emb)),
        (v, s) => round(v.cast("double") / s).cast(qType)).as("q"))
  }

  /** Inverse of [[compactEmbedding]]: `array<double>` reconstruction
    * (`q · scale`), for scoring after the compacted shuffle.
    */
  def expandEmbedding(c: Column): Column =
    zip_with(c.getField("q"), array_repeat(c.getField("scale"), size(c.getField("q"))),
      (v, s) => v.cast("double") * s)

  /** Positional explode of an embedding column, quantized:
    * (id, pos, qv = round(v·1e8) as long). Integer quantization makes every
    * downstream sum EXACT and hence independent of partitioning/summation
    * order AND of engine-specific decimal rounding — bit-identical scores
    * everywhere, at the cost of ~1e-8 relative quantization error.
    */
  private def exploded(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("id"), posexplode(col(embCol)))
      .select(col("id"), col("pos"),
        round(col("col").cast("double") * lit(Q)).cast("long").as("qv"))

  /** Σ qv² per id — exact long arithmetic. */
  private def norms(e: DataFrame): DataFrame =
    e.groupBy("id").agg(sum(col("qv") * col("qv")).as("n2"))

  /** Exact cosine top-k: for every query row (`queryPred`), the `k` nearest
    * corpus rows (`!queryPred`) by cosine similarity, ties broken by id.
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    val e = exploded(df, idCol, embCol)
    val n = norms(e)
    val q = df.filter(queryPred)
    val c = df.filter(!queryPred)
    val eq = exploded(q, idCol, embCol).withColumnRenamed("id", "query_id")
    val ec = exploded(c, idCol, embCol).withColumnRenamed("id", "cand_id")
    val dots = eq.join(ec, "pos")
      .groupBy("query_id", "cand_id")
      .agg(sum(eq("qv") * ec("qv")).as("dot"))
    val scored = dots
      .join(n.select(col("id").as("query_id"), col("n2").as("nq")), "query_id")
      .join(n.select(col("id").as("cand_id"), col("n2").as("nc")), "cand_id")
      .withColumn(
        "cosine",
        col("dot").cast("double") /
          (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
    scored
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rn") <= k)
      .select("query_id", "cand_id", "cosine")
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, pos):
    * xxhash64 parity — no RNG, identical plan on every executor; the fast
    * default. Long-valued so projections over quantized components stay
    * EXACT integer sums (bit-identical bucket signs everywhere).
    */
  def xxPlaneWeight(plane: Int, pos: Column): Column =
    when(xxhash64(lit(plane), pos) % 2 === 0, lit(1L)).otherwise(lit(-1L))

  /** Cross-engine-reproducible ±1 plane weight: parity of the first hex
    * digit of sha256("&lt;plane&gt;:&lt;pos&gt;"). Any engine with sha256 can
    * replicate the bucket assignment (DuckDB:
    * `CAST(concat('0x', substr(sha256(p || ':' || pos), 1, 1)) AS INT) % 2`),
    * which makes the whole LSH pipeline oracle-checkable. Slower than
    * [[xxPlaneWeight]] — use for validation, not the 100 TB hot path.
    */
  def shaPlaneWeight(plane: Int, pos: Column): Column =
    when(
      conv(substring(sha2(concat(lit(s"$plane:"), pos.cast("string")), 256), 1, 1), 16, 10)
        .cast("int") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))

  /** Multi-table random-hyperplane LSH: `numTables` independent tables of
    * `numPlanes` sign bits each → one (id, table, bucket) row per table.
    * All numTables·numPlanes projections come out of ONE aggregation pass
    * (a single shuffle on id); the per-table explode is narrow.
    *
    * Scale sizing: candidate cost per query ≈ numTables · E[bucket size]
    * = numTables · N / 2^numPlanes. The round-1 default (one table, 6
    * planes = 64 buckets total) went quadratic at any real N; 16 planes
    * gives 65 536 buckets per table and `numTables` independent probes
    * recover the recall a single sharper table loses.
    */
  def lshBuckets(
      df: DataFrame,
      idCol: String,
      embCol: String,
      numPlanes: Int = 16,
      numTables: Int = 8,
      weight: (Int, Column) => Column = xxPlaneWeight): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 62, s"numPlanes out of range: $numPlanes")
    val e = exploded(df, idCol, embCol)
    // Weights depend on (plane, pos) only — evaluating the hash per DATA
    // row costs rows×dims×planes hash calls (measured 2-10 s at sf0.1 with
    // the sha weight). Materialize the numTables·numPlanes weights for the
    // (tiny) distinct position set once and broadcast-join them in; per
    // data row that leaves one map probe and integer multiplies.
    val nw = numTables * numPlanes
    val weights = broadcast(
      e.select(col("pos")).distinct()
        .select(col("pos"), array((0 until nw).map(g => weight(g, col("pos"))): _*).as("__w")))
    // qv is a quantized long and weight is ±1L, so every projection is an
    // exact integer sum — bucket signs are bit-deterministic regardless of
    // partitioning or summation order.
    val projections = (0 until nw).map(g =>
      sum(col("qv") * element_at(col("__w"), g + 1)).as(s"p$g"))
    val bucketOfTable = (t: Int) =>
      (0 until numPlanes)
        .map(p => when(col(s"p${t * numPlanes + p}") >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
    e.join(weights, "pos")
      .groupBy("id")
      .agg(projections.head, projections.tail: _*)
      .select(
        col("id"),
        posexplode(array((0 until numTables).map(bucketOfTable): _*)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
  }

  /** LSH-bucketed ANN top-k: score only candidates sharing any of the
    * query's `numTables` buckets. Scoring uses the same fixed-point-exact
    * math as [[bruteForceTopK]] but in-row (a codegen'd dot over the pre-quantized
    * arrays — no position explode, no extra shuffle); the (table, bucket)
    * equi-join replaces the all-pairs join, so shuffle volume is
    * Σ buckets² per table instead of |Q|×|C|.
    */
  def lshBucketedTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      numPlanes: Int = 16,
      numTables: Int = 8,
      weight: (Int, Column) => Column = xxPlaneWeight): DataFrame = {
    // Quantized array + norm ride per row (narrow projections).
    val base = df
      .withColumn("__qa", transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")))
      .withColumn("__n2", longDot(col("__qa"), col("__qa")))
    // Alias the buckets frame's id before joining: a bare .drop("id") would
    // also drop the caller's id column whenever idCol is literally "id".
    val buckets = lshBuckets(df, idCol, embCol, numPlanes, numTables, weight)
      .withColumnRenamed("id", "__bucket_id")
    val withBucket = base.join(buckets, col(idCol) === col("__bucket_id"))
      .drop("__bucket_id")
    val q = withBucket.filter(queryPred)
      .select(col(idCol).as("query_id"), col("table"), col("bucket"),
        col("__qa").as("qa"), col("__n2").as("qn"))
    val c = withBucket.filter(!queryPred)
      .select(col(idCol).as("cand_id"), col("table"), col("bucket"),
        col("__qa").as("ca"), col("__n2").as("cn"))
    val pairs = q.join(c, Seq("table", "bucket"))
      // a pair colliding in several tables must score once
      .dropDuplicates("query_id", "cand_id")
    exactPairTopK(pairs, k)
  }

  /** Exact fixed-point cosine + top-k over candidate pairs carrying
    * (query_id, qa, qn) × (cand_id, ca, cn) — the shared verify tail of
    * every ANN variant. In-row codegen'd dot: no position explode, no
    * shuffle beyond the top-k window.
    */
  private def exactPairTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("__dot", longDot(col("qa"), col("ca")))
      .withColumn(
        "cosine",
        col("__dot").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))))
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rn") <= k)
      .select("query_id", "cand_id", "cosine")

  // ---- IVF (inverted-file) ANN ----------------------------------------

  /** Deterministic pivot hash for IVF cell seeding: 60 bits from the first
    * 15 hex chars of sha256(id) — positive, overflow-free, and replicable
    * in any engine with sha256 (DuckDB:
    * `CAST(concat('0x', substr(sha256(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)`).
    */
  def shaPivotHash(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")

  /** Lloyd refinement of IVF centroids in quantized-component space:
    * assignment is a broadcast cross join (nlist is small by construction)
    * + one hash aggregation per iteration; per-dimension means come from a
    * position explode. Centroids are `(cell, cvec array<double>)`.
    */
  private def lloydCentroids(
      corpus: DataFrame,
      idCol: String,
      nlist: Int,
      iters: Int,
      pivotHash: Column => Column): DataFrame = {
    val pivots0 = corpus
      .orderBy(pivotHash(col(idCol)), col(idCol))
      .limit(nlist)
      .select(
        col(idCol).cast("long").as("cell"),
        transform(col("__qa"), x => x.cast("double")).as("cvec"))
    (0 until iters).foldLeft(pivots0) { (c, _) =>
      val cos =
        doubleDot(col("__qa"), col("cvec")) /
          (sqrt(col("__n2").cast("double")) *
            sqrt(doubleDot(col("cvec"), col("cvec"))))
      corpus
        .crossJoin(broadcast(c))
        .withColumn("__cs", cos)
        // argmax centroid per vector without a window: struct max orders by
        // (score, -cell), so ties break toward the LOWEST cell id
        .groupBy(col(idCol))
        .agg(max(struct(col("__cs").as("s"), (-col("cell")).as("nc"), col("__qa").as("qa"))).as("b"))
        .select((-col("b.nc")).as("cell"), posexplode(col("b.qa")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), s => s.getField("m")).as("cvec"))
    }
  }

  /** IVF-style ANN top-k: partition the corpus into `nlist` cells around
    * learned coarse centroids, assign every corpus vector to its nearest
    * cell, and score each query only against its `nprobe` nearest cells'
    * members (exact fixed-point cosine, [[exactPairTopK]]).
    *
    * Unlike LSH's data-oblivious hyperplanes, cells adapt to the embedding
    * distribution — clustered corpora get balanced cells where fixed signs
    * would hash everything into a few buckets. Candidate cost per query ≈
    * nprobe · N / nlist; size `nlist ≈ √N` at corpus scale. All assignment
    * joins broadcast the (small) centroid table — the corpus is never
    * shuffled until the final per-cell candidate join.
    *
    *  - `iters = 0`: cells are the pivot vectors themselves (a
    *    deterministic sha/hash sample — "cluster pruning"). With
    *    `pivotHash = shaPivotHash` every step is exact integer math on the
    *    quantized arrays, so the WHOLE pipeline is replicable in external
    *    SQL (the catalog oracle).
    *  - `iters > 0` (default): Lloyd-refined centroids, double-precision
    *    assignment scores — the production path.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      nlist: Int = 1024,
      nprobe: Int = 8,
      iters: Int = 2,
      pivotHash: Column => Column = xxhash64(_)): DataFrame =
    exactPairTopK(
      ivfCandidatePairs(df, idCol, embCol, queryPred, nlist, nprobe, iters, pivotHash), k)

  /** The IVF candidate-generation core shared by [[ivfTopK]] and
    * [[ivfPqTopK]]: probe the `nprobe` nearest cells per query, assign
    * every corpus row to its nearest cell, and emit the per-cell candidate
    * pair frame (query_id, cand_id, qa, qn, ca, cn) — quantized arrays and
    * norms riding along for whichever scorer consumes the pairs.
    */
  private def ivfCandidatePairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      nlist: Int,
      nprobe: Int,
      iters: Int,
      pivotHash: Column => Column): DataFrame = {
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist, s"bad nlist/nprobe: $nlist/$nprobe")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val base = df
      .withColumn("__qa", transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")))
      .withColumn("__n2", longDot(col("__qa"), col("__qa")))
    val corpus = base.filter(!queryPred)
    val queries = base.filter(queryPred)

    // (centroid table, per-row assignment score against it)
    val (cents, score) =
      if (iters == 0) {
        val c = corpus
          .orderBy(pivotHash(col(idCol)), col(idCol))
          .limit(nlist)
          .select(col(idCol).cast("long").as("cell"), col("__qa").as("__cq"), col("__n2").as("__cn2"))
        // exact: integer dot of quantized arrays, like the verify tail
        (c,
          longDot(col("__qa"), col("__cq")).cast("double") /
            (sqrt(col("__n2").cast("double")) * sqrt(col("__cn2").cast("double"))))
      } else {
        val c = lloydCentroids(corpus, idCol, nlist, iters, pivotHash)
        (c,
          doubleDot(col("__qa"), col("cvec")) /
            (sqrt(col("__n2").cast("double")) *
              sqrt(doubleDot(col("cvec"), col("cvec")))))
      }

    // nprobe nearest cells per QUERY row: a row_number window is fine here
    // — the frame is |Q|·nlist and the query set is small by construction.
    def probe(rows: DataFrame, n: Int): DataFrame =
      rows
        .crossJoin(broadcast(cents))
        .withColumn("__cs", score)
        .withColumn(
          "__rn",
          row_number().over(
            Window.partitionBy(col(idCol)).orderBy(col("__cs").desc, col("cell").asc)))
        .filter(col("__rn") <= n)
        .select(col(idCol), col("cell"), col("__qa"), col("__n2"))

    // Nearest cell per CORPUS row: a window here would shuffle AND sort the
    // full N·nlist cross-join (an nlist× data explosion of a 100 TB table).
    // The max(struct) argmax instead partial-aggregates map-side inside the
    // cross-join's stage, so the only shuffle carries one row per corpus
    // vector. Tie semantics match the window's (score desc, cell asc):
    // max on (s, -cell) breaks score ties toward the LOWEST cell id.
    val assigned = corpus
      .crossJoin(broadcast(cents))
      .withColumn("__cs", score)
      .groupBy(col(idCol))
      .agg(max(struct(col("__cs").as("s"), (-col("cell")).as("nc"),
        col("__qa").as("qa"), col("__n2").as("n2"))).as("b"))
      .select(col(idCol), (-col("b.nc")).as("cell"), col("b.qa").as("__qa"), col("b.n2").as("__n2"))

    val q = probe(queries, nprobe)
      .select(col(idCol).as("query_id"), col("cell"), col("__qa").as("qa"), col("__n2").as("qn"))
    val c = assigned
      .select(col(idCol).as("cand_id"), col("cell"), col("__qa").as("ca"), col("__n2").as("cn"))
    q.join(c, Seq("cell"))
      .dropDuplicates("query_id", "cand_id")
  }

  // ---- Product quantization (PQ) ANN ----------------------------------

  /** Product-quantized approximate top-k (ADC — asymmetric distance
    * computation): the embedding is split into `m` equal subspaces, each
    * subspace learns `ncode` codebook centroids, and every corpus vector is
    * ENCODED as its per-subspace nearest-centroid ids — `m·log₂(ncode)`
    * bits per vector (4 subspaces × 16 codes = 2 bytes, vs 256 bytes for a
    * raw 64-dim float embedding: 128× compression). Queries stay
    * full-precision: each query precomputes its partial dot product against
    * every codebook entry (an `m × ncode` lookup table), and a candidate's
    * approximate dot is just the sum of `m` table lookups over its codes —
    * no raw vector is ever touched at scoring time. The score is the
    * approximate cosine `q·x̂ / (|q|·|x̂|)` against the RECONSTRUCTED
    * candidate `x̂` (per-subspace chosen centroids), so ranking degrades
    * smoothly with quantization error.
    *
    * 100 TB shape: the corpus shuffles only (cand, subspace, code) integer
    * triples joined against a BROADCAST query LUT (|Q|·m·ncode rows) —
    * the raw embedding table is read once to encode and never again.
    * Codebook assignment argmins run as broadcast joins + struct-min
    * aggregations (no window over the corpus). This module scores every
    * encoded candidate (cost |Q|·|C|·m lookup rows through a map-side
    * combined sum); at corpus scale compose with [[ivfTopK]] — IVF cells
    * prune candidates, PQ codes make the residual scoring cheap — the
    * standard IVF-PQ layout. `refine > 1` adds the standard re-rank stage:
    * exact fixed-point cosine over the k·refine ADC survivors only (raw
    * vectors touched for O(|Q|·k·refine) rows), which recovers most of the
    * recall the quantization loses.
    *
    * Determinism: codebook seeding orders corpus rows by
    * `(pivotHash(id), id)` and takes the first `ncode` per subspace. With
    * `iters = 0` and `pivotHash = shaPivotHash` every arithmetic step is
    * integer-exact (quantized components ≤ 1e7, all sums < 2^53, so the
    * double-space dots are exact), making the WHOLE encode+ADC pipeline
    * replicable in external SQL — the catalog oracle. `iters > 0` runs
    * per-subspace Lloyd refinement (double space) — the production path.
    * Within the per-(vector, subspace) argmin the |x|² term is constant,
    * so assignment minimizes `|c|² − 2·x·c` — same argmin, fewer terms —
    * with ties broken toward the lowest code id in BOTH engines.
    */
  def pqTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      m: Int = 4,
      ncode: Int = 16,
      iters: Int = 2,
      refine: Int = 1,
      pivotHash: Column => Column = xxhash64(_)): DataFrame = {
    val (enc, lut, queries, corpus) =
      pqModel(df, idCol, embCol, queryPred, m, ncode, iters, pivotHash)
    // ADC over EVERY encoded candidate: the (subsp, code) equi-join against
    // the broadcast LUT enumerates all query×cand pairs at m rows each
    val adc = pqAdcTopK(enc.join(broadcast(lut), Seq("subsp", "code")), k, refine)
    pqFinish(adc, queries, corpus, idCol, k, refine)
  }

  /** The PQ model core shared by [[pqTopK]] and [[ivfPqTopK]]: learn the
    * per-subspace codebooks, encode the corpus, precompute the query LUTs.
    * Returns (enc = (cand_id, subsp, code, cn2),
    * lut = (query_id, subsp, code, pdot, qn2), quantized queries, quantized
    * corpus) — the last two for the exact-refine stage.
    */
  private def pqModel(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      m: Int,
      ncode: Int,
      iters: Int,
      pivotHash: Column => Column): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(m >= 1 && ncode >= 1, s"bad m/ncode: $m/$ncode")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // one-row metadata probe (LocalLimit pushes it to a single file read),
    // not a data collect: the subvector slicer needs the static dimension
    val dim = df.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim must divide into $m subspaces")
    val sub = dim / m
    val base = df
      .withColumn("__qa", transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")))
      .withColumn("__n2", longDot(col("__qa"), col("__qa")))
    val corpus = base.filter(!queryPred)
    val queries = base.filter(queryPred)
    // (id, __n2, subsp, xv): positional subvector explode
    def subvecs(rows: DataFrame): DataFrame = rows
      .select(col(idCol), col("__n2"),
        posexplode(array((0 until m).map(j => slice(col("__qa"), j * sub + 1, sub)): _*)))
      .withColumnsRenamed(Map("pos" -> "subsp", "col" -> "xv"))
    val corpusSub = subvecs(corpus)

    // codebook: (subsp, code, cv double array) — pivot subvectors, then
    // optional per-subspace Lloyd rounds (vanishing codes allowed, as in
    // lloydCentroids)
    val cb0 = subvecs(corpus.orderBy(pivotHash(col(idCol)), col(idCol)).limit(ncode))
      .select(col("subsp"), col(idCol).cast("long").as("code"),
        transform(col("xv"), x => x.cast("double")).as("cv"))
    val cb = (0 until iters).foldLeft(cb0) { (c, _) =>
      corpusSub
        .join(broadcast(c), "subsp")
        .withColumn("__d", doubleDot(col("cv"), col("cv")) -
          lit(2.0) * doubleDot(col("xv"), col("cv")))
        .groupBy(col(idCol), col("subsp"))
        .agg(min(struct(col("__d").as("d"), col("code"), col("xv").as("xv"))).as("b"))
        .select(col("subsp"), col("b.code").as("code"), posexplode(col("b.xv")))
        .groupBy(col("subsp"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mu"))
        .groupBy("subsp", "code")
        .agg(sort_array(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(col("subsp"), col("code"), transform(col("pm"), s => s.getField("mu")).as("cv"))
    }
    val cbn = cb.withColumn("__cn2", doubleDot(col("cv"), col("cv")))

    // encode: per (corpus row, subspace) argmin_code |c|² − 2·x·c,
    // carrying the chosen centroid's |c|² for the reconstructed norm
    val enc = corpusSub
      .join(broadcast(cbn), "subsp")
      .withColumn("__d", col("__cn2") - lit(2.0) * doubleDot(col("xv"), col("cv")))
      .groupBy(col(idCol), col("subsp"))
      .agg(min(struct(col("__d").as("d"), col("code"), col("__cn2").as("cn2"))).as("b"))
      .select(col(idCol).as("cand_id"), col("subsp"),
        col("b.code").as("code"), col("b.cn2").as("cn2"))

    // query LUT: partial dot against every codebook entry
    val lut = subvecs(queries)
      .join(broadcast(cbn), "subsp")
      .select(col(idCol).as("query_id"), col("subsp"), col("code"),
        doubleDot(col("xv"), col("cv")).as("pdot"), col("__n2").as("qn2"))
    (enc, lut, queries, corpus)
  }

  /** ADC scoring tail: from (query_id, cand_id, subsp, pdot, qn2, cn2)
    * rows — m per pair — sum partial dots (Σ pdot = approx dot,
    * Σ cn2 = |x̂|²) and keep the k·refine best per query.
    */
  private def pqAdcTopK(joined: DataFrame, k: Int, refine: Int): DataFrame =
    joined
      .groupBy("query_id", "cand_id")
      .agg(sum(col("pdot")).as("adot"), max(col("qn2")).as("qn2"), sum(col("cn2")).as("rn2"))
      .withColumn("approx_cosine",
        col("adot") / (sqrt(col("qn2").cast("double")) * sqrt(col("rn2"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("approx_cosine").desc, col("cand_id"))))
      .filter(col("rn") <= k * refine)

  /** Final PQ stage: pure-ADC output at refine = 1, exact re-rank above. */
  private def pqFinish(
      adc: DataFrame,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      k: Int,
      refine: Int): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    if (refine <= 1) adc.select("query_id", "cand_id", "approx_cosine")
    else {
      // Re-rank (the standard ADC + refinement): exact fixed-point cosine
      // over only the k·refine ADC survivors per query — raw vectors are
      // touched for O(k·refine·|Q|) rows, never the corpus. Output carries
      // the EXACT score as `cosine` (vs `approx_cosine` on the pure-ADC
      // path).
      val qv = queries.select(col(idCol).as("query_id"), col("__qa").as("qa"), col("__n2").as("qn"))
      val cv = corpus.select(col(idCol).as("cand_id"), col("__qa").as("ca"), col("__n2").as("cn"))
      exactPairTopK(
        adc.select("query_id", "cand_id").join(qv, "query_id").join(cv, "cand_id"), k)
    }
  }

  /** IVF-PQ: the standard billion-scale ANN layout, composed from the two
    * halves this module already proves separately — IVF cells PRUNE the
    * candidate set (cost ≈ nprobe·N/nlist per query instead of N), PQ codes
    * make scoring the survivors CHEAP (m LUT lookups per pair instead of a
    * dim-length dot), and the exact fixed-point re-rank over the k·refine
    * ADC winners recovers the recall quantization loses.
    *
    * 100 TB shape: the raw embedding table is read once (quantize + encode
    * + assign); after that the only per-query work is a broadcast probe of
    * the centroid table, a cell-keyed equi-join of (query, cell) against
    * the encoded candidates, m-row LUT sums per surviving pair, and raw
    * vectors touched again for O(|Q|·k·refine) rows only. Both composed
    * halves keep their individual determinism guarantees, so with
    * `iters = 0` and `pivotHash = shaPivotHash` the whole composition is
    * integer-exact and oracle-replicable (q_sim_ivfpq_topk).
    */
  def ivfPqTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      nlist: Int = 1024,
      nprobe: Int = 8,
      m: Int = 4,
      ncode: Int = 16,
      iters: Int = 2,
      refine: Int = 4,
      pivotHash: Column => Column = xxhash64(_)): DataFrame = {
    val pairs = ivfCandidatePairs(df, idCol, embCol, queryPred, nlist, nprobe, iters, pivotHash)
      .select("query_id", "cand_id")
    val (enc, lut, queries, corpus) =
      pqModel(df, idCol, embCol, queryPred, m, ncode, iters, pivotHash)
    // ADC restricted to IVF candidates: pairs×m rows join the broadcast LUT
    // on (query_id, subsp, code) — never the full query×corpus cross
    val adc = pqAdcTopK(
      pairs.join(enc, "cand_id").join(broadcast(lut), Seq("query_id", "subsp", "code")),
      k, refine)
    pqFinish(adc, queries, corpus, idCol, k, refine)
  }

  /** Embedding-cosine near-duplicate pairs within blocks: all pairs of rows
    * sharing `blockCol` (a cluster id, LSH bucket, shard key …) whose cosine
    * similarity meets `threshold`. The quantized array and its norm ride
    * each row and the dot product is an in-row codegen'd kernel — the shuffle
    * carries one array per row instead of dims exploded rows, and no
    * post-join aggregation is needed (a position-exploded variant shuffled
    * 64× the volume and paid a pair-level groupBy).
    *
    * Parallelism does NOT depend on block cardinality: each block is split
    * into ⌈size/targetChunkSize⌉ hash sub-chunks and the self-join keys on
    * (block, chunk_a, chunk_b) — a "triangle" partitioning of the per-block
    * pair matrix. A naive join on the block alone caps parallelism at the
    * number of distinct blocks (10 coarse labels = 10 tasks on any cluster)
    * and puts a whole block's quadratic pair work in ONE task; chunking
    * yields nch·(nch+1)/2 tasks per block of ≤ targetChunkSize² pairs each.
    * The cost is shuffle replication: each row ships to ~nch chunk-pair
    * keys, i.e. ~size²/targetChunkSize rows per block — negligible next to
    * the size²/2 pair evaluations that are inherent to the semantics.
    * Blocks at or below `targetChunkSize` keep a single chunk (no
    * replication, exactly the naive plan). Output is identical for any
    * `targetChunkSize`: every within-block pair is covered exactly once
    * (same-chunk pairs by the id order, cross-chunk pairs by the chunk
    * order) and the fixed-point cosine is bit-deterministic.
    *
    * For an unblocked corpus, use [[lshNearDuplicates]] (LSH buckets are
    * the block), which bounds the quadratic term itself.
    */
  def embeddingNearDuplicates(
      df: DataFrame,
      idCol: String,
      embCol: String,
      blockCol: String,
      threshold: Double,
      targetChunkSize: Int = 4096): DataFrame = {
    require(targetChunkSize >= 1, s"targetChunkSize must be >= 1, got $targetChunkSize")
    val e = df
      .select(
        col(idCol).as("id"), col(blockCol).as("blk"),
        transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")).as("qa"))
      .withColumn("n2", longDot(col("qa"), col("qa")))
    // Per-block chunk count from one scalar-only aggregation; the join back
    // reuses the aggregation's hash partitioning on blk.
    val chunks = e.groupBy("blk").agg(
      ceil(count(lit(1)).cast("double") / lit(targetChunkSize)).cast("int").as("__nch"))
    val ec = e.join(chunks, "blk")
      .withColumn("__c", pmod(xxhash64(col("id")), col("__nch")).cast("int"))
    // Triangle enumeration: a row in chunk c serves as the LEFT element of
    // chunk pairs (c, j) for j ∈ [c, nch) and as the RIGHT element of
    // (i, c) for i ∈ [0, c]. Every unordered row pair meets exactly once:
    // cross-chunk pairs at their unique (min, max) chunk key, same-chunk
    // pairs under the id-order predicate.
    val a = ec.select(col("blk"), col("id"), col("qa"), col("n2"),
      col("__c").as("__ci"), explode(sequence(col("__c"), col("__nch") - 1)).as("__cj"))
    val b = ec.select(col("blk"), col("id"), col("qa"), col("n2"),
      explode(sequence(lit(0), col("__c"))).as("__ci"), col("__c").as("__cj"))
    a.as("a")
      .join(b.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.__ci") === col("b.__ci") && col("a.__cj") === col("b.__cj") &&
          (col("a.__ci") =!= col("a.__cj") || col("a.id") < col("b.id")))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        longDot(col("a.qa"), col("b.qa"))
          .cast("double")
          ./(sqrt(col("a.n2").cast("double")) * sqrt(col("b.n2").cast("double")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Embedding near-duplicate pairs over an UNBLOCKED corpus: multi-table
    * LSH buckets are the blocking key, so no caller-chosen block is needed
    * and candidate cost is Σ bucket-size² per table instead of N²/L within
    * coarse blocks — this is the 100 TB shape of
    * [[embeddingNearDuplicates]]. Pairs are scored in-row (exact
    * fixed-point dot) BEFORE the cross-table dedup, so the distinct's
    * shuffle carries three scalar columns, not the quantized arrays.
    * Recall is governed by planes/tables exactly as in [[lshBucketedTopK]]:
    * fewer planes = bigger buckets = higher recall; at a near-dup
    * threshold t the per-plane collision probability is 1 − acos(t)/π.
    */
  def lshNearDuplicates(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      numPlanes: Int = 16,
      numTables: Int = 8,
      weight: (Int, Column) => Column = xxPlaneWeight): DataFrame = {
    val e = bucketedQuantized(df, idCol, embCol, numPlanes, numTables, weight)
    e.as("a")
      .join(e.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        (longDot(col("a.qa"), col("b.qa"))
          .cast("double") /
          (sqrt(col("a.n2").cast("double")) * sqrt(col("b.n2").cast("double")))).as("cosine"))
      .filter(col("cosine") >= threshold)
      // a pair colliding in several tables scores identically each time
      // (exact integer dot), so the dedup is safe after scoring
      .dropDuplicates("id_a", "id_b")
  }

  /** One `(id, table, bucket, qa, n2)` row per (row of `df`) × LSH table:
    * the quantized array and its squared norm ride each bucket row so any
    * same-(table, bucket) join can score candidates in-row with the exact
    * fixed-point dot — the shared candidate-side frame of
    * [[lshNearDuplicates]] and [[semanticDecontaminate]].
    */
  private def bucketedQuantized(
      df: DataFrame,
      idCol: String,
      embCol: String,
      numPlanes: Int,
      numTables: Int,
      weight: (Int, Column) => Column): DataFrame = {
    val base = df
      .withColumn("__qa", transform(col(embCol), v => round(v.cast("double") * lit(Q)).cast("long")))
      .withColumn("__n2", longDot(col("__qa"), col("__qa")))
    val buckets = lshBuckets(df, idCol, embCol, numPlanes, numTables, weight)
      .withColumnRenamed("id", "__bucket_id")
    base.join(buckets, col(idCol) === col("__bucket_id"))
      .select(col(idCol).as("id"), col("table"), col("bucket"),
        col("__qa").as("qa"), col("__n2").as("n2"))
  }

  /** Semantic benchmark decontamination: drop every corpus row whose
    * embedding has cosine ≥ `threshold` with ANY eval-set embedding — the
    * embedding-space complement of
    * [[graft.operators.Dedup.decontaminate]]'s shingle overlap. Paraphrased
    * or lightly reworded eval leaks share few exact n-gram shingles but
    * still sit next to the eval point in embedding space; this pass
    * catches them (and verbatim copies bucket identically in EVERY table,
    * so recall on exact leaks is 1 at any plane count).
    *
    * Scale shape: the eval side is a benchmark suite — thousands of rows,
    * not billions — so its per-table quantized bucket frame BROADCASTS.
    * The corpus pays its own bucket projection (one id-keyed aggregation),
    * a broadcast probe join on (table, bucket), the exact fixed-point
    * cosine in-row on candidates only, and an anti-join of the
    * contaminated-id set (AQE-sized — it scales with contamination, so it
    * gets no unconditional broadcast hint): the corpus text/payload columns
    * are never shuffled. Probe recall for near-misses is governed by planes/tables
    * exactly as in [[lshNearDuplicates]] — fewer planes = bigger buckets =
    * higher recall at higher candidate cost.
    */
  def semanticDecontaminate(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalEmbCol: String,
      threshold: Double,
      numPlanes: Int = 16,
      numTables: Int = 8,
      weight: (Int, Column) => Column = xxPlaneWeight): DataFrame = {
    val ce = bucketedQuantized(corpus, idCol, embCol, numPlanes, numTables, weight)
    val ee = bucketedQuantized(eval, evalIdCol, evalEmbCol, numPlanes, numTables, weight)
      .select(col("table"), col("bucket"), col("qa").as("__eqa"), col("n2").as("__en2"))
    val contaminated = ce
      .join(broadcast(ee), Seq("table", "bucket"))
      .filter(
        longDot(col("qa"), col("__eqa")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("__en2").cast("double"))) >= threshold)
      .select(col("id").as(idCol))
      .distinct()
    // No broadcast hint on the anti-join side: the contaminated set scales
    // with corpus CONTAMINATION (a dirty corpus or a low threshold can make
    // it arbitrarily large), not with the small-by-contract eval suite — let
    // AQE size it at runtime, exactly as the shingle decontaminate does.
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** In-row cosine via the codegen'd [[graft.functions.DoubleArrayDot]]
    * kernel. Float-order-deterministic because the accumulation is
    * sequential within the row — no partitioning dependence. Used on
    * pre-joined pairs.
    */
  def cosineExpr(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column = doubleDot(x, y)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** L2-normalize an embedding column to unit length (double precision).
    * Zero/empty vectors pass through unchanged (no NaN poisoning). Every
    * step is IEEE-correctly-rounded on deterministic inputs — float→double
    * cast exact, the norm's summation sequential via the codegen'd
    * self-dot, sqrt and division correctly rounded — so the output is
    * bit-identical across engines (DuckDB replicates it verbatim), unlike
    * any mean/variance-style normalization. Narrow per-row projection: no
    * shuffle. Normalizing up front turns downstream cosine into a bare dot
    * product at 100 TB.
    */
  def l2Normalize(emb: Column): Column = {
    val n2 = doubleDot(emb, emb)
    when(n2.isNull || n2 === 0.0, transform(emb, v => v.cast("double")))
      .otherwise(transform(emb, v => v.cast("double") / sqrt(n2)))
  }
}
