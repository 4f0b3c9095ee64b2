package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale document pipelines: token
  * counting, normalization/fingerprinting, quality scoring, and a
  * lightweight language-ID heuristic.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen'd, no UDFs — so the operators stay inside whole-stage codegen
  * and scale linearly with input splits (no shuffle except where a groupBy
  * is inherent to the semantics).
  */
object TextAnalysis {

  /** Whitespace tokens of a (trimmed) text column. */
  def tokens(text: Column): Column = split(trim(regexp_replace(text, "\\s+", " ")), " ")

  /** Distinct whitespace tokens (the word SET — basis for Jaccard dedup). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Distinct word n-gram shingles (default 3). Shingles are the right
    * similarity unit for near-dup detection: individual words can appear in
    * ~every document of a corpus (making word-set similarity degenerate and
    * candidate generation quadratic), while n-gram shingles are
    * order-sensitive and rare. Documents shorter than `n` words yield an
    * empty shingle set and drop out of pairwise dedup.
    */
  def shingleSet(text: Column, n: Int = 3): Column =
    shinglesOfWords(tokens(text), n)

  /** Shingle set over an ALREADY-SPLIT words array column.
    *
    * Built as a `zip_with` chain over shifted `slice`s — NOT via
    * `element_at(w, i+j)` inside a `transform` lambda. The difference is
    * load-bearing: higher-order functions run interpreted
    * (CodegenFallback), and when Catalyst's CollapseProject inlines the
    * words expression (e.g. `tokens(text)`) into the lambda, each
    * `element_at` re-evaluates it — O(#shingles · text length) re-splits
    * per row (measured 8× on the decontamination query at sf0.1). A
    * `zip_with` lambda binds ELEMENT VALUES, so the words expression is
    * evaluated only a constant number of times per row (once per slice)
    * no matter where the optimizer inlines it.
    *
    * NULL word elements (which no built-in tokenizer emits — `split`
    * never yields null) null-poison the shingles containing them; the
    * poisoned shingles are dropped from the set rather than silently
    * shortened.
    */
  def shinglesOfWords(w: Column, n: Int = 3): Column =
    array_distinct(windowsOfWords(w, n))

  /** ORDERED n-token windows (with duplicates) over an already-split words
    * array — the positional counterpart of [[shinglesOfWords]], for
    * operators where occurrence COUNTS matter (duplicated-span detection).
    * Same zip_with-over-shifted-slices construction and for the same
    * load-bearing reason (see [[shinglesOfWords]]): a `transform` +
    * `element_at` shape re-evaluates the inlined words expression per
    * element.
    */
  def windowsOfWords(w: Column, n: Int): Column = {
    require(n >= 1, s"window size must be >= 1, got $n")
    // every component slice has the SAME length m−(n−1): window i is
    // (w_i, w_{i+1}, …, w_{i+n−1}) for i = 1..m−n+1; zip_with pads the
    // shorter side with nulls, so unequal slice lengths would fabricate a
    // null-poisoned phantom window
    val grams = (2 to n).foldLeft(slice(w, lit(1), size(w) - (n - 1))) { (acc, j) =>
      zip_with(acc, slice(w, lit(j), size(w) - (n - 1)), (a, b) => concat(a, lit(" "), b))
    }
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(filter(grams, g => g.isNotNull))
  }

  /** 64-bit hash from the first 16 hex chars of sha256(value): hi 32 bits
    * from chars 1-8, lo 32 bits from chars 9-16 (big-endian, the natural
    * hex reading). Reproducible in ANY engine with a sha256 function —
    * DuckDB: `CAST(concat('0x', substr(sha256(v),1,8)) AS BIGINT)` etc. —
    * which makes hash-dependent operators (simhash, LSH) cross-engine
    * oracle-checkable. xxhash64 stays the fast default inside operators;
    * this is the interoperable alternative.
    */
  def shaHash64(c: Column): Column = {
    val sha = sha2(c.cast("string"), 256)
    val hi = conv(substring(sha, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(sha, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Whitespace token count; 0 for empty/blank text. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Canonical document fingerprint: sha256 over whitespace-normalized text.
    * Collapsing runs of whitespace makes the fingerprint robust to
    * formatting-only edits; use
    * [[graft.operators.Dedup.exactDuplicateGroups]] over it for
    * fingerprint-level dedup.
    */
  def fingerprint(text: Column): Column =
    sha2(trim(regexp_replace(text, "\\s+", " ")), 256)

  /** Canonical text for cross-source dedup: Unicode NFC (composed "é" and
    * "e"+combining-accent hash identically), lowercase, whitespace runs
    * collapsed, trimmed. The normalization step is the codegen'd
    * [[TextExpressions.unicodeNormalize]] expression; everything else is a
    * built-in regexp chain — scan-side, shuffle-free. Feed the result to
    * [[fingerprint]] / [[graft.operators.Dedup.exactDuplicateGroups]] so
    * encoding-variant mirrors of the same page collapse to one group.
    * NFC (not NFKC) on purpose: compatibility folding (ligatures, "¼" →
    * "1/4") changes text semantics and is a corpus-policy decision —
    * callers wanting it can pass the NFKC form to `unicodeNormalize`
    * directly.
    */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(lower(TextExpressions.unicodeNormalize(text, "NFC")), "\\s+", " "))

  /** Pre-training text cleaning: mask emails then URLs with stable tokens,
    * then collapse whitespace runs and trim. A pure `regexp_replace` chain —
    * codegen'd, shuffle-free, and the patterns are RE2-safe so any engine
    * (DuckDB `regexp_replace(..., 'g')`) reproduces the output exactly.
    * Masking REPLACES rather than deletes so token counts stay meaningful
    * downstream.
    */
  def scrub(
      text: Column,
      emailToken: String = "<EMAIL>",
      urlToken: String = "<URL>"): Column = {
    val noEmail = regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", emailToken)
    val noUrl = regexp_replace(noEmail, "(https?://|www\\.)[^ \\t\\n\\r]+", urlToken)
    trim(regexp_replace(noUrl, "\\s+", " "))
  }

  /** The markup-stripping pattern/replacement chain, shared verbatim by
    * [[stripMarkup]] (Spark) and [[stripMarkupSql]] (oracle SQL) so the two
    * can never drift. Every pattern is RE2-safe (no backreferences, no
    * lookaround — script and style get their OWN pattern instead of an
    * alternation backref) and uses only inline flags both Java regex and
    * RE2 support (`(?i)`, `(?s)`). Tags/blocks are replaced with a SPACE,
    * not the empty string: `</td><td>`-style adjacency would otherwise weld
    * unrelated words together, corrupting every token-level stat
    * downstream. Entity decode order matters — `&amp;` is decoded LAST so
    * `&amp;lt;` becomes the literal text `&lt;`, not `<` (double-decoding
    * is how stripped corpora grow phantom tags).
    */
  private[graft] val markupRegexChain: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script\\s*>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style\\s*>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?s)<[^>]*>" -> " ")
  private[graft] val entityChain: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Plain-text extraction from HTML/XML-ish markup — the first step of
    * every web-crawl pipeline: drop script/style blocks and comments
    * wholesale (their CONTENT is code, not language), strip remaining
    * tags, decode the six entities that dominate real crawl text, collapse
    * whitespace, trim. A pure scan-side `regexp_replace`/`replace` chain —
    * codegen'd, shuffle-free, pushes past column pruning; at 100 TB the
    * stripper runs inside the first parquet scan of the raw crawl, which
    * is the only pass that ever sees the markup.
    *
    * This is a REGEX stripper by design, not an HTML5 parser: tokenizer
    * edge cases (unclosed `<script>`, `<` in attribute values, CDATA) can
    * leak fragments, which the downstream quality gates
    * ([[qualityFeatures]]' symbol ratios, [[repetitionStats]]) are
    * measured on anyway. What it buys over a parser: determinism across
    * engines (the chain is replayable as six regexes + six replaces in ANY
    * SQL engine — [[stripMarkupSql]] emits the DuckDB form), and
    * whole-stage codegen instead of a per-row DOM allocation.
    */
  def stripMarkup(text: Column): Column = {
    val stripped = markupRegexChain.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    val decoded = entityChain.foldLeft(stripped) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The DuckDB expression computing exactly [[stripMarkup]] of the SQL
    * expression `colExpr` — generated from the SAME chains, so operator
    * and oracle cannot drift. DuckDB needs the explicit `'g'` flag (its
    * `regexp_replace` is first-match-only by default; Spark's is always
    * global) and its plain `replace` is global like Spark's quoted-regex
    * replace.
    */
  def stripMarkupSql(colExpr: String): String = {
    def q(s: String) = s.replace("'", "''")
    val stripped = markupRegexChain.foldLeft(colExpr) { case (e, (pat, rep)) =>
      s"regexp_replace($e, '${q(pat)}', '${q(rep)}', 'g')"
    }
    val decoded = entityChain.foldLeft(stripped) { case (e, (from, to)) =>
      s"replace($e, '${q(from)}', '${q(to)}')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** A BPE-ish sub-word token count approximation: words plus extra tokens
    * for every ~4 characters of long words (cheap, deterministic stand-in
    * for a real tokenizer's token count).
    */
  def approxBpeTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(
        aggregate(
          tokens(text),
          lit(0),
          (acc, w) => acc + greatest(lit(1), ceil(length(w) / lit(4)).cast("int"))))

  /** Quality-scoring feature columns over `textCol`:
    * character count, token count, mean token length, punctuation ratio,
    * digit ratio, uppercase ratio, stopword ratio — the standard cheap
    * signals used to filter low-quality web text before training (very low
    * OR very high stopword density both indicate non-prose).
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val chars = length(t).cast("double")
    def classRatio(pattern: String): Column =
      when(length(t) === 0, lit(0.0))
        .otherwise(length(regexp_replace(t, pattern, "")).cast("double") / chars)
    val stopwords = array(langMarkers("en").map(lit): _*)
    df.withColumn("n_chars", length(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn(
        "mean_token_len",
        when(tokenCount(t) === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "\\s+", "")).cast("double") / tokenCount(t).cast("double")))
      .withColumn("punct_ratio", classRatio("[^.,!?;:]"))
      .withColumn("digit_ratio", classRatio("[^0-9]"))
      .withColumn("upper_ratio", classRatio("[^A-Z]"))
      .withColumn(
        "stopword_ratio",
        when(tokenCount(t) === 0, lit(0.0))
          .otherwise(
            size(filter(tokens(lower(t)), w => array_contains(stopwords, w))).cast("double")
              / tokenCount(t).cast("double")))
  }

  /** Corpus-relative "LM-ish" quality score on the cheap: the fraction of a
    * document's character bigrams that fall OUTSIDE the corpus's `vocabK`
    * most frequent bigrams. The integer-exact skeleton of the CCNet-style
    * LM-perplexity filter (Wenzek et al. 2020): prose in the corpus's
    * dominant language(s) is built almost entirely from the head of the
    * character-bigram distribution, while binary junk, mojibake, exotic
    * markup and wrong-script text load on the tail — high `oov_ratio` flags
    * them without any float log-prob (whose libm variance would break
    * cross-engine reproducibility). Output: (doc, n_bigrams, n_oov,
    * oov_ratio), one row per input document (blank docs score 0.0).
    *
    * Two passes by nature (corpus statistics, then scoring): pass 1 explodes
    * codegen'd [[TextExpressions.charBigrams]] arrays into one hash
    * aggregation whose top-k plans as `TakeOrderedAndProject` (each
    * partition ships only its local top-k), collapsed to a single-row vocab
    * ARRAY; pass 2 broadcasts that row and scores every document in-row via
    * [[TextExpressions.oovBigramCounts]] — no second explode, no join, no
    * per-doc shuffle, just a narrow projection over the corpus. Ties at the
    * vocabulary boundary break deterministically by (count DESC, bigram
    * ASC), so any engine derives the same vocabulary.
    *
    * NULL text is coalesced to '' up front (scores (0, 0, 0.0), same as the
    * previous left-join fold and the DuckDB oracle's missing-group
    * coalesce), which also keeps the scoring expression null-free.
    */
  def oovBigramScore(df: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    require(vocabK >= 1, s"vocabK must be >= 1, got $vocabK")
    val norm = df.select(
      col(idCol).as("doc"),
      coalesce(lower(trim(regexp_replace(col(textCol), "\\s+", " "))), lit("")).as("__t"))
    val vocab = norm
      .select(explode(TextExpressions.charBigrams(col("__t"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("bf"))
      .orderBy(col("bf").desc, col("bg").asc)
      .limit(vocabK)
      .agg(collect_list(col("bg")).as("__vocab"))
    norm
      .crossJoin(broadcast(vocab))
      .select(
        col("doc"),
        TextExpressions.oovBigramCounts(col("__t"), col("__vocab")).as("__c"))
      .select(
        col("doc"),
        col("__c").getField("n_bigrams").as("n_bigrams"),
        col("__c").getField("n_oov").as("n_oov"))
      .withColumn(
        "oov_ratio",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(col("n_oov").cast("double") / col("n_bigrams").cast("double")))
  }

  /** Repetition-based quality signals (the Gopher/MassiveText repetition
    * rules, public: Rae et al. 2021 §A1.1): within-document repetition is
    * one of the strongest cheap markers of boilerplate/spam, complementary
    * to [[qualityFeatures]]'s character-class ratios. Appends:
    *
    *  - `n_lines` — non-blank (space-trimmed) lines;
    *  - `dup_line_ratio` — fraction of lines that are repeats of an
    *    earlier line (1 − distinct/total);
    *  - `dup_2gram_ratio`, `dup_3gram_ratio` — fraction of word n-grams
    *    that are repeats (1 − distinct/total over ALL n-grams, not the
    *    distinct shingle set).
    *
    * All ratios are 0.0 for empty inputs. Pure in-row codegen'd HOF
    * composition — no shuffle, no UDF; ratios are exact-integer
    * subtractions over one IEEE division, so any engine reproduces them
    * bit-identically (`q_text_repetition` oracle). The words array is
    * materialized in a scratch column first — inlining it would re-split
    * the text for every `element_at` inside the shingle lambda.
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val reserved = Seq("__rep_w", "n_lines", "dup_line_ratio", "dup_2gram_ratio", "dup_3gram_ratio")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input columns collide with repetitionStats' scratch/output names (${reserved.mkString(", ")}) — rename them first")
    val t = col(textCol)
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines)
    val nTok = tokenCount(t)
    def gramRatio(n: Int): Column = {
      val total = nTok - lit(n - 1)
      val dist = size(shinglesOfWords(col("__rep_w"), n))
      when(total <= 0, lit(0.0))
        .otherwise((total - dist).cast("double") / total.cast("double"))
    }
    df.withColumn("__rep_w", tokens(t))
      .withColumn("n_lines", nLines)
      .withColumn(
        "dup_line_ratio",
        when(nLines === 0, lit(0.0))
          .otherwise((nLines - size(array_distinct(lines))).cast("double") / nLines.cast("double")))
      .withColumn("dup_2gram_ratio", gramRatio(2))
      .withColumn("dup_3gram_ratio", gramRatio(3))
      .drop("__rep_w")
  }

  /** Corpus-level duplicated-SPAN stats: per document, how many of its
    * `w`-token windows occur at least twice anywhere in the corpus (its own
    * repeats included). This is the distributed form of exact-substring
    * train-data dedup (suffix-array substring dedup, approximated by
    * rolling token windows — windows are order-sensitive, so a duplicated
    * window IS a duplicated w-token substring): line dedup
    * ([[graft.operators.Dedup.dropRepeatedLines]]) catches copied LINES,
    * near-dup pairs catch copied DOCUMENTS, and this catches copied
    * passages that respect neither line nor document boundaries. The
    * `dup_fraction` output is the standard gate/trim signal.
    *
    * Scale design: count-then-probe. The global count aggregates by window
    * with map-side partial combine (a hot boilerplate window never
    * concentrates raw rows on one reducer), then the count joins back to
    * the window stream — the planner broadcasts the count table while it
    * fits (pinned at test scale) and falls back to a sort-merge join that
    * AQE can skew-split when it doesn't. The window explode is deliberately
    * COMPUTED TWICE (once per consumer) rather than checkpointed: the
    * exploded window table is ~`w`× corpus size, so re-running a narrow
    * streaming projection is cheaper at scale than materializing it, and
    * column pruning gives each pass only the columns it needs. (A window
    * function over `partition by win` would save the join but buffers
    * whole win-partitions — the hot-window hazard the aggregation avoids.)
    * The join key is a 128-bit binary sha prefix of the window (counts
    * are hash-invariant, and the fixed 16-byte key bounds shuffle volume
    * regardless of `w`). Output: (doc, n_windows,
    * dup_windows, dup_fraction); documents shorter than `w` tokens have no
    * windows and emit no row.
    */
  def duplicatedWindowStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 5): DataFrame = {
    require(w >= 2, s"window size must be >= 2, got $w")
    // count by a 128-bit binary window hash, not the window string: the
    // aggregation and count-back join shuffle every window row, and the
    // fixed 16-byte key bounds that volume regardless of `w` (the counts
    // are hash-invariant; 2¹²⁸ keyspace is collision-free in practice)
    val wins = df.select(
      col(idCol).as("doc"),
      explode(windowsOfWords(tokens(col(textCol)), w)).as("win"))
      .select(col("doc"), unhex(substring(sha2(col("win"), 256), 1, 32)).as("win"))
    val counts = wins.groupBy("win").agg(count(lit(1)).as("__n"))
    wins.join(counts, "win")
      .groupBy("doc")
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("__n") >= 2, 1L).otherwise(0L)).as("dup_windows"))
      .withColumn("dup_fraction",
        col("dup_windows").cast("double") / col("n_windows"))
  }

  /** Corpus-relative unigram log-probability score (the CCNet-style LM
    * quality filter, with the corpus itself as the language model): per
    * document, the mean per-token surprisal `log2(T / C(t))` bits, where
    * `C(t)` is the token's corpus frequency and `T` the corpus token count.
    * Low bits-per-token ≈ common, fluent vocabulary; high ≈ rare-token
    * noise (the tail a perplexity filter trims). A true KenLM n-gram model
    * drops into the same dataflow by replacing the frequency table.
    *
    * Exactness across engines: the per-token surprisal is rounded to
    * integer MICRO-bits (a pure function of the (C, T) longs), summed
    * exactly as integers, and divided back once per document — so the
    * result is independent of summation order and bit-stable in any engine
    * with an IEEE log2.
    *
    * Scale design: same count-then-probe shape as
    * [[duplicatedWindowStats]] — token-frequency aggregation with map-side
    * combine, cost table joined back to the token stream (broadcast while
    * the vocabulary fits, sort-merge beyond), per-doc aggregation last; the
    * corpus total joins as a broadcast single row. Empty documents tokenize
    * to [""] which is itself a corpus token, so every document emits a row.
    */
  def unigramLogProbScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("__c"))
    val total = freq.agg(sum(col("__c")).as("__t"))
    val costed = freq.crossJoin(broadcast(total)).select(
      col("tok"),
      round(log2(col("__t").cast("double") / col("__c")) * 1e6).cast("long").as("__cost"))
    toks.join(costed, "tok")
      .groupBy("doc")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__cost")).as("__sum"))
      .select(
        col("doc"), col("n_tokens"),
        (col("__sum").cast("double") / col("n_tokens") / lit(1e6)).as("bits_per_token"))
  }

  /** Corpus-relative BIGRAM surprisal in integer micro-bits — the
    * conditional upgrade of [[unigramLogProbScore]]:
    * `cost(w₁ w₂) = −log₂(c(w₁ w₂) / ctx(w₁))` with
    * `ctx(w₁) = Σ_w c(w₁ w)` counting w₁'s occurrences as a bigram
    * CONTEXT, so every context's conditional distribution sums to exactly
    * 1. Low bits/token ⇒ word TRANSITIONS predictable from the corpus
    * (fluent, on-domain); shuffled-word junk scores high even when its
    * unigram mix is perfectly typical — the signal unigram surprisal
    * cannot see. Self-scoring: every document bigram is by construction in
    * the corpus counts, so no smoothing/backoff branch exists (scoring a
    * foreign corpus against this model would need one). Docs with < 2
    * tokens emit (0, 0.0).
    *
    * The score column is `bits_per_bigram` — the summed cost divides by
    * `n_bigrams` (token TRANSITIONS, = n_tokens − 1 per doc), NOT by
    * n_tokens as [[unigramLogProbScore]]'s `bits_per_token` does. The
    * distinct name keeps thresholds tuned on one scorer from being
    * silently applied to the other.
    *
    * Scale shape: the corpus bigram table is the big intermediate — all
    * shuffles key on hash-uniform bigram/context strings (two aggs + two
    * equi-joins), micro-bit costs ride as longs, and the per-doc sum is
    * order-independent (integer), so the score is bit-stable across
    * partitionings like the unigram version.
    */
  def bigramLogProbScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("__w"))
    val bgs = base.select(col("doc"), explode(windowsOfWords(col("__w"), 2)).as("bg"))
    val freq = bgs.groupBy("bg").agg(count(lit(1)).as("__c"))
      .withColumn("__w1", split(col("bg"), " ").getItem(0))
    val ctx = freq.groupBy("__w1").agg(sum(col("__c")).as("__ctx"))
    val costed = freq.join(ctx, "__w1").select(
      col("bg"),
      round(log2(col("__ctx").cast("double") / col("__c")) * 1e6).cast("long").as("__cost"))
    val scored = bgs.join(costed, "bg")
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__cost")).as("__sum"))
    base.select(col("doc"))
      .join(scored, Seq("doc"), "left")
      .select(
        col("doc"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("__sum").cast("double") / col("n_bigrams") / lit(1e6), lit(0.0))
          .as("bits_per_bigram"))
  }

  /** Split documents into fixed-size token-window chunks with overlap —
    * the context-length preprocessing step of a training pipeline. Chunk
    * starts advance by `chunkTokens - overlapTokens`; the final chunk may
    * be short; blank documents produce no chunks. Output:
    * (doc, chunk_no, chunk_text, n_chunk_tokens).
    *
    * Scale: narrow per-row explode — no shuffle, no state; output row
    * count is Σ ⌈tokens/stride⌉, and each chunk carries only its own
    * text slice (never the whole document re-materialized per chunk
    * beyond the overlap factor ≤ chunk/stride).
    *
    * The output is a fixed-name PROJECTION — input columns other than
    * `idCol`/`textCol` are not carried, so a caller column named `doc`,
    * `pos`, `col` or `__tk` is never overwritten (it simply isn't in the
    * output); join the chunks back on `doc` to re-attach metadata.
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens): $overlapTokens vs $chunkTokens")
    val stride = chunkTokens - overlapTokens
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("__tk"))
      .select(col("doc"), col("__tk"),
        posexplode(sequence(lit(1), size(col("__tk")), lit(stride))))
      .select(
        col("doc"),
        col("pos").cast("long").as("chunk_no"),
        concat_ws(" ", slice(col("__tk"), col("col"), lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__tk"), col("col"), lit(chunkTokens))).as("n_chunk_tokens"))
  }

  /** Corpus-level vocabulary head: the `k` globally most frequent
    * lowercased tokens with their total frequencies, deterministically
    * tie-broken by term. The corpus-health stat behind stopword lists,
    * tokenizer audits, and boilerplate spotting.
    *
    * Scale: one narrow explode, one hash aggregation on the term (map-side
    * partial combine collapses each partition to its local vocabulary
    * before the shuffle), and the final top-k plans as
    * `TakeOrderedAndProject` — each partition ships only its local top-k,
    * never the full vocabulary, to the driver-side merge (pinned in
    * PlanSpec). No global sort is ever materialized.
    */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(k)
  }

  /** Sequence packing: assign each document's chunks to fixed-capacity
    * token bins by the next-fit rule — chunks in `ordCol` order; a chunk
    * joins the current bin iff its tokens still fit, otherwise it opens the
    * next bin; an oversized chunk (> `maxTokens`) gets a bin of its own.
    * The batch-preparation step between [[chunkDocuments]] and training:
    * each bin becomes one padded training sequence, and next-fit in
    * document order keeps a document's neighboring chunks adjacent (unlike
    * global best-fit, which also destroys determinism under parallelism).
    * Appends a 0-based per-document `bin` column.
    *
    * Packing is inherently a sequential scan with reset, so it runs as an
    * in-row `aggregate` fold over each document's collected chunk list —
    * one hash-partitioned shuffle on the document id, state bounded by
    * chunks-per-document, nothing driver-side. Integer-exact: the fold
    * replays identically in any engine (the oracle replays it as a
    * recursive CTE).
    */
  def packChunks(
      df: DataFrame,
      docCol: String,
      ordCol: String,
      nTokCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val reserved = Seq("bin", "__o", "__cs", "__bins", "__z", "__e").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input columns collide with packChunks' reserved names (${reserved.mkString(", ")}) — rename them first")
    val otherCols = df.columns.filterNot(c => c == docCol).toSeq
    val gathered = df
      .groupBy(col(docCol))
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("__o") +: otherCols.map(c => col(c).as(c)): _*))).as("__cs"))
    // next-fit fold: acc = (bins so far, current bin, tokens in current bin)
    val emptyAcc = struct(
      array().cast("array<int>").as("bins"), lit(0).as("cur"), lit(0L).as("filled"))
    val binsExpr = aggregate(
      col("__cs"),
      emptyAcc,
      (acc, c) => {
        // A NULL token count would silently poison the fold (null comparisons
        // make `opens` null → every later chunk stays in the current bin), so
        // fail loudly instead — chunkDocuments never emits NULLs, but this
        // API is public.
        val n = when(c.getField(nTokCol).isNull,
            raise_error(lit(s"packChunks: NULL in token-count column '$nTokCol'")))
          .otherwise(c.getField(nTokCol)).cast("long")
        val opens = acc.getField("filled") > 0L &&
          acc.getField("filled") + n > lit(maxTokens.toLong)
        val cur = when(opens, acc.getField("cur") + 1).otherwise(acc.getField("cur"))
        struct(
          concat(acc.getField("bins"), array(cur)).as("bins"),
          cur.as("cur"),
          when(opens, n).otherwise(acc.getField("filled") + n).as("filled"))
      },
      acc => acc.getField("bins"))
    gathered
      .withColumn("__bins", binsExpr)
      .withColumn("__z", arrays_zip(col("__cs"), col("__bins")))
      .select(col(docCol), explode(col("__z")).as("__e"))
      .select(
        col(docCol) +:
          otherCols.map(c => col(s"__e.__cs.$c").as(c)) :+
          col("__e.__bins").as("bin"): _*)
  }

  /** Per-document salient terms: the `k` terms ranked by
    * (tf DESC, df ASC, term ASC) — term frequency in the document first,
    * corpus document-frequency as the rarity tie-break. This is the
    * integer-exact skeleton of tf-idf: any monotone idf (ln(N/df), …)
    * agrees that at equal tf the rarer term wins, and keeping the ranking
    * integral makes results bit-identical across engines (a float idf's
    * `ln` is libm-dependent). Output: (doc, term, tf, df).
    *
    * Scale: two hash aggregations + one join; the document-frequency table
    * is |vocabulary| rows — AQE broadcasts it when small, and the per-doc
    * top-k window partitions by doc (uniform). Nothing is quadratic.
    *
    * Fixed-name projection like [[chunkDocuments]]: caller columns are
    * never overwritten, only left behind — join back on `doc`.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.select(col(idCol).as("doc"), explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .withColumn(
        "__rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc")
            .orderBy(col("tf").desc, col("df").asc, col("term").asc)))
      .filter(col("__rn") <= k)
      .select("doc", "term", "tf", "df")
  }

  /** PII pattern classes for detection/audit. Deliberately RE2-safe (no
    * backrefs, no lookaround) so the same patterns run under Java regex,
    * RE2-family engines and the DuckDB oracle with identical
    * leftmost-non-overlapping match counts; simple greedy quantifiers
    * avoid the leftmost-first (Java) vs leftmost-longest (RE2) divergence
    * that alternation-heavy patterns can hit.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "emails" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4s" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phones" -> "\\+\\d{1,2}-\\d{3}-\\d{3,4}-\\d{4}",
    "id_numbers" -> "\\b\\d{9}\\b")

  /** PII detection audit: per-document match counts for each
    * [[piiPatterns]] class plus the total — the measure-before-you-[[scrub]]
    * half of corpus governance (which docs leak, how much, which class).
    * Pure codegen'd per-row projection: no shuffle, no UDF, prunes to
    * (id, text) at the scan.
    */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = piiPatterns.map { case (name, pat) =>
      regexp_count(col(textCol), lit(pat)).cast("long").as(s"n_$name")
    }
    val total = piiPatterns.map { case (name, _) => col(s"n_$name") }.reduce(_ + _)
    df.select(col(idCol).as("doc") +: counts: _*)
      .withColumn("pii_total", total)
  }

  /** TF-IDF ranked retrieval: score every document against a bag of query
    * terms and return the top `k` by summed `tf · idf`, where the idf is
    * the SCALED-INTEGER `⌊N · idfScale / df⌋` (N = corpus size, df = docs
    * containing the term). The floor-divided idf trades the textbook log
    * for exact BIGINT arithmetic, so rankings are bit-identical in any
    * engine — the monotonic 1/df shape is what the ranking needs, and the
    * scale keeps three-digit precision ahead of the floor.
    *
    * Scale design: the query bag is a literal `isin` filter, so only rows
    * containing a query term survive the scan-side explode — the shuffles
    * (tf, df, final score) all run on the FILTERED stream, proportional to
    * query-term postings, not the corpus. df→tf rejoin is on the ≤|terms|
    * df frame (broadcast); N arrives via a broadcast 1-row cross join; the
    * top-k is TakeOrderedAndProject, never a global sort.
    */
  def rankByTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      idfScale: Long = 1000000L): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1 && idfScale >= 1, "k and idfScale must be positive")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = df
      .select(col(idCol).as("doc"), explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("__n"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(total))
      .withColumn("__idf", expr(s"(__n * ${idfScale}L) div df"))
      .groupBy("doc")
      .agg(
        sum(col("tf") * col("__idf")).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }

  /** Linear text-classifier scoring against a supplied `(term, weight)`
    * lexicon — the fastText/logistic-regression SHAPE of model-based corpus
    * quality filtering with the model as DATA, not code:
    * `score(doc) = bias + Σ_token-occurrences w(token)`, `keep = score ≥ 0`.
    * Weights must be integral (scaled fixed-point — "micro-logits"), so
    * scores are exact BIGINT sums: bit-identical across engines and
    * partitionings, and the keep-decision is replicable in SQL.
    *
    * Scale shape: a classifier lexicon is ≤ ~1 M terms (a fastText vocab),
    * so it collapses to ONE map row broadcast to every executor; scoring
    * is an in-row fold over the token array — no explode, no join, no
    * per-doc shuffle (the single-row-broadcast pattern of
    * [[oovBigramScore]]). Only (doc, score, keep) leave the scan.
    * Tokens are lowercased before the probe; supply a lowercase lexicon.
    * A duplicate term in the lexicon fails fast (Spark's map-key dedup
    * policy) rather than silently picking one weight.
    */
  def linearScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      termCol: String = "term",
      weightCol: String = "weight",
      bias: Long = 0L): DataFrame = {
    val wtype = weights.schema(weightCol).dataType
    require(Seq("ByteType", "ShortType", "IntegerType", "LongType").contains(wtype.toString),
      s"weightCol '$weightCol' must be integral (scaled fixed-point), got $wtype")
    val wmap = weights.agg(
      map_from_entries(collect_list(struct(col(termCol), col(weightCol).cast("long"))))
        .as("__wmap"))
    df.select(
        col(idCol).as("doc"),
        tokens(lower(coalesce(col(textCol), lit("")))).as("__toks"))
      .crossJoin(broadcast(wmap))
      .select(
        col("doc"),
        aggregate(col("__toks"), lit(bias),
          (acc, t) => acc + coalesce(element_at(col("__wmap"), t), lit(0L))).as("score"))
      .withColumn("keep", col("score") >= 0)
  }

  /** BM25 ranked retrieval (Robertson/Spärck Jones, the Okapi formula) with
    * every score an exact integer — the length-normalized, saturating
    * upgrade of [[rankByTerms]]'s bare tf·idf:
    * `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`.
    * Parameters arrive in MILLI-units (k1 = 1200 ≡ 1.2, b = 750 ≡ 0.75) and
    * the per-term ratio is computed as one integer floor-division after
    * multiplying through by 10⁶·T·N-scale factors — no float division
    * anywhere, so rankings are bit-identical in any engine. The idf is the
    * standard `log2((N − df + ½)/(df + ½) + 1)` rounded to integer
    * MICRO-bits (the repo's micro-unit log convention; exact-integer inputs
    * make the double computation reproducible cross-engine).
    *
    * Scale shape: same as [[rankByTerms]] — the query bag is a scan-side
    * `isin` filter, so tf/df aggregations run on query-term postings only;
    * the document-length frame is corpus-sized but never shuffles (the
    * small tf side broadcasts into the dl join); corpus totals (T, N)
    * arrive as a broadcast single row; top-k is `TakeOrderedAndProject`.
    * The wide products run in DECIMAL(38,0) (T up to ~10¹³ tokens keeps the
    * numerator < 10²⁹); the final quotient fits a BIGINT.
    */
  def bm25Rank(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1Milli: Int = 1200,
      bMilli: Int = 750): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, "k must be positive")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"k1Milli >= 0 and bMilli in [0, 1000]: $k1Milli, $bMilli")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val base = df.select(
      col(idCol).as("doc"),
      tokens(lower(col(textCol))).as("__tk"))
    val dl = base.select(col("doc"), size(col("__tk")).cast("long").as("dl"))
    val totals = dl.agg(
      sum(col("dl")).as("__t"), count(lit(1)).as("__n"))
    val tf = base
      .select(col("doc"), explode(col("__tk")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dec = "decimal(38,0)"
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(totals))
      // micro-bit idf from exact-integer operands: (2N−2df+1)/(2df+1) + 1
      .withColumn("__idf_u",
        round(log2((lit(2) * col("__n") - lit(2) * col("df") + lit(1)).cast("double") /
          (lit(2) * col("df") + lit(1)).cast("double") + lit(1.0)) * lit(1e6)).cast("long"))
      .join(dl, "doc") // small tf side broadcasts; the corpus dl frame never shuffles
      // every factor casts to DECIMAL BEFORE multiplying — a long product
      // of (idf_u · tf · …) first would silently wrap for pathological tf
      .withColumn("__num",
        col("__idf_u").cast(dec) * col("tf").cast(dec) *
          lit(1000L + k1Milli).cast(dec) * lit(1000L).cast(dec) * col("__t").cast(dec))
      .withColumn("__den",
        (col("tf").cast(dec) * lit(1000000L).cast(dec) * col("__t").cast(dec)) +
          (lit(k1Milli.toLong * (1000L - bMilli)).cast(dec) * col("__t").cast(dec)) +
          (lit(k1Milli.toLong * bMilli).cast(dec) * col("dl").cast(dec) * col("__n").cast(dec)))
      .withColumn("__term_score", expr("__num div __den"))
      .groupBy("doc")
      .agg(
        sum(col("__term_score")).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }

  /** Tiny per-language marker-word lists for the n-gram/stopword language-ID
    * heuristic. Public, well-known high-frequency function words.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "por", "con", "para"))

  /** Language-ID: score = fraction of tokens that are marker words of each
    * language; predict the argmax (ties broken by language code order,
    * "und" = undetermined when no marker hits at all). One pass, no shuffle.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits = size(array_intersect(toks, array(markers.map(lit): _*)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Non-blank under the SAME normalization [[tokens]] applies: a bare
    * `trim(text) != ''` passes tab/newline-only documents (Spark `trim`
    * strips only spaces), whose tokenization is the lone empty-string
    * token — exactly the vocabulary pollution the filter exists to stop.
    * DuckDB: `trim(regexp_replace(text, '\s+', ' ', 'g')) <> ''`.
    */
  private def nonBlank(text: Column): Column =
    text.isNotNull && trim(regexp_replace(text, "\\s+", " ")) =!= ""

  /** Single-log micro-bit cost: round(log2(count)·10⁶) on an exactly
    * representable integer-valued double — the repo's proven cross-engine
    * unit for log-derived scores (see [[unigramLogProbScore]]).
    */
  private def microLog2(c: Column): Column =
    round(log2(c.cast("double")) * 1e6).cast("long")

  /** Directed skip-gram co-occurrence counts: every token pairs with each
    * of the `window` tokens FOLLOWING it (w1 precedes w2, direction kept),
    * counted corpus-wide — the pair-extraction pass of word2vec-style
    * embedding training and collocation mining. Pair emission is fully
    * IN-ROW (zip_with over shifted slices per distance, the
    * [[windowsOfWords]] construction — no position self-join, no
    * per-document shuffle); the only shuffle is the final map-side-combined
    * count, so cost scales with corpus tokens × window, never documents².
    * Blank documents are excluded (a lone empty-string token would
    * otherwise enter the vocabulary).
    */
  def skipgramPairs(df: DataFrame, textCol: String, window: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // pairs are (w1, w2) STRUCTS end-to-end: the original concat-then-
    // regex-split roundtrip re-split every exploded pair twice with a
    // regex, which a StageDiag trace at the sf10 rung showed dominating
    // the extraction stage. The words array is projected once so the
    // per-distance slices reference a computed attribute instead of
    // re-tokenizing per element.
    val w = col("__w")
    val pairArrays = (1 to window).map { j =>
      when(size(w) <= j, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(zip_with(
          slice(w, lit(1), size(w) - j),
          slice(w, lit(1 + j), size(w) - j),
          (a, b) => struct(a.as("w1"), b.as("w2"))))
    }
    df.filter(nonBlank(col(textCol)))
      .select(tokens(col(textCol)).as("__w"))
      .select(explode(flatten(array(pairArrays: _*))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_pair"))
  }

  /** Pointwise mutual information over [[skipgramPairs]], in integer
    * micro-bits: pmi ≈ log2(P(w1,w2)/(P(w1)·P(w2))) composed from
    * PER-TERM [[microLog2]] costs — `r(c₁₂) + 2·r(Tu) − r(Tp) − r(c₁) −
    * r(c₂)` — so the combination is exact BIGINT addition and no multi-term
    * float sum can ulp-flip a rounding boundary (each single-log term is
    * the proven cross-engine pattern; composition error ≤ ±3 micro-bits,
    * irrelevant at collocation-mining precision). `minCount` prunes the
    * long tail BEFORE the two vocabulary joins; the scalar totals row
    * broadcasts. High-PMI pairs = collocations; deeply negative PMI on
    * frequent pairs flags templated/boilerplate text.
    */
  def pmiPairs(
      df: DataFrame,
      textCol: String,
      window: Int = 2,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // The aggregated pair table is consumed TWICE (the tp total and the
    // scored join) and is vocab²·window-bounded — tiny next to the token
    // stream it aggregates. Without the lazy localCheckpoint the two
    // consumers each re-ran the full extract-explode-aggregate pipeline
    // (exchange reuse does not bridge the two branches under AQE), which a
    // StageDiag trace at the sf10 rung showed as the two dominant stages.
    val pairs = skipgramPairs(df, textCol, window).localCheckpoint(false)
    val uni = df
      .filter(nonBlank(col(textCol)))
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = broadcast(
      uni.agg(sum(col("c")).as("tu"))
        .crossJoin(pairs.agg(sum(col("n_pair")).as("tp"))))
    pairs
      .filter(col("n_pair") >= minCount)
      .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "__c1"), Seq("w1"))
      .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c", "__c2"), Seq("w2"))
      .crossJoin(totals)
      .select(
        col("w1"), col("w2"), col("n_pair"),
        (microLog2(col("n_pair")) + lit(2L) * microLog2(col("tu"))
          - microLog2(col("tp")) - microLog2(col("__c1")) - microLog2(col("__c2")))
          .as("pmi_micro"))
  }
}
