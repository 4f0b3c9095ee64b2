package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Recall/precision property tests for the approximate dedup paths, against
  * exact brute-force ground truth on SEEDED generated corpora — the single
  * oracle fixture proves full recall at one setting; these sweep settings.
  *
  * Determinism: corpora come from a fixed-seed `scala.util.Random`, and both
  * the MinHash family and the hyperplane LSH derive their parameters from
  * fixed arithmetic sequences (no per-run RNG), so every measured recall
  * below is a constant of the code, not a flaky sample — the asserted bounds
  * are pinned slightly under the measured values.
  *
  * The PRECISION assertions are structural, not statistical: both
  * `minhashNearDuplicates` and `lshNearDuplicates` exactly verify every
  * candidate pair (true jaccard via count-join / true fixed-point cosine)
  * before reporting, so reported ⊆ ground-truth must hold EXACTLY at every
  * setting; any violation is a bug, not noise.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  // --- seeded text corpus with graded near-duplicate pairs ---------------

  /** 40 base docs of 30 words from a 120-word vocab; each gets one mutated
    * twin with i%7 words replaced — jaccard over word 3-shingles then spans
    * roughly 0.3..1.0, straddling any threshold in between.
    */
  private lazy val textCorpus: DataFrame = {
    val rnd = new scala.util.Random(20260813L)
    val vocab = (0 until 120).map(i => s"w$i")
    val rows = (0 until 40).flatMap { i =>
      val words = Array.fill(30)(vocab(rnd.nextInt(vocab.size)))
      val twin = words.clone()
      (0 until i % 7).foreach { _ =>
        twin(rnd.nextInt(twin.length)) = vocab(rnd.nextInt(vocab.size))
      }
      Seq((i.toLong * 2, words.mkString(" ")), (i.toLong * 2 + 1, twin.mkString(" ")))
    }
    rows.toDF("doc_id", "text").withColumn("blk", lit(0))
  }

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.collect().map { r =>
      val (x, y) = (r.getAs[Long](a), r.getAs[Long](b))
      (math.min(x, y), math.max(x, y))
    }.toSet

  test("minhash banding recall vs brute-force jaccard across (hashes, bands) settings") {
    val threshold = 0.5
    // exact ground truth: one block holds the whole corpus, df cap not binding
    val brute = pairSet(
      Dedup.jaccardPairs(textCorpus, "doc_id", "text", "blk", threshold), "doc_a", "doc_b")
    assert(brute.size >= 15, s"fixture must exercise the path, got ${brute.size} true pairs")

    // (numHashes, bands, pinned recall floor): 2 rows/band is the
    // high-recall setting; 4 rows/band trades recall for fewer candidates
    val settings = Seq((32, 16, 1.0), (64, 32, 1.0), (32, 8, 0.85))
    settings.foreach { case (numHashes, bands, recallFloor) =>
      val got = pairSet(
        Dedup.minhashNearDuplicates(textCorpus, "doc_id", "text", threshold, numHashes, bands),
        "doc_a", "doc_b")
      // precision is exact by construction (candidates are verify-joined)
      assert(got.subsetOf(brute),
        s"($numHashes,$bands): reported non-pairs ${got -- brute}")
      val recall = (got & brute).size.toDouble / brute.size
      assert(recall >= recallFloor,
        s"($numHashes,$bands): recall $recall below floor $recallFloor (missed ${brute -- got})")
    }
  }

  test("simhash hamming blocking recall vs direct signature distance") {
    // simhashNearDuplicates' pigeonhole blocking claims EXACT recall for
    // hamming < segments; verify on the generated corpus (not the fixture)
    val blocked = pairSet(
      Dedup.simhashNearDuplicates(textCorpus, "doc_id", "text", maxHamming = 3),
      "doc_a", "doc_b")
    val sig = Dedup.simhash(textCorpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("simhash")).toMap
    val brute = (for {
      a <- sig.keys; b <- sig.keys if a < b
      if java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 3
    } yield (a, b)).toSet
    assert(blocked == brute, s"missed ${brute -- blocked}, extra ${blocked -- brute}")
    assert(brute.size >= 10, s"fixture must exercise the path, got ${brute.size}")
  }

  // --- seeded embedding corpus with graded cosine pairs ------------------

  /** 50 base unit-ish vectors (dim 16); each gets a twin at noise level
    * (i%5)·0.15 — twin cosines then grade from ~1.0 down through the
    * threshold, so recall is measured on both easy and boundary pairs.
    */
  private lazy val embCorpus: DataFrame = {
    val rnd = new scala.util.Random(77L)
    def gauss(): Double = rnd.nextGaussian()
    val rows = (0 until 50).flatMap { i =>
      val base = Array.fill(16)(gauss())
      val eps = (i % 5) * 0.15
      val twin = base.map(v => v + eps * gauss())
      def norm(a: Array[Double]) = {
        val n = math.sqrt(a.map(x => x * x).sum)
        a.map(x => (x / n).toFloat)
      }
      Seq((i.toLong * 2, norm(base)), (i.toLong * 2 + 1, norm(twin)))
    }
    rows.toDF("vec_id", "embedding").withColumn("blk", lit(0))
  }

  test("PQ ADC recall vs exact top-k across (m, ncode) settings; Lloyd refinement helps") {
    import org.apache.spark.sql.functions.col
    val k = 5
    def topIds(df: DataFrame): Map[Long, Set[Long]] = df
      .collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("cand_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topIds(Similarity.bruteForceTopK(
      embCorpus, "vec_id", "embedding", col("vec_id") < 10, k))
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.map { case (q, ids) => (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
        .sum / exact.size
    // Random Gaussian vectors are PQ's WORST case (no cluster structure to
    // exploit), so these floors — pinned just under deterministic measured
    // values (0.64 / 0.40 / 0.36) — are a lower bound on real-corpus
    // behavior. Finer quantization (more subspaces) must not hurt.
    val settings = Seq((8, 16, 0.6), (4, 16, 0.35), (2, 8, 0.3))
    val recalls = settings.map { case (m, ncode, floor) =>
      val r = recall(topIds(Similarity.pqTopK(
        embCorpus, "vec_id", "embedding", col("vec_id") < 10, k, m, ncode, iters = 0)))
      assert(r >= floor, s"(m=$m, ncode=$ncode): recall@$k $r below floor $floor")
      r
    }
    assert(recalls.head >= recalls.last,
      s"recall must not degrade with finer quantization: $recalls")
    // Lloyd-refined codebooks must not be worse than raw pivot seeding
    // (measured 0.40 -> 0.48 on this fixture)
    val r0 = recall(topIds(Similarity.pqTopK(
      embCorpus, "vec_id", "embedding", col("vec_id") < 10, k, 4, 16, iters = 0)))
    val r2 = recall(topIds(Similarity.pqTopK(
      embCorpus, "vec_id", "embedding", col("vec_id") < 10, k, 4, 16, iters = 2)))
    assert(r2 >= r0 - 0.1, s"Lloyd refinement degraded recall: $r0 -> $r2")
    // The production answer to quantization loss: exact re-rank over the
    // k·refine ADC survivors recovers most of the recall
    val rr = recall(topIds(Similarity.pqTopK(
      embCorpus, "vec_id", "embedding", col("vec_id") < 10, k, 4, 16, iters = 0, refine = 6)))
    assert(rr >= r0 + 0.2, s"re-ranking must substantially beat pure ADC: $r0 -> $rr")

    // The COMPOSED IVF-PQ layout: on this 100-vector corpus a generous
    // probe (8 of 10 cells) makes IVF pruning near-lossless, so the
    // composition must track plain PQ-with-refine within the pruning loss
    // (measured 0.84 vs 0.88) — and beat its own pure-ADC floor.
    val comp = recall(topIds(Similarity.ivfPqTopK(
      embCorpus, "vec_id", "embedding", col("vec_id") < 10, k,
      nlist = 10, nprobe = 8, m = 4, ncode = 16, iters = 0, refine = 6)))
    assert(comp >= rr - 0.15,
      s"IVF-PQ with generous probing must track refined PQ: pq=$rr ivfpq=$comp")
    assert(comp >= r0 + 0.1, s"composition must beat pure ADC: adc=$r0 ivfpq=$comp")
  }

  test("IVF-PQ degenerates EXACTLY to PQ when every cell is probed (nprobe = nlist)") {
    // With nprobe = nlist the IVF stage prunes nothing — every (query,
    // cand) pair survives to ADC — so the composition must return
    // bit-identical rows to plain pqTopK at the same (m, ncode, refine).
    // This pins the composition seam itself: any drift in the restricted
    // ADC join (wrong key, lost pair, changed tie-break) breaks equality.
    import org.apache.spark.sql.functions.col
    def rows(df: DataFrame): Set[(Long, Long, Double)] = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"), r.getDouble(2))).toSet
    val pq = rows(Similarity.pqTopK(
      embCorpus, "vec_id", "embedding", col("vec_id") < 10, k = 5,
      m = 4, ncode = 16, iters = 0, refine = 3))
    val comp = rows(Similarity.ivfPqTopK(
      embCorpus, "vec_id", "embedding", col("vec_id") < 10, k = 5,
      nlist = 12, nprobe = 12, m = 4, ncode = 16, iters = 0, refine = 3))
    assert(comp == pq, s"full-probe composition must equal plain PQ:\n  pq-only=${pq -- comp}\n  comp-only=${comp -- pq}")
  }

  test("semanticDecontaminate recall vs exact cosine across (planes, tables) settings") {
    import spark.implicits._
    val threshold = 0.9
    val eval = embCorpus.filter(col("vec_id") % 2 === 0)
    val corpus = embCorpus.filter(col("vec_id") % 2 =!= 0)
    val corpusIds = corpus.select("vec_id").as[Long].collect().toSet
    // exact ground truth: odd (corpus) ids with cosine >= t to any even
    // (eval) id — from the brute-force all-pairs set, cross-parity pairs
    val truePairs = pairSet(
      Similarity.embeddingNearDuplicates(embCorpus, "vec_id", "embedding", "blk", threshold),
      "id_a", "id_b")
    val trueCont = truePairs.collect {
      case (x, y) if (x % 2 == 0) != (y % 2 == 0) => if (x % 2 == 1) x else y
    }
    assert(trueCont.size >= 10, s"fixture must exercise the path, got ${trueCont.size}")
    // fewer planes → bigger buckets → higher recall; more tables → more
    // chances to collide. PRECISION is structural at every setting: the
    // exact in-row cosine verify means dropped ⊆ truly-contaminated.
    // floors pinned just under the deterministic measured recalls
    // (1.0 / 1.0 / 0.921 on this fixture)
    val settings = Seq((4, 8, 1.0), (8, 8, 0.95), (16, 4, 0.9))
    settings.foreach { case (planes, tables, floor) =>
      val kept = Similarity.semanticDecontaminate(
          corpus, "vec_id", "embedding", eval, "vec_id", "embedding",
          threshold, planes, tables)
        .select("vec_id").as[Long].collect().toSet
      val dropped = corpusIds -- kept
      assert(dropped.subsetOf(trueCont),
        s"($planes,$tables): dropped non-contaminated rows ${dropped -- trueCont}")
      val recall = (dropped & trueCont).size.toDouble / trueCont.size
      info(s"($planes,$tables): recall $recall")
      assert(recall >= floor,
        s"($planes,$tables): recall $recall below floor $floor (missed ${trueCont -- dropped})")
    }
  }

  test("hyperplane LSH recall vs exact blocked cosine across (planes, tables) settings") {
    val threshold = 0.9
    val exact = pairSet(
      Similarity.embeddingNearDuplicates(embCorpus, "vec_id", "embedding", "blk", threshold),
      "id_a", "id_b")
    assert(exact.size >= 20, s"fixture must exercise the path, got ${exact.size} true pairs")

    // more tables → higher recall; fewer planes → bigger buckets, higher recall
    val settings = Seq((8, 16, 1.0), (8, 8, 0.95), (16, 8, 0.85))
    settings.foreach { case (planes, tables, recallFloor) =>
      val got = pairSet(
        Similarity.lshNearDuplicates(embCorpus, "vec_id", "embedding", threshold, planes, tables),
        "id_a", "id_b")
      assert(got.subsetOf(exact),
        s"($planes,$tables): reported non-pairs ${got -- exact}")
      val recall = (got & exact).size.toDouble / exact.size
      assert(recall >= recallFloor,
        s"($planes,$tables): recall $recall below floor $recallFloor (missed ${exact -- got})")
    }
  }
}
