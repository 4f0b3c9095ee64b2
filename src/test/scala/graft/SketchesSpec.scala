package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Unit specs for the deterministic mergeable sketches (HLL / KMV / CMS):
  * hash-geometry correctness, the three merge laws, estimator accuracy on
  * known cardinalities, and the estimators' one-sided error guarantees.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // n distinct keys, each possibly repeated, tagged with a bucket column
  private def keyed(n: Int, copies: Int = 1) =
    (1 to n).flatMap(i => (1 to copies).map(_ => (i.toLong, i % 7)))
      .toDF("k", "bucket")

  test("trailingZeros matches Long.numberOfTrailingZeros, capped") {
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 6L, 8L, 12L, 96L, 1L << 20, (1L << 53) - 2,
      (1L << 29), (1L << 30), (1L << 40), 5L * (1L << 35))
    val got = vals.toDF("w").select(Sketches.trailingZeros(col("w")).as("tz"))
      .as[Long].collect()
    val want = vals.map { w =>
      if (w == 0L) (Sketches.HllRhoCap - 1).toLong
      else math.min(java.lang.Long.numberOfTrailingZeros(w), Sketches.HllRhoCap - 1).toLong
    }
    assert(got.toSeq == want)
  }

  test("HLL merge of bucket partials is bit-identical to a one-shot sketch") {
    val df = keyed(2000, copies = 3).withColumn("g", lit("all"))
    val oneShot = Sketches.hllPartial(df, Seq("g"), "k")
      .orderBy("reg").as[(String, Long, Long)].collect()
    val merged = Sketches.hllMerge(
      Sketches.hllPartial(df, Seq("g", "bucket"), "k"), Seq("g"))
      .orderBy("reg").as[(String, Long, Long)].collect()
    assert(merged.sameElements(oneShot))
    // idempotent: re-merging the merged state changes nothing (safe retries)
    val twice = Sketches.hllMerge(
      Sketches.hllMerge(Sketches.hllPartial(df, Seq("g", "bucket"), "k"), Seq("g"))
        .withColumn("bucket", lit(0)), Seq("g"))
      .orderBy("reg").as[(String, Long, Long)].collect()
    assert(twice.sameElements(oneShot))
  }

  test("HLL estimate is within the m=64 error envelope on known cardinalities") {
    for (n <- Seq(500, 2000, 10000)) {
      val df = keyed(n).withColumn("g", lit("all"))
      val est = Sketches.hllEstimate(Sketches.hllPartial(df, Seq("g"), "k"), Seq("g"))
        .select("est_distinct").as[Long].head()
      // 13% standard error at m=64; 3σ envelope on deterministic data
      assert(math.abs(est - n) <= 0.4 * n, s"n=$n est=$est")
    }
  }

  test("HLL small-range regime uses the precomputed linear-counting table") {
    val df = keyed(40).withColumn("g", lit("all"))
    val row = Sketches.hllEstimate(Sketches.hllPartial(df, Seq("g"), "k"), Seq("g"))
      .select("n_occupied", "est_distinct").as[(Long, Long)].head()
    val (occ, est) = row
    assert(occ < Sketches.HllM) // zeros remain → LC regime reachable
    assert(est == Sketches.HllLcTable((Sketches.HllM - occ).toInt - 1))
    assert(math.abs(est - 40) <= 12, s"LC est=$est for n=40")
  }

  test("HLL duplicates never move the sketch") {
    val once = Sketches.hllPartial(keyed(300).withColumn("g", lit("a")), Seq("g"), "k")
      .orderBy("reg").as[(String, Long, Long)].collect()
    val many = Sketches.hllPartial(keyed(300, copies = 11).withColumn("g", lit("a")), Seq("g"), "k")
      .orderBy("reg").as[(String, Long, Long)].collect()
    assert(many.sameElements(once))
  }

  test("KMV merge of partials equals the one-shot state; below-k is exact") {
    val df = keyed(1000).withColumn("g", lit("all"))
    val k = 64
    val oneShot = Sketches.kmvPartial(df, Seq("g"), "k", k)
      .orderBy("h").as[(String, Long)].collect()
    val merged = Sketches.kmvMerge(
      Sketches.kmvPartial(df, Seq("g", "bucket"), "k", k)
        .drop("bucket"), Seq("g"), k)
      .orderBy("h").as[(String, Long)].collect()
    assert(merged.sameElements(oneShot))
    // 30 distinct < k=64 → the state IS the set and the estimate is exact
    val small = keyed(30).withColumn("g", lit("all"))
    val est = Sketches.kmvEstimate(
      Sketches.kmvPartial(small, Seq("g"), "k", k), Seq("g"), k)
      .select("n_state", "est_distinct").as[(Long, Long)].head()
    assert(est == ((30L, 30L)))
  }

  test("KMV estimate lands inside the k=128 error envelope") {
    val df = keyed(5000).withColumn("g", lit("all"))
    val est = Sketches.kmvEstimate(
      Sketches.kmvPartial(df, Seq("g"), "k", 128), Seq("g"), 128)
      .select("est_distinct").as[Long].head()
    assert(math.abs(est - 5000) <= 0.3 * 5000, s"est=$est") // ~9% σ, 3σ+
  }

  test("kmvOverlap estimates Jaccard; disjoint sets report zero") {
    // A = 1..1500, B = 501..2000 → |A∩B| = 1000, |A∪B| = 2000, J = 0.5
    val a = (1 to 1500).map(_.toLong).toDF("k")
    val b = (501 to 2000).map(_.toLong).toDF("k")
    val row = Sketches.kmvOverlap(a, b, "k", k = 128)
      .select("n_state", "jaccard_ppm", "est_union", "est_intersection")
      .as[(Long, Long, Long, Long)].head()
    val (nState, jPpm, estU, estI) = row
    assert(nState == 128L)
    assert(math.abs(jPpm - 500000L) <= 160000L, s"jaccard_ppm=$jPpm") // ±0.16 abs
    assert(math.abs(estU - 2000L) <= 600L, s"est_union=$estU")
    assert(math.abs(estI - 1000L) <= 500L, s"est_intersection=$estI")
    val disjoint = Sketches.kmvOverlap(
      (1 to 500).map(_.toLong).toDF("k"),
      (1001 to 1500).map(_.toLong).toDF("k"), "k", k = 128)
      .select("n_matches", "jaccard_ppm", "est_intersection")
      .as[(Long, Long, Long)].head()
    assert(disjoint == ((0L, 0L, 0L)))
  }

  test("CMS merge law holds and estimates never undercount") {
    val df = keyed(400, copies = 2).withColumn("heavy", lit(0L))
      .union((1 to 300).map(_ => (9999L, 0)).toDF("k", "bucket").withColumn("heavy", lit(1L)))
      .drop("heavy")
    val oneShot = Sketches.cmsMerge(Sketches.cmsPartial(df, "k", depth = 4, width = 256))
      .orderBy("r", "cell").as[(Int, Long, Long)].collect()
    val merged = Sketches.cmsMerge(
      Sketches.cmsPartial(df, "k", depth = 4, width = 256, bucketCol = Some("bucket")))
      .orderBy("r", "cell").as[(Int, Long, Long)].collect()
    assert(merged.sameElements(oneShot))

    val truth = df.groupBy("k").agg(count(lit(1)).as("true_count"))
    val est = Sketches.cmsEstimate(
      Sketches.cmsMerge(Sketches.cmsPartial(df, "k", 4, 256)),
      truth, "k", 4, 256)
      .join(truth, "k")
      .select("k", "est_count", "true_count").as[(Long, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (k, e, t) =>
      assert(e >= t, s"CMS undercounted key $k: est=$e true=$t")
    }
    // the injected heavy hitter stays clearly identifiable above the noise
    val heavy = est.find(_._1 == 9999L).get
    assert(heavy._2 >= 300L && heavy._2 <= 330L, s"heavy est=${heavy._2}")
  }

  test("CMS point query for a never-seen value is 0 when its cells are empty") {
    val tiny = Seq(1L, 2L, 3L).toDF("k") // 9 occupied cells of 4×256
    val counters = Sketches.cmsMerge(Sketches.cmsPartial(tiny, "k", 4, 256))
    val est = Sketches.cmsEstimate(counters, Seq(424242L).toDF("k"), "k", 4, 256)
      .select("est_count").as[Long].collect()
    assert(est.length == 1 && est.head == 0L,
      s"never-seen value must report 0, got ${est.toSeq}")
  }

  test("cmsEstimate rejects unmerged bucketed partials (silent undercount risk)") {
    val df = (1L to 50L).map(i => (i, (i % 3).toInt)).toDF("k", "bucket")
    val bucketed = Sketches.cmsPartial(df, "k", 4, 64, bucketCol = Some("bucket"))
    val ex = intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(bucketed, df.select("k"), "k", 4, 64)
    }
    assert(ex.getMessage.contains("cmsMerge"))
  }

  test("HLL register state is bounded by m per key regardless of input size") {
    val df = keyed(50000).withColumn("g", (col("k") % 3).cast("string"))
    val counts = Sketches.hllPartial(df, Seq("g"), "k")
      .groupBy("g").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(counts.forall(_ <= Sketches.HllM))
  }
}
