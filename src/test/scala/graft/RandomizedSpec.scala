package graft

import org.apache.spark.sql.functions._

import graft.operators.{Association, Dedup, Sketches, Temporal}

/** Randomized brute-force cross-checks for the round-9 operators: each test
  * draws seeded random inputs (several seeds — deterministic, but not
  * hand-picked) and compares the distributed operator against a direct
  * Scala reference implementation. Complements the hand-derived cases in
  * OperatorsSpec/SketchesSpec: these catch boundary interactions (touching
  * intervals, tied scores, hash collisions at small domains) no curated
  * fixture thinks to include.
  */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  test("mergeIntervals equals a brute-force sweep over random interval sets") {
    for (seed <- Seq(1, 2, 3)) {
      val rng = new scala.util.Random(seed)
      val iv = (1 to 400).map { _ =>
        val k = s"k${rng.nextInt(4)}"
        val s = rng.nextInt(300).toLong
        (k, s, s + rng.nextInt(25).toLong) // zero-length intervals included
      }
      val got = Temporal.mergeIntervals(iv.toDF("k", "st", "en"), Seq("k"), "st", "en")
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3)).toSet
      val want = iv.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.map(r => (r._2, r._3)).sortBy(identity)
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for ((s, e) <- sorted) {
          if (spans.nonEmpty && s <= spans.last._2)
            spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, e))
          else spans += ((s, e))
        }
        spans.map { case (s, e) => (k, s, e) }
      }.toSet
      assert(got == want, s"seed=$seed: ${got.size} vs ${want.size} spans")
    }
  }

  test("hammingNearDuplicates equals brute force on random 64-bit signatures") {
    for (seed <- Seq(7, 11)) {
      val rng = new scala.util.Random(seed)
      // clustered signatures: base patterns plus few-bit flips, so pairs at
      // every hamming distance 0..5 exist and the maxHamming boundary bites
      val bases = Vector.fill(12)(rng.nextLong())
      val sigs = (1 to 150).map { i =>
        var s = bases(rng.nextInt(bases.size))
        (0 until rng.nextInt(6)).foreach(_ => s ^= 1L << rng.nextInt(64))
        (i.toLong, s)
      }
      val got = Dedup.hammingNearDuplicates(sigs.toDF("id", "sig"), "id", "sig", maxHamming = 3)
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (a, b, h)).toSet
      assert(got == want, s"seed=$seed: ${got.size} vs ${want.size} pairs")
    }
  }

  test("kmvOverlap union estimate brackets and Jaccard tracks truth on random set pairs") {
    for (seed <- Seq(3, 9)) {
      val rng = new scala.util.Random(seed)
      val a = (1 to 4000).map(_ => rng.nextInt(6000).toLong).distinct
      val b = (1 to 4000).map(_ => rng.nextInt(6000).toLong).distinct
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val union = a.toSet.union(b.toSet).size.toDouble
      val row = Sketches.kmvOverlap(a.toDF("k"), b.toDF("k"), "k", k = 256)
        .select("jaccard_ppm", "est_union").as[(Long, Long)].head()
      assert(math.abs(row._1 / 1e6 - inter / union) < 0.12,
        s"seed=$seed jaccard ${row._1 / 1e6} vs ${inter / union}")
      assert(math.abs(row._2 - union) < 0.25 * union,
        s"seed=$seed union est ${row._2} vs $union")
    }
  }

  test("pairRules support counts equal brute force on random baskets") {
    val rng = new scala.util.Random(17)
    val rows = (1 to 200).flatMap { b =>
      (0 until 1 + rng.nextInt(6)).map(_ => (b.toLong, s"i${rng.nextInt(20)}"))
    }
    val got = Association.pairRules(rows.toDF("b", "i"), "b", "i", minSupport = 3L)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._4, r._5, r._6)).toMap
    val baskets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemSupp = baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairSupp = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 3L)
    val want = pairSupp.flatMap { case ((x, y), sp) =>
      Seq((x, y) -> ((sp, itemSupp(x), itemSupp(y))), (y, x) -> ((sp, itemSupp(y), itemSupp(x))))
    }.toMap
    assert(got == want, s"${got.size} vs ${want.size} rules")
  }
}
