package graft

import org.apache.spark.sql.functions._

import graft.operators.Changelog

/** Unit specs for the CDC changelog operators. */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val snapshot = Seq(
    (1L, "alice", 10.0, 100L),
    (2L, "bob", 20.0, 100L),
    (3L, "carol", 30.0, 100L)
  ).toDF("id", "name", "score", "v")

  test("latestByKey picks the max-orderCols row per key") {
    val chg = Seq(
      (1L, "a1", 1.0, 101L), (1L, "a2", 2.0, 103L), (1L, "a3", 3.0, 102L),
      (2L, "b1", 4.0, 101L)
    ).toDF("id", "name", "score", "v")
    val latest = Changelog.latestByKey(chg, Seq("id"), Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(latest == Map(1L -> "a2", 2L -> "b1"))
  }

  test("latestByKey output keeps the input column order") {
    val out = Changelog.latestByKey(snapshot, Seq("id"), Seq("v"))
    assert(out.columns.sameElements(snapshot.columns))
  }

  test("applyChangelog upserts, inserts, deletes, and passes untouched keys through") {
    val chg = Seq(
      // id 1: two updates, later v wins
      (1L, "alice2", 11.0, 101L, "U"),
      (1L, "alice3", 12.0, 102L, "U"),
      // id 2: update then delete — the LATEST op (delete) wins
      (2L, "bob2", 21.0, 101L, "U"),
      (2L, "bob3", 22.0, 102L, "D"),
      // id 4: insert of a key absent from the snapshot
      (4L, "dave", 40.0, 101L, "U"),
      // id 5: delete of an absent key — a no-op
      (5L, "eve", 0.0, 101L, "D")
    ).toDF("id", "name", "score", "v", "op")
    val out = Changelog.applyChangelog(snapshot, chg, Seq("id"), Seq("v"), "op")
    assert(out.columns.sameElements(snapshot.columns))
    val rows = out.collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[String]("name"), r.getAs[Double]("score"))))
      .toMap
    assert(rows == Map(
      1L -> (("alice3", 12.0)), // latest update applied
      3L -> (("carol", 30.0)),  // untouched
      4L -> (("dave", 40.0))))  // inserted; 2 deleted, 5 never existed
  }

  test("an upsert with a NULL payload column really nulls it (no per-column coalesce)") {
    val chg = Seq((1L, null.asInstanceOf[String], 99.0, 101L, "U"))
      .toDF("id", "name", "score", "v", "op")
    val out = Changelog.applyChangelog(snapshot, chg, Seq("id"), Seq("v"), "op")
      .filter(col("id") === 1L).collect().head
    assert(out.getAs[String]("name") == null && out.getAs[Double]("score") == 99.0)
  }

  test("a delete-then-reinsert sequence keeps the reinserted row") {
    val chg = Seq(
      (3L, "x", 0.0, 101L, "D"),
      (3L, "carol2", 33.0, 102L, "U")
    ).toDF("id", "name", "score", "v", "op")
    val rows = Changelog.applyChangelog(snapshot, chg, Seq("id"), Seq("v"), "op")
      .filter(col("id") === 3L).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "carol2")
  }

  test("applyChangelog matches a driver-side model fold on seeded random feeds") {
    // Model-based property test (the ComparisonSpec pattern): generate a
    // random (snapshot, changelog) pair per seed, fold the changelog in
    // plain Scala, and demand frame equality. Deliberately stresses the
    // interactions the pointwise tests pin one at a time: delete-then-
    // update at mixed versions, DUPLICATE versions (tie-broken by the
    // payload struct max — (v, name, score, op) lexicographic with NULL
    // fields first, matching Spark's struct ordering), NULL payload
    // columns, inserts, and deletes of absent keys — all at once.
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      def name(pfx: String) = if (rnd.nextInt(8) == 0) null else s"$pfx${rnd.nextInt(4)}"
      val snap = (0L to 30L).filter(_ => rnd.nextBoolean())
        .map(k => (k, name("n"), rnd.nextInt(50).toDouble, 100L))
      val ops = Seq("U", "U", "U", "I", "D") // ~20% deletes; "I" pins "any non-delete op upserts"
      val chg = (1 to 80).map { _ =>
        (rnd.nextInt(40).toLong, name("c"), rnd.nextInt(50).toDouble,
          100L + rnd.nextInt(4), ops(rnd.nextInt(ops.length)))
      }

      // model: argmax per key over (v, name, score, op) — null-first, field
      // order = latestByKey's payload struct on the changes frame
      def lt(a: (Long, String, Double, Long, String), b: (Long, String, Double, Long, String)): Boolean =
        if (a._4 != b._4) a._4 < b._4
        else if (a._2 != b._2) {
          if (a._2 == null) true else if (b._2 == null) false else a._2 < b._2
        }
        else if (a._3 != b._3) a._3 < b._3
        else a._5 < b._5
      val latest = chg.groupBy(_._1).map { case (k, rows) =>
        k -> rows.reduce((x, y) => if (lt(x, y)) y else x)
      }
      val base = snap.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val expected: Set[(Long, Option[String], Double, Long)] =
        (base.keySet ++ latest.keySet).flatMap { k =>
          latest.get(k) match {
            case Some((_, _, _, _, "D")) => None
            case Some((_, n, s, v, _)) => Some((k, Option(n), s, v))
            case None => base.get(k).map { case (n, s, v) => (k, Option(n), s, v) }
          }
        }

      val got = Changelog.applyChangelog(
          snap.toDF("id", "name", "score", "v"),
          chg.toDF("id", "name", "score", "v", "op"),
          Seq("id"), Seq("v"), "op")
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getLong(3)))
      assert(got.length == got.distinct.length, s"seed=$seed: duplicate keys in output")
      assert(got.toSet == expected,
        s"seed=$seed: missing ${(expected -- got.toSet).take(3)}, " +
          s"extra ${(got.toSet -- expected).take(3)}")
    }
  }

  test("a NULL op fails loudly instead of fabricating or dropping rows") {
    // A NULL op after the full-outer join is indistinguishable from "key
    // not in the changelog": an insert would surface an all-NULL payload
    // row, an update would be silently ignored. Must raise, not guess.
    val chg = Seq((4L, "dave", 40.0, 101L, null.asInstanceOf[String]))
      .toDF("id", "name", "score", "v", "op")
    val e = intercept[Exception] {
      Changelog.applyChangelog(snapshot, chg, Seq("id"), Seq("v"), "op").collect()
    }
    assert(e.getMessage.contains("NULL in op column"),
      s"expected the NULL-op guard to fire, got: ${e.getMessage}")
  }
}
