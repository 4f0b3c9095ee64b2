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
