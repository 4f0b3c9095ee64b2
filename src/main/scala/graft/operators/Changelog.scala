package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (CDC) operators: collapse a change stream to its latest state
  * and apply it to a snapshot — the lakehouse MERGE/upsert, expressed as a
  * plain Spark dataflow so it runs on any table format.
  *
  * Scale design: latest-per-key is ONE aggregation (`max` over a
  * version-first struct — the map-side partial combine shrinks each
  * executor's changelog to one row per local key before the shuffle; Spark
  * plans it as partial+final SortAggregate since struct buffers aren't
  * hash-aggregable), never a window sort over the full stream. The merge is ONE co-partitioned full-outer
  * join on the keys; with a small day's changelog against a huge snapshot,
  * AQE broadcasts the collapsed changes and the snapshot never shuffles.
  */
object Changelog {

  /** One row per key combination: the row with the greatest `orderCols`
    * tuple (version-columns-first lexicographic struct max).
    *
    * `(keys ++ orderCols)` must be unique per row — otherwise the
    * remaining payload columns act as the final tie-break (deterministic,
    * but rarely what you mean). `orderCols` must be non-null: SQL `max`
    * sorts struct NULL fields first, so a NULL version loses to every
    * non-null one (document-or-filter, same as ORDER BY ... DESC NULLS
    * LAST semantics would need).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols must be non-empty")
    require((keys ++ orderCols).forall(df.columns.contains),
      s"missing columns: ${(keys ++ orderCols).filterNot(df.columns.contains).mkString(", ")}")
    require(keys.intersect(orderCols).isEmpty, "keys and orderCols must not overlap")
    require(!df.columns.contains("__m"),
      "input already has a '__m' column (reserved as this helper's scratch name) — rename it first")
    val payload = orderCols ++ df.columns.filterNot(c => keys.contains(c) || orderCols.contains(c))
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__m"))
      .select(df.columns.map(c =>
        if (keys.contains(c)) col(c) else col(s"__m.$c").as(c)): _*)
  }

  /** Apply a CDC changelog to a snapshot and return the next snapshot.
    *
    * `changes` must carry the snapshot's columns plus `opCol`; the change
    * stream is first collapsed to its latest row per key (ordered by
    * `orderCols`), then merged: the latest op `deleteOp` removes the key,
    * any other op replaces the key's payload WHOLESALE (a NULL in a change
    * row really nulls the column — no per-column coalesce), and snapshot
    * keys the changelog never mentions pass through untouched. Inserts
    * (change keys absent from the snapshot) and deletes of absent keys
    * (no-ops) fall out of the full-outer join for free.
    *
    * The snapshot must be unique per `keys` (it is a snapshot); the output
    * then is too, with exactly the snapshot's schema.
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val outCols = snapshot.columns.toSeq
    require(changes.columns.toSet == (outCols :+ opCol).toSet,
      s"changes must have the snapshot's columns plus '$opCol'; " +
        s"snapshot: ${outCols.mkString(", ")} / changes: ${changes.columns.mkString(", ")}")
    require(keys.forall(outCols.contains), "keys must be snapshot columns")
    val scratch = Seq("__snap", "__chg", "__op", "__row")
    require(scratch.forall(c => !outCols.contains(c)),
      s"input already has a ${scratch.mkString("/")} column (reserved scratch names) — rename it first")
    val nonKey = outCols.filterNot(keys.contains)
    // A NULL op would be indistinguishable from "key absent from the
    // changelog" after the full-outer join: an insert with a NULL op would
    // fabricate an all-NULL payload row, and an update would be silently
    // dropped. Fail loudly instead — ops are producer-controlled and a NULL
    // one is a malformed feed, not a semantics choice.
    val opGuard = when(col(opCol).isNull,
        raise_error(lit(s"applyChangelog: NULL in op column '$opCol' — every change row needs an op")))
      .otherwise(col(opCol))
    val latest = latestByKey(changes, keys, orderCols)
      .select(keys.map(col) :+ struct(nonKey.map(col): _*).as("__chg") :+
        opGuard.as("__op"): _*)
    snapshot
      .select(keys.map(col) :+ struct(nonKey.map(col): _*).as("__snap"): _*)
      .join(latest, keys, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .withColumn("__row", when(col("__op").isNotNull, col("__chg")).otherwise(col("__snap")))
      .select(outCols.map(c =>
        if (keys.contains(c)) col(c) else col(s"__row.$c").as(c)): _*)
  }

  /** SCD Type-2 history build: turn a change stream into validity
    * intervals — one row per (key, state run), carrying the state, the
    * version tuple that opened it (`valid_from_<c>`), the version tuple of
    * the NEXT run (`valid_to_<c>`, NULL while open) and an `is_current`
    * flag. Consecutive rows whose `stateCols` are unchanged (null-safe)
    * are collapsed into the run that opened the state, the standard SCD-2
    * no-op suppression.
    *
    * Scale design: ONE shuffle on `keys`; both the change-suppression lag
    * and the interval lead run over the same (keys, orderCols) window, so
    * the exchange is planned once and the frames never leave their
    * partition. No driver actions, no joins — history for a 100 TB change
    * stream is a single window stage. `(keys ++ orderCols)` must be unique
    * and `orderCols` non-null, as in [[latestByKey]].
    */
  def scd2History(
      changes: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      stateCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty && orderCols.nonEmpty && stateCols.nonEmpty,
      "keys, orderCols and stateCols must be non-empty")
    val all = keys ++ orderCols ++ stateCols
    require(all.forall(changes.columns.contains),
      s"missing columns: ${all.filterNot(changes.columns.contains).mkString(", ")}")
    require(all.distinct.size == all.size, "keys/orderCols/stateCols must be disjoint")
    val scratch = Seq("__prev", "__next")
    require(scratch.forall(c => !changes.columns.contains(c)),
      s"input already has a ${scratch.mkString("/")} column (reserved scratch names) — rename it first")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    val state = struct(stateCols.map(col): _*)
    changes
      .select((keys ++ orderCols ++ stateCols).map(col): _*)
      .withColumn("__prev", lag(state, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> state))
      .withColumn("__next", lead(struct(orderCols.map(col): _*), 1).over(w))
      .select(keys.map(col) ++ stateCols.map(col) ++
        orderCols.map(c => col(c).as(s"valid_from_$c")) ++
        orderCols.map(c => col(s"__next.$c").as(s"valid_to_$c")) :+
        col("__next").isNull.as("is_current"): _*)
  }
}
