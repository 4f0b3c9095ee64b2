package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators Spark has no native plan for. */
object Temporal {

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
}
