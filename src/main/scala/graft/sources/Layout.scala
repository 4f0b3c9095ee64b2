package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton curve) clustered writes — the data-layout lever for
  * multi-dimensional file skipping at scale.
  *
  * A plain `sortBy(a, b)` layout gives tight per-file min/max ranges on
  * `a` only: every file spans nearly the whole domain of `b`, so format-
  * level zone skipping (parquet row-group / file stats) prunes nothing for
  * predicates on `b`. Interleaving the BITS of each column's quantile
  * bucket into one sort key preserves locality in every clustered
  * dimension at once — each output file covers a small hyper-rectangle of
  * the (a, b, ...) space, and a selective predicate on ANY clustered
  * column skips most files.
  *
  * Scale shape (the same one Delta/Iceberg OPTIMIZE ZORDER uses): ONE
  * sampling pass for per-column quantile boundaries (driver holds
  * 2^bits−1 doubles per column — KB, broadcast with the task binary), then
  * one range-repartition + local sort on the derived key. No global sort
  * of the data beyond what any clustering write already pays, no window
  * functions, no self-joins.
  */
object Layout {

  /** The Morton key: each column is bucketed by its quantile boundaries
    * (codegen'd binary search, [[BoundaryBucket]]) and the bucket bits are
    * interleaved, column j contributing bit i to position `i*nCols + j`.
    * NULL (and NaN, which `approxQuantile` ignores) buckets clamp to the
    * curve's origin/end rather than poisoning the key — layout placement,
    * not a semantic result.
    */
  def zorderKey(boundaries: Seq[Array[Double]], cols: Seq[Column], bitsPerCol: Int): Column = {
    require(cols.nonEmpty && cols.size == boundaries.size)
    require(bitsPerCol * cols.size <= 62,
      s"zorder key must fit a long: ${cols.size} cols x $bitsPerCol bits")
    boundaries.foreach(b => require(b.length == (1 << bitsPerCol) - 1,
      s"need 2^bits-1 boundaries per column, got ${b.length}"))
    val n = cols.size
    val buckets = boundaries.zip(cols).map { case (b, c) =>
      coalesce(GraftColumnBridge.column(
        BoundaryBucket(GraftColumnBridge.expression(c.cast(DoubleType)), b)), lit(0))
        .cast(LongType)
    }
    val terms = for {
      (bucket, j) <- buckets.zipWithIndex
      i <- 0 until bitsPerCol
    } yield shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to `path` as parquet, clustered on `cols` along the
    * Z-curve, in ~`targetFiles` files. Columns must be numeric (cast
    * dates/timestamps to their epoch numbers first). `relativeError` is
    * the quantile-sketch accuracy of the sampling pass — looser is
    * cheaper and only blurs bucket edges, never correctness.
    */
  def writeZordered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      targetFiles: Int,
      bitsPerCol: Int = 8,
      relativeError: Double = 0.001): Unit = {
    require(cols.nonEmpty, "need at least one clustering column")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType],
        s"zorder column $c must be numeric, got ${dt.simpleString}")
    }
    val nb = (1 << bitsPerCol) - 1
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val bounds = df.stat.approxQuantile(cols.toArray, probs, relativeError)
    // a constant column yields identical boundaries — harmless (bucket is
    // then constant too, the column just stops contributing key bits)
    val z = zorderKey(bounds.toSeq, cols.map(col), bitsPerCol)
    val zc = "__graft_zorder"
    require(!df.columns.contains(zc), s"input already has a $zc column")
    df.withColumn(zc, z)
      .repartitionByRange(targetFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction planner: assign each file to a rewrite group of
    * ~`targetBytes` cumulative size within its table partition — the
    * planning half of an OPTIMIZE/compact pass, emitted as data so the
    * rewrite can be driven, audited or resumed as a plain job.
    *
    * Files are packed in `pathCol` order (ingest order — compaction should
    * preserve rough time locality, not re-cluster; use [[writeZordered]]
    * for that) by the running-sum rule `group = ⌊bytes-before / target⌋`:
    * next-fit packing, every group ends at or just past the target, and a
    * single over-target file forms its own group. Also flags files already
    * at ≥ `targetBytes` (`is_right_sized` — rewriting those wastes IO).
    *
    * Scale design: ONE shuffle, windowed per table partition — the window
    * key is the physical partition, so the frame is the partition's file
    * LISTING (thousands of rows), never data. At 100 TB the listing for
    * every partition plans in parallel in one stage; group ids are
    * deterministic, so re-running the planner after a partial rewrite
    * yields the same residual plan.
    */
  def planCompaction(
      files: DataFrame,
      partitionCols: Seq[String],
      pathCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be positive")
    require((partitionCols :+ pathCol :+ bytesCol).forall(files.columns.contains),
      "partitionCols, pathCol and bytesCol must exist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(pathCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    require(!files.columns.contains("__before"),
      "input already has a '__before' column (reserved scratch name) — rename it first")
    files
      .withColumn("__before", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .select(
        (partitionCols :+ pathCol :+ bytesCol).map(col) :+
          expr(s"__before div ${targetBytes}L").as("compaction_group") :+
          (col(bytesCol) >= targetBytes).as("is_right_sized"): _*)
  }
}

/** Bucket index of `child` within a sorted, broadcast-literal boundary
  * array: the number of boundaries at or below the value (binary search,
  * codegen'd — a 255-entry `when` chain would blow the codegen budget and
  * a higher-order-function fold would run interpreted per row). NaN
  * buckets to the top (Java array-search order), matching its sort
  * position in the later range partition.
  */
case class BoundaryBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "boundary_bucket"

  // Without this, a non-double child fails at EXECUTION time (interpreted:
  // ClassCastException in nullSafeEval; codegen: the generated Java doesn't
  // compile) instead of analysis time. zorderKey always casts, but the
  // class is public API.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE child (cast first), got ${child.dataType.simpleString}")
    }

  private def bucketOf(v: Double): Int = {
    val r = java.util.Arrays.binarySearch(boundaries, v)
    if (r >= 0) r + 1 else -(r + 1)
  }

  override protected def nullSafeEval(input: Any): Any =
    bucketOf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |final int $r = java.util.Arrays.binarySearch($b, $v);
         |${ev.value} = ($r >= 0) ? $r + 1 : -($r + 1);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
