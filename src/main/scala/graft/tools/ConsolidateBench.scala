package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.DatasetParams
import graft.core.Comparison
import graft.jobs.ComparisonJob

/** Multi-dataset consolidation at a REALISTIC dataset count — the stress
  * the 2-dataset `q_compare_multi` catalog row cannot exert. The
  * reference's consolidation loop (`comparison_job.py:270-291`) is
  * driver-SEQUENTIAL: one `compare_dataframes` per dataset, then a
  * positional union of the per-dataset reports — so the two things that
  * can rot at 50+ datasets are (1) per-dataset driver/job overhead
  * accumulating super-linearly (each compare adds cached frames and
  * listener state to the shared session) and (2) the consolidated report
  * plan growing into a union tree whose re-analysis cost explodes. This
  * bench measures both, separated:
  *
  *  - `construct_sec` — the N sequential `compareDataFrames` calls (each
  *    runs its own eager slim-stats jobs, exactly the reference loop's
  *    per-dataset cost), plus per-dataset min/max so a trend is visible;
  *  - `consolidate_sec` — the pure driver-side `consolidate()` fold (plan
  *    union construction, no jobs);
  *  - `materialize_sec` — one action over each consolidated report (the
  *    union plan actually analyzed + executed once).
  *
  * Datasets are PARTITION SLICES of the corpus (`key % N == i`), so N
  * scales without multiplying total data — the measurement isolates
  * consolidation overhead from corpus size. Schemas ALTERNATE between the
  * orders shape (PK `o_orderkey`) and the embeddings shape (PK `vec_id`),
  * so the run exercises `normalize_row_keys` consolidation across mixed
  * key schemas, the mode heterogeneous 50-dataset jobs need. Every third
  * dataset's target carries a planted value perturbation, so the sweep
  * covers both the clean fast path and the mismatch-refetch path.
  *
  * Usage: `ConsolidateBench <sfDir> [nDatasets]` (default 50). One JSON
  * line on stdout; per-dataset seconds on stderr.
  */
object ConsolidateBench {

  def main(args: Array[String]): Unit = {
    val (sfDir, n) = args match {
      case Array(d) => (d, 50)
      case Array(d, k) => (d, k.toInt)
      case _ =>
        System.err.println("usage: ConsolidateBench <sfDir> [nDatasets]")
        sys.exit(2)
        throw new IllegalStateException
    }
    require(n >= 2, s"need >= 2 datasets, got $n")
    if (sys.env.getOrElse("SPARK_GRAFT_PRETOUCH", "1") != "0") graft.Bench.preTouchHeap()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def dataset(i: Int): (DataFrame, DataFrame, DatasetParams) =
      if (i % 2 == 0) {
        val slice = orders.filter(col("o_orderkey") % n === i)
        val tgt =
          if (i % 3 == 0)
            slice.withColumn("o_orderstatus",
              when(col("o_orderkey") % 5 === 0, lit("X")).otherwise(col("o_orderstatus")))
          else slice
        (slice, tgt, DatasetParams(s"ds_$i", Seq("o_orderkey")))
      } else {
        val slice = embs.filter(col("vec_id") % n === i).select("vec_id", "label")
        val tgt =
          if (i % 3 == 0)
            // perturb WITHIN the column's integer type: a string literal
            // here changes the target column's TYPE, which the engine now
            // rejects loudly upfront (reconcileTypes) — this bench
            // measures consolidation cost, not the type guard
            slice.withColumn("label",
              when(col("vec_id") % 5 === 0, col("label") + lit(7777)).otherwise(col("label")))
          else slice
        (slice, tgt, DatasetParams(s"ds_$i", Seq("vec_id")))
      }

    val perDataset = new Array[Double](n)
    val t0 = System.nanoTime()
    val results = (0 until n).map { i =>
      val (src, tgt, params) = dataset(i)
      val ti = System.nanoTime()
      val r = Comparison.compareDataFrames(spark, src, tgt, params)
      perDataset(i) = (System.nanoTime() - ti) / 1e9
      System.err.println(f"[consolidate] ds_$i%-6s ${perDataset(i)}%6.2f s")
      r
    }
    val constructSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val consolidated = ComparisonJob.consolidate(results, normalizeRowKeys = true)
    val consolidateSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val overallRows = consolidated.overallTestReport.count()
    val rowRows = consolidated.rowLvlTestReport.count()
    val colRows = consolidated.colLvlTestReport.count()
    val materializeSec = (System.nanoTime() - t2) / 1e9

    consolidated.unpersist()
    // per-dataset drift is the super-linearity signal: if the session
    // accumulates cost, the last datasets run slower than the first
    val firstHalf = perDataset.take(n / 2).sum / (n / 2)
    val secondHalf = perDataset.drop(n / 2).sum / (n - n / 2)
    println(
      s"""{"metric":"consolidate_bench","unit":"sec","n_datasets":$n,""" +
        s""""construct_sec":$constructSec,"consolidate_sec":$consolidateSec,""" +
        s""""materialize_sec":$materializeSec,""" +
        s""""per_dataset_first_half_avg":$firstHalf,"per_dataset_second_half_avg":$secondHalf,""" +
        s""""overall_rows":$overallRows,"row_lvl_rows":$rowRows,"col_lvl_rows":$colRows,""" +
        s""""sf":${Jsons.str(sfDir)}}""")
    spark.stop()
  }
}
