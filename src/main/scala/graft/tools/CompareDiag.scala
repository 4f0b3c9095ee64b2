package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Queries
import graft.config.{DatasetParams, TestParams}
import graft.core.Comparison

/** Stage-level timing of the comparison engine construction (dev
  * diagnostic): runs the q_compare_* orders scenario and prints where the
  * construction wall-time goes.
  */
object CompareDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("spark warm")(spark.range(1000000).selectExpr("sum(id)").collect())
    val (src, tgt) = Queries.compareScenario(spark, sfDir)
    t("src count")(src.count())
    t("tgt count")(tgt.count())

    // inline replica of the engine pipeline, one timed action per stage
    {
      import org.apache.spark.sql.functions._
      import org.apache.spark.storage.StorageLevel
      val keyCols = Seq("o_orderkey")
      val nonKey = src.columns.toSeq.filterNot(keyCols.contains)
      def side(df: org.apache.spark.sql.DataFrame, sfx: String) =
        df.withColumn(s"chk$sfx", sha2(concat_ws("", nonKey.map(col): _*), 256))
          .withColumnsRenamed(nonKey.map(c => c -> s"$c$sfx").toMap)
          .persist(StorageLevel.MEMORY_AND_DISK)
      val s2 = side(src, "_s"); val t2 = side(tgt, "_t")
      t("persist src side")(s2.queryExecution.toRdd.count())
      t("persist tgt side")(t2.queryExecution.toRdd.count())
      val joined = s2.join(t2, keyCols, "full_outer")
        .withColumn("m", col("chk_s") <=> col("chk_t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("full-outer join persist")(joined.queryExecution.toRdd.count())
      val key = struct(keyCols.map(col): _*)
      t("matchKeyStats-like 3x count_distinct")(
        joined.agg(
          count_distinct(when(col("chk_s").isNull, key)),
          count_distinct(when(col("chk_t").isNull, key)),
          count_distinct(when(col("m"), key))).collect())
      t("side stats tagged agg")(
        s2.select(col("o_orderkey")).withColumn("s", lit("a"))
          .union(t2.select(col("o_orderkey")).withColumn("s", lit("b")))
          .groupBy(col("s"), col("o_orderkey")).count()
          .groupBy("s").agg(sum("count"), sum(when(col("count") > 1, 1L)))
          .collect())
      s2.unpersist(); t2.unpersist(); joined.unpersist()
    }
    val result = t("compareDataFrames (2 actions)") {
      Comparison.compareDataFrames(
        spark, src, tgt,
        DatasetParams("orders_cmp", Seq("o_orderkey"), TestParams(differenceTolerance = 0.01)))
    }
    t("colLvl collect")(result.colLvlTestReport.collect())
    t("rowLvl count (lazy window)")(result.rowLvlTestReport.queryExecution.toRdd.count())
    t("overall collect")(result.overallTestReport.collect())
    result.unpersist()
    spark.stop()
  }
}
