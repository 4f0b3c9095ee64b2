package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Stage-by-stage timing of the jaccard pipeline (dev diagnostic). */
object JaccardDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val words = docs.select(col("doc_id").as("doc"), col("lang").as("blk"),
      TextAnalysis.tokens(col("text")).as("__words")).repartition(col("doc"))
    t("words")(words.queryExecution.toRdd.count())
    val sets = words.withColumn("__set", TextAnalysis.shinglesOfWords(col("__words"))).drop("__words")
    t("sets")(sets.queryExecution.toRdd.count())
    val setsCached = sets.persist()
    t("sets persist")(setsCached.count())
    val toks = setsCached.select(col("doc"), col("blk"), size(col("__set")).as("n"),
      explode(col("__set")).as("tok"))
    t("toks explode (cached input)")(toks.queryExecution.toRdd.count())
    val toksNoSize = setsCached.select(col("doc"), col("blk"), explode(col("__set")).as("tok"))
    t("toks explode no-size (cached)")(toksNoSize.queryExecution.toRdd.count())
    val toksUncached = sets.select(col("doc"), col("blk"), explode(col("__set")).as("tok"))
    t("toks explode no-size (uncached)")(toksUncached.queryExecution.toRdd.count())
    val postings = toks.groupBy("blk", "tok")
      .agg(sort_array(collect_list(struct(col("doc"), col("n")))).as("ds"))
      .where(size(col("ds")) >= 2)
    t("postings")(postings.queryExecution.toRdd.count())
    val pairs = postings.select(explode(
      flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
    t("pairs explode")(pairs.queryExecution.toRdd.count())
    val co = pairs.groupBy(col("p.a.doc").as("doc_a"), col("p.b.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"), min(col("p.a.n")).as("na"), min(col("p.b.n")).as("nb"))
    t("co agg")(co.queryExecution.toRdd.count())

    // full operator flow with localCheckpoint on the exploded tokens
    val toksLc = sets.select(col("doc"), col("blk"), explode(col("__set")).as("tok"))
      .localCheckpoint(false)
    val sizesLc = toksLc.groupBy("doc").agg(count(lit(1)).as("n"))
    val postLc = toksLc.groupBy("blk", "tok")
      .agg(sort_array(collect_list(col("doc"))).as("ds")).where(size(col("ds")) >= 2)
    val pairsLc = postLc.select(explode(
      flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizesLc.select(col("doc").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizesLc.select(col("doc").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.8)
    t("FULL operator w/ localCheckpoint")(pairsLc.queryExecution.toRdd.count())
    t("FULL again (warm)")(pairsLc.queryExecution.toRdd.count())

    // new generate-then-verify flow, stage by stage
    val tokenized = sets.localCheckpoint(false)
    val toksN = tokenized.select(col("doc"), col("blk"), explode(col("__set")).as("tok"))
    val cands = toksN.groupBy("blk", "tok")
      .agg(sort_array(collect_list(col("doc"))).as("ds"))
      .where(size(col("ds")) >= 2 && size(col("ds")) <= 10000)
      .select(explode(
        flatten(transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + lit(2), size(col("ds"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    t("NEW cands")(cands.queryExecution.toRdd.count())
    val setsV = tokenized.select(col("doc"), col("__set").as("toks"))
    val verified = cands
      .join(setsV.withColumnRenamed("doc", "doc_a").withColumnRenamed("toks", "ta"), "doc_a")
      .join(setsV.withColumnRenamed("doc", "doc_b").withColumnRenamed("toks", "tb"), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))).cast("double"))
      .filter(col("jaccard") >= 0.8)
    t("NEW full verify")(verified.queryExecution.toRdd.count())
    t("NEW full verify (warm)")(verified.queryExecution.toRdd.count())
    spark.stop()
  }
}
