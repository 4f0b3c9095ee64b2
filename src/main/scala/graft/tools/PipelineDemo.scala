package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Curation, Dedup, Sampling}
import graft.sources.IoUtils

/** Runnable end-to-end corpus pipeline — the composition a training-data
  * job actually runs, wired from the library's own operators:
  *
  *   read documents → curate (quality + repetition gates + fingerprint
  *   dedup + lang tag) → incremental dedup vs a "seen" fingerprint table
  *   → near-dup cluster dedup (jaccard pairs → connected components →
  *   min-id survivors) → train/val/test split → context-window chunking
  *   of the train split → partitioned write by (split, lang_pred).
  *
  * Usage: {{{ PipelineDemo [sfDir] [outDir] }}}
  * Prints per-stage row counts; writes chunks under
  * `outDir/chunks/split=…/lang_pred=…`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-pipeline-demo"
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[pipeline] raw documents:        ${raw.count()}")

    val curated = Curation.curate(raw, "doc_id", "text",
      Curation.QualityThresholds(maxDup3gramRatio = Some(0.5)))
    println(s"[pipeline] after curation:       ${curated.count()}")

    // simulate a historical corpus: every doc_id % 4 == 0 was seen before
    val seen = raw.filter(col("doc_id") % 4 === 0)
      .select(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val fresh = Dedup.dropSeenDocuments(curated, "text", seen)
    println(s"[pipeline] after incremental:    ${fresh.count()}")

    // near-dup CLUSTER dedup: pair emission, transitive components,
    // min-id survivor per cluster
    val pairs = Dedup.jaccardPairs(fresh, "doc_id", "text", "lang_pred", threshold = 0.8)
    val unique = Dedup.dropNearDuplicates(fresh, "doc_id", pairs)
    println(s"[pipeline] after near-dup:       ${unique.count()}")

    val split = Sampling.hashSplit(
      unique, "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    split.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(s"[pipeline]   split ${r.getString(0)}: ${r.getLong(1)}"))

    val chunks = TextAnalysis.chunkDocuments(
        split.filter(col("split") === "train"), "doc_id", "text",
        chunkTokens = 64, overlapTokens = 8)
      .join(split.select(col("doc_id").as("doc"), col("split"), col("lang_pred")), Seq("doc"))
    println(s"[pipeline] train chunks:         ${chunks.count()}")

    IoUtils.writePartitioned(chunks, s"$outDir/chunks", Seq("split", "lang_pred"))
    println(s"[pipeline] chunks written under: $outDir/chunks")
    spark.stop()
  }
}
