package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN recall sweep on the REAL embeddings table at any scale factor:
  * brute-force cosine top-k is the ground truth; each approximate method
  * is swept over its work knob and scored as recall@k = |ANN ∩ BF| / |BF|.
  *
  * Why a ladder and not one number: the testdata embeddings are
  * near-ISOTROPIC (top-10 neighbor cosines ≈ 0.3–0.4 vs a ~0 median — a
  * weak correlated component, no cluster structure), and on that geometry
  * every sub-linear ANN method trades recall against the fraction of the
  * corpus it touches. In particular the LSH defaults (16 planes × 8
  * tables) are NEAR-DUP parameters — collision probability (1 − θ/π)¹⁶ is
  * tuned for cosine ≥ 0.8 pairs and collapses to ~10⁻³ at cosine 0.4 —
  * so retrieval on diffuse corpora must drop to 4–8 planes (bigger
  * buckets, more candidates). RecallSpec pins the same operators at
  * ≥ 0.85–1.0 recall on corpora WITH planted structure; this tool
  * documents the knob→recall curve where structure is weak, and whether
  * that curve MOVES with corpus size (sf0.1 → sf1) — bucket occupancy,
  * cell balance and codebook spread all shift with n, the curve should
  * not.
  *
  * Usage: `RecallSweep <sfDir> [numQueries] [k]` — prints one JSON line
  * and a markdown table (for README) to stdout.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numQueries = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = embs.count()
    val queryPred = col("vec_id") < numQueries

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val t0 = System.nanoTime()
    val truth = pairs(Similarity.bruteForceTopK(embs, "vec_id", "embedding", queryPred, k))
    val bfSec = (System.nanoTime() - t0) / 1e9
    require(truth.nonEmpty, "brute force returned nothing — bad queryPred?")

    // nlist ≈ √n cells keeps IVF's probe fraction = nprobe/√n comparable
    // across scale factors.
    val nlist = math.max(16, math.min(1024, math.round(math.sqrt(n.toDouble)).toInt))
    val ladder: Seq[(String, String, () => DataFrame)] = Seq(
      ("lsh", "16p x 8t (near-dup default)",
        () => Similarity.lshBucketedTopK(embs, "vec_id", "embedding", queryPred, k)),
      ("lsh", "8p x 8t",
        () => Similarity.lshBucketedTopK(embs, "vec_id", "embedding", queryPred, k,
          numPlanes = 8, numTables = 8)),
      ("lsh", "6p x 12t",
        () => Similarity.lshBucketedTopK(embs, "vec_id", "embedding", queryPred, k,
          numPlanes = 6, numTables = 12)),
      ("lsh", "4p x 16t",
        () => Similarity.lshBucketedTopK(embs, "vec_id", "embedding", queryPred, k,
          numPlanes = 4, numTables = 16)),
      ("ivf", s"nlist=$nlist nprobe=4",
        () => Similarity.ivfTopK(embs, "vec_id", "embedding", queryPred, k,
          nlist = nlist, nprobe = 4, iters = 2)),
      ("ivf", s"nlist=$nlist nprobe=8",
        () => Similarity.ivfTopK(embs, "vec_id", "embedding", queryPred, k,
          nlist = nlist, nprobe = 8, iters = 2)),
      ("ivf", s"nlist=$nlist nprobe=16",
        () => Similarity.ivfTopK(embs, "vec_id", "embedding", queryPred, k,
          nlist = nlist, nprobe = 16, iters = 2)),
      ("ivf", s"nlist=$nlist nprobe=32",
        () => Similarity.ivfTopK(embs, "vec_id", "embedding", queryPred, k,
          nlist = nlist, nprobe = 32, iters = 2)),
      ("pq", "m=8 ncode=16 refine=3",
        () => Similarity.pqTopK(embs, "vec_id", "embedding", queryPred, k,
          m = 8, ncode = 16, iters = 2, refine = 3)),
      ("pq", "m=8 ncode=16 refine=10",
        () => Similarity.pqTopK(embs, "vec_id", "embedding", queryPred, k,
          m = 8, ncode = 16, iters = 2, refine = 10)),
      ("pq", "m=16 ncode=16 refine=10",
        () => Similarity.pqTopK(embs, "vec_id", "embedding", queryPred, k,
          m = 16, ncode = 16, iters = 2, refine = 10)),
      ("ivfpq", s"nlist=$nlist nprobe=32 m=16 refine=10",
        () => Similarity.ivfPqTopK(embs, "vec_id", "embedding", queryPred, k,
          nlist = nlist, nprobe = 32, m = 16, ncode = 16, iters = 2, refine = 10)))

    val rows = ladder.map { case (name, params, mk) =>
      val t = System.nanoTime()
      val got = pairs(mk())
      val sec = (System.nanoTime() - t) / 1e9
      val recall = (got & truth).size.toDouble / truth.size
      System.err.println(f"[recall] $name%-4s $recall%6.3f  ($sec%5.1f s)  [$params]")
      (name, params, recall, sec)
    }

    val entries = rows.map { case (name, params, recall, sec) =>
      f"""{"method":"$name","params":"$params","recall":$recall%.4f,"sec":$sec%.2f}"""
    }.mkString("[", ",", "]")
    val json =
      f"""{"metric":"ann_recall","sf":"$sfDir","vectors":$n,"queries":$numQueries,""" +
        f""""k":$k,"brute_force_sec":$bfSec%.2f,"sweep":$entries}"""
    println(json)
    println(s"| method | parameters | recall@$k ($n vecs) | sec |")
    println("|---|---|---|---|")
    rows.foreach { case (name, params, recall, sec) =>
      println(f"| $name | $params | $recall%.3f | $sec%.1f |")
    }
    spark.stop()
  }
}
