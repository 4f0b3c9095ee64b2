package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic "onion" graph generator for deep-peel k-core benchmarks.
  *
  * The production catalog's k=80 co-occurrence graph fixes in ~5 peel
  * rounds, which cannot exercise the base-shrink lever
  * (`Graphs.kCoreManaged(baseShrinkFraction)`): its payoff term is
  * rounds × O(|live base|) probe scans, so the claim needs a graph that
  * peels in HUNDREDS of rounds. This construction peels exactly one layer
  * per round at k = 3, by design rather than by tuning:
  *
  *  - `layers` concentric layers of `perLayer` nodes each. Node (i, j)
  *    sends exactly TWO "up" edges to layer i+1 (targets j and
  *    j + perLayer/2, mod perLayer), so every node in layer i+1 receives
  *    exactly two "down" edges — degree 4 while its supporting layer is
  *    alive, degree 2 the round after it peels;
  *  - layer 1 has no support (degree 2 < 3) and peels in round 1; layer i
  *    peels in round i; total rounds = `layers`, each removing exactly
  *    `perLayer` nodes — a linear peel front over a big live base, the
  *    adversarial shape for per-round probe scans;
  *  - the core is a `perLayer`-node circulant (each node to its next
  *    three neighbors, degree 6 ≥ k) that also absorbs layer `layers`'s
  *    up-edges — it survives every peel, so the A/B's core-size
  *    invariant check has a non-trivial fixed point.
  *
  * Everything is closed-form from (i, j) — no randomness, so the A/B's
  * two cells read byte-identical inputs.
  *
  * The optional `bulkNodes` argument turns the onion into a COMET: that
  * many extra degree-2 nodes, each with two edges into distinct core
  * slots, all peeling in round 1. This is the shape the base-shrink
  * lever's VALUE claim lives in — the uniform onion is the adversarial
  * shape (live base stays large while rounds accumulate, rebuilds can
  * only lose), while real deep peels drop most of the graph early and
  * grind their long round tail over a small residual. With a 75M-node
  * bulk over a 150 × 5k onion (~150M edges), survivors fall under the 1M
  * rebuild gate after round 1: shrink-on then probes a ~1.5M-edge
  * rebuilt base for 149 rounds where shrink-off scans the full ~152M-edge
  * original cache every round — the rounds × O(|live base|) term the
  * lever exists to cut, finally measured where it dominates.
  *
  * Usage: `OnionGen <outPath> <layers> <perLayer> [bulkNodes]` — writes
  * an edge list (pa, pb) parquet that `KcoreAB <outPath> <on|off> 3
  * <layers+10>` consumes.
  */
object OnionGen {
  def main(args: Array[String]): Unit = {
    val (out, layers, perLayer, bulkNodes) = args match {
      case Array(o, l, p) => (o, l.toInt, p.toInt, 0L)
      case Array(o, l, p, b) => (o, l.toInt, p.toInt, b.toLong)
      case _ =>
        System.err.println("usage: OnionGen <outPath> <layers> <perLayer> [bulkNodes]")
        sys.exit(2)
        throw new IllegalStateException
    }
    require(bulkNodes >= 0, s"bulkNodes must be >= 0, got $bulkNodes")
    require(layers >= 2 && perLayer >= 8 && perLayer % 2 == 0,
      s"need layers >= 2 and even perLayer >= 8, got ($layers, $perLayer)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = perLayer.toLong
    val half = n / 2
    // node id: layer i (1-based) slot j -> i*n + j; core occupies slot
    // range (layers+1)*n .. (layers+1)*n + n - 1
    val coreBase = (layers + 1).toLong * n
    val slots = spark.range(layers.toLong * n)
      .select((col("id") / n).cast("long").as("i"), (col("id") % n).as("j"))
      .select((col("i") + 1).as("i"), col("j")) // layers 1..layers
    val up = slots.select(
      (col("i") * n + col("j")).as("pa"),
      when(col("i") < layers, (col("i") + 1) * n + col("j"))
        .otherwise(lit(coreBase) + col("j") % n).as("pb"))
    val up2 = slots.select(
      (col("i") * n + col("j")).as("pa"),
      when(col("i") < layers, (col("i") + 1) * n + (col("j") + half) % n)
        .otherwise(lit(coreBase) + (col("j") + half) % n).as("pb"))
    val coreSlots = spark.range(n).select(col("id").as("c"))
    val core = (1 to 3).map(d => coreSlots.select(
      (lit(coreBase) + col("c")).as("pa"),
      (lit(coreBase) + (col("c") + d) % n).as("pb")))
      .reduce(_ unionByName _)
    // comet bulk: node bulkBase+b sends two edges to distinct core slots
    // (b and b+half mod n) — degree 2 < k, peels in round 1; the core's
    // transient extra degree decrements away the same round and its
    // internal circulant degree 6 keeps it in the k=3 core regardless
    val bulkBase = (layers + 2).toLong * n
    val onion = up.unionByName(up2).unionByName(core)
    val all =
      if (bulkNodes == 0L) onion
      else {
        val bulk = spark.range(bulkNodes)
        val b1 = bulk.select(
          (lit(bulkBase) + col("id")).as("pa"),
          (lit(coreBase) + col("id") % n).as("pb"))
        val b2 = bulk.select(
          (lit(bulkBase) + col("id")).as("pa"),
          (lit(coreBase) + (col("id") + half) % n).as("pb"))
        onion.unionByName(b1).unionByName(b2)
      }
    all
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(out)
    val written = spark.read.parquet(out).count()
    println(s"""{"metric":"onion_gen","edges":$written,"layers":$layers,""" +
      s""""per_layer":$perLayer,"bulk_nodes":$bulkNodes,""" +
      s""""expected_rounds":$layers,"core_nodes":$n}""")
    spark.stop()
  }
}
