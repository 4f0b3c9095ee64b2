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
  * Usage: `OnionGen <outPath> <layers> <perLayer>` — writes an edge list
  * (pa, pb) parquet that `KcoreAB <outPath> <on|off> 3 <layers+10>`
  * consumes.
  */
object OnionGen {
  def main(args: Array[String]): Unit = {
    val (out, layers, perLayer) = args match {
      case Array(o, l, p) => (o, l.toInt, p.toInt)
      case _ =>
        System.err.println("usage: OnionGen <outPath> <layers> <perLayer>")
        sys.exit(2)
        throw new IllegalStateException
    }
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
    up.unionByName(up2).unionByName(core)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(out)
    val written = spark.read.parquet(out).count()
    println(s"""{"metric":"onion_gen","edges":$written,"layers":$layers,""" +
      s""""per_layer":$perLayer,"expected_rounds":$layers,"core_nodes":$n}""")
    spark.stop()
  }
}
