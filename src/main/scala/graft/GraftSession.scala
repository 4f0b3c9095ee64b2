package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * AQE is the load-bearing setting: runtime partition coalescing keeps the
  * post-join stage count proportional to data size, and skew-join splitting
  * handles hot keys in every splittable join (inner / semi / left- and
  * right-outer — pinned by PlanSpec). Note Spark cannot skew-split a
  * FULL-outer sort-merge join (neither side may be replicated without
  * breaking its semantics); see [[graft.core.Comparison]] for why the
  * engine's alignment join is structurally protected from skew anyway.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(s"local[$cores]", math.max(cores, 8)).getOrCreate()
    // getOrCreate ignores withExtensions when it returns a pre-existing
    // session — retrofit the SQL functions so they are present either way
    GraftExtensions.registerFunctions(spark)
    spark
  }
}
