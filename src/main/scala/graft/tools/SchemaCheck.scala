package graft.tools

import org.apache.spark.sql.SparkSession

/** Print schema + a few rows of a parquet path (dev utility). */
object SchemaCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(args(0))
    df.printSchema()
    df.show(3, truncate = false)
    spark.stop()
  }
}
