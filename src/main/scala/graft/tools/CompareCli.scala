package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession
import graft.config.ConfigReader
import graft.jobs.ComparisonJob

/** Command-line entry point: run a comparison job from a JSON config file.
  *
  * {{{
  *   sbt "runMain graft.tools.CompareCli /path/to/job.json"
  * }}}
  *
  * The JSON shape is the reference's config dict (`README.md` of
  * jafeerr/spark-data-test; dataclasses at
  * `spark_data_test/entities/config.py:4-41`) — snake_case keys, same
  * defaults. Prints the overall test report and the report output paths.
  */
object CompareCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: CompareCli <config.json>")
    val json = Files.readString(Paths.get(args(0)))
    val config = ConfigReader.parseComparisonJobConfigJson(json)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = ComparisonJob.runComparisonJob(spark, config)
      result.overallTestReport.orderBy(graft.Constants.DatasetNameCol).show(truncate = false)
      println(s"reports written under: ${config.outputConfig.outputDir}/${config.jobName}")
      result.unpersist()
    } finally spark.stop()
  }
}
