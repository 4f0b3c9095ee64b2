package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** Config hydration tests mirroring the reference's
  * `tests/test_config_reader.py:3-34`.
  */
class ConfigReaderSpec extends AnyFunSuite {

  test("empty config raises") {
    intercept[IllegalArgumentException] {
      ConfigReader.parseComparisonJobConfig(Map.empty)
    }
  }

  test("happy-path dict hydration with defaults") {
    val cfg = ConfigReader.parseComparisonJobConfig(Map(
      "job_name" -> "my_job",
      "dataset_configs" -> Seq(Map(
        "params" -> Map(
          "dataset_name" -> "ds1",
          "primary_keys" -> Seq("id"),
          "test_params" -> Map("difference_tolerance" -> 0.5)),
        "source_config" -> Map("path" -> "/tmp/src", "file_format" -> "csv",
          "spark_options" -> Map("header" -> "true")),
        "target_config" -> Map("path" -> "/tmp/tgt"))),
      "output_config" -> Map("output_dir" -> "/tmp/out", "no_of_partitions" -> 2)))
    assert(cfg.jobName == "my_job")
    val dc = cfg.datasetConfigs.head
    assert(dc.params == DatasetParams("ds1", Seq("id"), TestParams(0.5)))
    assert(dc.params.selectCols == Seq("*") && dc.params.dropCols.isEmpty)
    assert(dc.sourceConfig == DataframeConfig("/tmp/src", "csv", Map("header" -> "true")))
    assert(dc.targetConfig == DataframeConfig("/tmp/tgt", "parquet", Map.empty))
    assert(cfg.outputConfig == OutputConfig("/tmp/out", "parquet", Map.empty, 2))
  }

  test("JSON hydration") {
    val cfg = ConfigReader.parseComparisonJobConfigJson(
      """{"job_name": "j", "dataset_configs": [{"params": {"dataset_name":
        |"d", "primary_keys": ["a", "b"]}, "source_config": {"path": "s"},
        |"target_config": {"path": "t"}}], "output_config":
        |{"output_dir": "o"}}""".stripMargin)
    assert(cfg.jobName == "j")
    assert(cfg.datasetConfigs.head.params.primaryKeys == Seq("a", "b"))
  }

  test("missing required key raises") {
    intercept[IllegalArgumentException] {
      ConfigReader.parseComparisonJobConfig(Map("job_name" -> "x"))
    }
  }

  test("extension flags decode from snake_case keys (map and JSON)") {
    val tp = ConfigReader.decodeTestParams(Map(
      "difference_tolerance" -> 0.25,
      "legacy_decimal_comparison" -> true,
      "canonicalize_nested_types" -> "true"))
    assert(tp == TestParams(0.25, legacyDecimalComparison = true, canonicalizeNestedTypes = true))

    val cfg = ConfigReader.parseComparisonJobConfigJson(
      """{"job_name": "j", "dataset_configs": [{"params": {"dataset_name":
        |"d", "primary_keys": ["a"], "test_params":
        |{"canonicalize_nested_types": true}}, "source_config": {"path": "s"},
        |"target_config": {"path": "t"}}], "output_config":
        |{"output_dir": "o"}}""".stripMargin)
    val decoded = cfg.datasetConfigs.head.params.testParams
    assert(decoded.canonicalizeNestedTypes && !decoded.legacyDecimalComparison)
    assert(decoded.differenceTolerance == 0.0)
  }
}
