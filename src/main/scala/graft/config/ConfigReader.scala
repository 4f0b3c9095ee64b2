package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Map/JSON → config-tree hydration, the equivalent of the reference's
  * `dacite.from_dict` layer (`spark_data_test/utils/config_reader.py:4-12`).
  *
  * Accepts the reference's snake_case keys (e.g. `dataset_name`,
  * `primary_keys`, `difference_tolerance`) so existing reference config dicts
  * decode unchanged; missing optional keys fall back to the case-class
  * defaults, and a missing required key raises `IllegalArgumentException`.
  */
object ConfigReader {

  def parseComparisonJobConfig(config: Map[String, Any]): ComparisonJobConfig = {
    if (config == null || config.isEmpty)
      throw new IllegalArgumentException("Configuration dictionary cannot be empty")
    decodeJobConfig(config)
  }

  def parseComparisonJobConfigJson(json: String): ComparisonJobConfig =
    parseComparisonJobConfig(parseJsonObject(json))

  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  def parseJsonObject(json: String): Map[String, Any] =
    mapper.readValue(json, classOf[Map[String, Any]])

  // ---- field decoding helpers -------------------------------------------

  private def req(m: Map[String, Any], key: String): Any =
    m.getOrElse(key, throw new IllegalArgumentException(s"missing required config key: $key"))

  private def str(v: Any): String = v.toString

  private def strSeq(v: Any): Seq[String] = v match {
    case s: Seq[_] => s.map(_.toString)
    case i: java.lang.Iterable[_] =>
      import scala.jdk.CollectionConverters._
      i.asScala.map(_.toString).toSeq
    case other => throw new IllegalArgumentException(s"expected a list, got: $other")
  }

  private def strMap(v: Any): Map[String, String] = v match {
    case m: Map[_, _] => m.map { case (k, x) => k.toString -> x.toString }
    case other => throw new IllegalArgumentException(s"expected a map, got: $other")
  }

  private def double(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(s"expected a number, got: $other")
  }

  private def int(v: Any): Int = v match {
    case n: Number => n.intValue()
    case s: String => s.toInt
    case other => throw new IllegalArgumentException(s"expected an int, got: $other")
  }

  private def bool(v: Any): Boolean = v match {
    case b: java.lang.Boolean => b.booleanValue()
    case s: String => s.toBoolean
    case other => throw new IllegalArgumentException(s"expected a boolean, got: $other")
  }

  private def sub(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.map { case (k, x) => k.toString -> (x: Any) }
    case other => throw new IllegalArgumentException(s"expected a nested object, got: $other")
  }

  // ---- decoders (one per config.py dataclass) ---------------------------

  def decodeTestParams(m: Map[String, Any]): TestParams =
    TestParams(
      differenceTolerance = m.get("difference_tolerance").map(double).getOrElse(0.0),
      legacyDecimalComparison =
        m.get("legacy_decimal_comparison").map(bool).getOrElse(false),
      canonicalizeNestedTypes =
        m.get("canonicalize_nested_types").map(bool).getOrElse(false))

  def decodeDatasetParams(m: Map[String, Any]): DatasetParams =
    DatasetParams(
      datasetName = str(req(m, "dataset_name")),
      primaryKeys = strSeq(req(m, "primary_keys")),
      testParams = m.get("test_params").map(v => decodeTestParams(sub(v))).getOrElse(TestParams()),
      selectCols = m.get("select_cols").map(strSeq).getOrElse(Seq("*")),
      dropCols = m.get("drop_cols").map(strSeq).getOrElse(Seq.empty))

  def decodeOutputConfig(m: Map[String, Any]): OutputConfig =
    OutputConfig(
      outputDir = str(req(m, "output_dir")),
      outputFileFormat = m.get("output_file_format").map(str).getOrElse(graft.Constants.ParquetFmt),
      sparkOptions = m.get("spark_options").map(strMap).getOrElse(Map.empty),
      noOfPartitions = m.get("no_of_partitions").map(int).getOrElse(-1))

  def decodeDataframeConfig(m: Map[String, Any]): DataframeConfig =
    DataframeConfig(
      path = str(req(m, "path")),
      fileFormat = m.get("file_format").map(str).getOrElse(graft.Constants.ParquetFmt),
      sparkOptions = m.get("spark_options").map(strMap).getOrElse(Map.empty))

  def decodeDatasetConfig(m: Map[String, Any]): DatasetConfig =
    DatasetConfig(
      params = decodeDatasetParams(sub(req(m, "params"))),
      sourceConfig = decodeDataframeConfig(sub(req(m, "source_config"))),
      targetConfig = decodeDataframeConfig(sub(req(m, "target_config"))))

  def decodeJobConfig(m: Map[String, Any]): ComparisonJobConfig =
    ComparisonJobConfig(
      jobName = str(req(m, "job_name")),
      datasetConfigs = (req(m, "dataset_configs") match {
        case s: Seq[_] => s
        case other => throw new IllegalArgumentException(s"expected a list of dataset configs, got: $other")
      }).map(v => decodeDatasetConfig(sub(v))),
      outputConfig = decodeOutputConfig(sub(req(m, "output_config"))),
      normalizeRowKeys = m.get("normalize_row_keys").map(bool).getOrElse(false),
      continueOnError = m.get("continue_on_error").map(bool).getOrElse(false))
}
