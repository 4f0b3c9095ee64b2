package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the expectation-suite complement
  * of the comparison engine (compare validates one dataset AGAINST another;
  * checks validate one dataset against a CONTRACT). The check vocabulary is
  * the standard published set (completeness, uniqueness, range, domain,
  * volume — the Deequ/Great-Expectations shape, re-expressed Spark-first).
  *
  * Scale design: ALL metrics come out of ONE aggregation job over one scan
  * — per-check violation counts are conditional sums (map-side combined),
  * uniqueness is an exact `count distinct` over the key struct (Spark's
  * Expand: one pass, partial aggregation before the shuffle), and the
  * per-check report is assembled driver-side from that single row, exactly
  * like [[Profiling]]. Thresholds evaluate on integer ppm
  * (`violations · 10⁶ div rows`) so pass/fail is bit-reproducible in any
  * engine — no float fraction ever compares against a threshold.
  */
object Checks {

  /** A single declarative constraint; `maxViolationPpm` tolerates up to
    * that fraction (parts-per-million) of violating rows — 0 = strict.
    */
  sealed trait Check {
    def target: String
    def maxViolationPpm: Long
  }
  /** Column must be non-NULL. */
  final case class NotNull(column: String, maxViolationPpm: Long = 0L) extends Check {
    def target: String = column
  }
  /** The column tuple must be unique across rows (NULLs participate as
    * values, matching SQL `GROUP BY` semantics — duplicated NULL keys ARE
    * duplicates, the defect a primary-key check exists to catch).
    */
  final case class Unique(columns: Seq[String], maxViolationPpm: Long = 0L) extends Check {
    def target: String = columns.mkString(",")
  }
  /** Non-NULL numeric values must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double,
      maxViolationPpm: Long = 0L) extends Check {
    def target: String = column
  }
  /** Non-NULL values must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String],
      maxViolationPpm: Long = 0L) extends Check {
    def target: String = column
  }
  /** The dataset must have at least `n` rows. */
  final case class MinRows(n: Long) extends Check {
    def target: String = "*"
    def maxViolationPpm: Long = 0L
  }

  /** Run every check in ONE aggregation pass; returns the report frame
    * (check, target, n_rows, n_violations, violation_ppm, passed) in the
    * declaration order of `checks`.
    */
  def validate(spark: SparkSession, df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map { case (c, i) =>
      val viol = c match {
        case NotNull(col0, _) =>
          sum(when(col(col0).isNull, 1L).otherwise(0L))
        case Unique(cols, _) =>
          count(lit(1)) - countDistinct(struct(cols.map(col): _*))
        case InRange(col0, lo, hi, _) =>
          sum(when(col(col0).isNotNull &&
            (col(col0) < lit(lo) || col(col0) > lit(hi)), 1L).otherwise(0L))
        case AcceptedValues(col0, values, _) =>
          sum(when(col(col0).isNotNull && !col(col0).isin(values: _*), 1L).otherwise(0L))
        case MinRows(_) => lit(0L) // evaluated against __n driver-side
      }
      coalesce(viol, lit(0L)).cast("long").as(s"__c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    val report = checks.zipWithIndex.map { case (c, i) =>
      val (name, violations) = c match {
        case _: NotNull => ("not_null", row.getAs[Long](s"__c$i"))
        case _: Unique => ("unique", row.getAs[Long](s"__c$i"))
        case _: InRange => ("in_range", row.getAs[Long](s"__c$i"))
        case _: AcceptedValues => ("accepted_values", row.getAs[Long](s"__c$i"))
        case MinRows(min) => ("min_rows", math.max(0L, min - n))
      }
      // reported ppm floors for readability, but the VERDICT cross-multiplies
      // (violations·10⁶ ≤ threshold·n) — a floored ppm of 0 would let a
      // strict (threshold 0) check pass with up to n/10⁶ real violations
      // on billion-row frames, exactly the scale this library targets.
      // MinRows divides by the REQUIRED minimum, not the actual row count:
      // missing·10⁶/actual can exceed 10⁶ (MinRows(1000) on 1 row would
      // report 999 000 000 "ppm"), while missing·10⁶/min is a true
      // fraction-of-requirement in [0, 10⁶]
      val ppm = c match {
        case MinRows(min) => if (min == 0) 0L else violations * 1000000L / min
        case _ => if (n == 0) 0L else violations * 1000000L / n
      }
      val passed = c match {
        case MinRows(min) => n >= min
        case _ => violations * 1000000L <= c.maxViolationPpm * n
      }
      (name, c.target, n, violations, ppm, passed)
    }
    import spark.implicits._
    report.toDF("check", "target", "n_rows", "n_violations", "violation_ppm", "passed")
  }
}
