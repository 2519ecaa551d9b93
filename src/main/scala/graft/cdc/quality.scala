package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cdc.model._

/** Data-quality gate: per-column expectations compiled to Catalyst predicates,
  * evaluated in ONE aggregate pass over the batch (no per-rule scans).
  *
  * Re-expresses the reference's DQX-based evaluator
  * (/root/reference/src/models/data_quality_evaluator.py:28-111,
  * /root/reference/src/models/data_quality_table.py:16-108): warn-level
  * failures are recorded and the write proceeds; error-level failures abort
  * the epoch before commit (the atomic snapshot commit means an aborted epoch
  * leaves zero partial state).
  */
object quality {

  final case class CheckFailure(
      check_name: String,
      column: String,
      criticality: String,
      failed_rows: Long)

  final class QualityGateError(val failures: Seq[CheckFailure])
    extends RuntimeException(
      s"quality gate: error-level failures: ${failures.map(f => s"${f.check_name}(${f.column})=${f.failed_rows}").mkString(", ")}")

  /** One named check = a violation predicate over a column. */
  final case class Check(name: String, column: String, criticality: Criticality, violation: Column)

  object Check {
    /** Derive checks from column metadata, like the reference auto-derives
      * DQX rules from DeltaColumn definitions. */
    def fromColumns(columns: Seq[ColumnDef]): Seq[Check] = columns.flatMap { c =>
      val notNull = if (!c.nullable || c.isPrimaryKey)
        Seq(Check("is_not_null", c.name, Criticality.Error, col(c.name).isNull)) else Nil
      val fromRule = c.qualityRule.toSeq.flatMap { r =>
        val crit = r.criticality
        r.allowedValues.map(vs =>
          Check("is_in_list", c.name, crit, col(c.name).isNotNull && !col(c.name).isin(vs: _*))).toSeq ++
        r.minValue.map(m =>
          Check("min_value", c.name, crit, col(c.name) < lit(m))).toSeq ++
        r.maxValue.map(m =>
          Check("max_value", c.name, crit, col(c.name) > lit(m))).toSeq
      }
      notNull ++ fromRule
    }
  }

  final class QualityGate(checks: Seq[Check]) {
    /** Evaluate all checks in one job; returns all failures (warn + error),
      * throws [[QualityGateError]] if any error-level check fired. */
    def check(df: DataFrame): Seq[CheckFailure] = {
      if (checks.isEmpty) return Nil
      val aggs = checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"c$i")
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val failures = checks.zipWithIndex.flatMap { case (c, i) =>
        val n = if (row.isNullAt(i)) 0L else row.getLong(i)
        if (n > 0) Some(CheckFailure(c.name, c.column,
          c.criticality match { case Criticality.Error => "error"; case Criticality.Warn => "warn" }, n))
        else None
      }
      val errors = failures.filter(_.criticality == "error")
      if (errors.nonEmpty) throw new QualityGateError(errors)
      failures
    }

    /** Duplicate-PK detector (reference DQX `is_unique`,
      * /root/reference/src/models/data_quality_table.py:51-58). */
    def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
  }
}
