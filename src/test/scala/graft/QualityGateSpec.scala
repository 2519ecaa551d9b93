package graft

import org.apache.spark.sql.types._

import graft.cdc.model._
import graft.cdc.quality._

/** Quality gate (reference analog: tests for data_quality_evaluator/table). */
class QualityGateSpec extends SparkSuite {
  import spark.implicits._

  private val columns = Seq(
    ColumnDef("id", LongType, nullable = false, isPrimaryKey = true),
    ColumnDef("lang", StringType, qualityRule =
      Some(QualityRule(Criticality.Error, allowedValues = Some(Seq("scala", "py", "java"))))),
    ColumnDef("score", DoubleType, qualityRule =
      Some(QualityRule(Criticality.Warn, minValue = Some(0.0), maxValue = Some(1.0)))))

  test("clean batch passes; warn failures are reported but do not abort") {
    val gate = new QualityGate(Check.fromColumns(columns))
    val clean = Seq((1L, "scala", 0.5), (2L, "py", 0.9)).toDF("id", "lang", "score")
    assert(gate.check(clean).isEmpty)
    val warny = Seq((1L, "scala", -0.5), (2L, "py", 1.7)).toDF("id", "lang", "score")
    val failures = gate.check(warny)
    assert(failures.map(f => (f.check_name, f.criticality, f.failed_rows)).toSet ==
      Set(("min_value", "warn", 1L), ("max_value", "warn", 1L)))
  }

  test("error-level failures abort (null PK, disallowed value)") {
    val gate = new QualityGate(Check.fromColumns(columns))
    val bad = Seq((Some(1L), "rust", 0.5), (None, "scala", 0.5))
      .toDF("id", "lang", "score")
    val e = intercept[QualityGateError] { gate.check(bad) }
    assert(e.failures.map(_.check_name).toSet == Set("is_not_null", "is_in_list"))
  }

  test("duplicate-PK detector finds dups") {
    val gate = new QualityGate(Nil)
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val dups = gate.duplicateKeys(df, Seq("id")).collect()
    assert(dups.length == 1 && dups(0).getLong(0) == 1L && dups(0).getLong(1) == 2L)
  }
}
