package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.cdc.lake._
import graft.cdc.slo._

/** SLO metric jobs (reference analog: src/metadata/slo) — derivation
  * semantics plus the idempotent keyed-MERGE persistence contract. */
class SloSpec extends SparkSuite {
  import spark.implicits._

  private def runsDf(rows: (String, String, String)*) =
    rows.map { case (ts, job, state) => (Timestamp.valueOf(ts), job, state) }
      .toDF("period_end_time", "job_name", "result_state")

  test("timeliness: ready iff any SUCCESSFUL run lands before the cutoff") {
    val runs = runsDf(
      ("2026-03-02 07:30:00", "medallion", "SUCCEEDED"), // before cutoff
      ("2026-03-02 10:00:00", "medallion", "SUCCEEDED"),
      ("2026-03-03 08:00:00", "medallion", "FAILED"),    // early but failed
      ("2026-03-03 11:00:00", "medallion", "SUCCEEDED"),
      ("2026-03-03 08:30:00", "nightly", "SUCCEEDED"))
    val got = TimelinessSlo.derive(runs).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getBoolean(2)).toMap
    assert(got == Map(
      ("2026-03-02", "medallion") -> true,
      ("2026-03-03", "medallion") -> false, // only the failed run was early
      ("2026-03-03", "nightly") -> true))
  }

  test("SLO upsert is a keyed MERGE: re-runs replace, same-epoch replays fence") {
    val t = LakeTable.createIfNotExists(spark, tmpDir("slo-t"), "timeliness",
      TimelinessSlo.schema, TimelinessSlo.keyColumns, numBuckets = 2)
    val day1 = runsDf(("2026-03-02 10:00:00", "m", "SUCCEEDED"))
    assert(TimelinessSlo.upsert(t, TimelinessSlo.derive(day1), epochId = 0).committed)
    assert(t.read().collect().map(_.getBoolean(2)).toSeq == Seq(false))
    // replaying the same epoch is a fenced no-op
    assert(!TimelinessSlo.upsert(t, TimelinessSlo.derive(day1), epochId = 0).committed)
    // a later run sees an early success -> the SAME key flips, no duplicate row
    val day1b = runsDf(
      ("2026-03-02 08:00:00", "m", "SUCCEEDED"),
      ("2026-03-02 10:00:00", "m", "SUCCEEDED"))
    assert(TimelinessSlo.upsert(t, TimelinessSlo.derive(day1b), epochId = 1).committed)
    val rows = t.read().collect()
    assert(rows.length == 1 && rows(0).getBoolean(2))
  }

  test("quality: audit rows aggregate to per-run counts split by criticality") {
    val audit = Seq(
      ("warn", 3L, 7L, "is_in_list(lang)", "t1"),
      ("warn", 3L, 2L, "min_value(value)", "t1"),
      ("error", 3L, 1L, "is_not_null(repo)", "t1"),
      ("warn", 4L, 5L, "is_in_list(lang)", "t1"))
      .toDF("criticality", "run_id", "failed_rows", "function", "table_name")
    val got = QualitySlo.derive(audit).orderBy("run_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((3L, 1L, 2L, 1L, 9L), (4L, 0L, 1L, 0L, 5L)))
  }

  test("quality: crash-retry duplicate audit rows do not inflate the SLO") {
    // an error-aborted epoch appends its audit rows unfenced (at-least-once);
    // three retries of the same failing run leave three copies of each row —
    // derive must count the run's failures once, not x retries
    val oneAttempt = Seq(
      ("error", 7L, 4L, "is_not_null(repo)", "t1"),
      ("warn", 7L, 2L, "min_value(value)", "t1"))
    val audit = (oneAttempt ++ oneAttempt ++ oneAttempt)
      .toDF("criticality", "run_id", "failed_rows", "function", "table_name")
    val got = QualitySlo.derive(audit).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((7L, 1L, 1L, 4L, 2L)))
  }

  test("quality: same-named checks from DIFFERENT tables are not collapsed as retries") {
    // two tables share the audit table and both fire is_not_null(repo) in
    // run 5 — that is two distinct failing checks, not a retry of one
    val audit = Seq(
      ("error", 5L, 4L, "is_not_null(repo)", "orders"),
      ("error", 5L, 2L, "is_not_null(repo)", "users"))
      .toDF("criticality", "run_id", "failed_rows", "function", "table_name")
    val got = QualitySlo.derive(audit).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((5L, 2L, 6L)), s"got ${got.toSeq}")
  }
}
