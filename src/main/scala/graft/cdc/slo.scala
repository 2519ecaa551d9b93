package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.lake._

/** SLO metric jobs persisted to lake tables (reference:
  * /root/reference/src/metadata/slo/timeliness.py:24-108, quality.py:18-70,
  * SLO definitions /root/reference/docs/slo.md).
  *
  * Deviations from the reference, deliberate:
  *  - metrics are grouped by day/job instead of hardcoding "today" + a
  *    driver-side `collect()` job-id lookup — one declarative aggregate, no
  *    driver loop, scales to any history length;
  *  - counts use sum-of-indicators, not the reference's `F.count(indicator)`
  *    (which counts non-nulls, i.e. ALL rows — a known behavior bug there);
  *  - rows land via the engine's own keyed MERGE (upsert), so re-running a
  *    job for the same day is idempotent, not an append-duplicate.
  */
object slo {

  /** timeliness: was the job's data ready before the cutoff hour?
    * PK (date, job_name); reference table at timeliness.py:24-47. */
  object TimelinessSlo {
    val schema: StructType = StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("job_name", StringType, nullable = false),
      StructField("ready_by_09", BooleanType, nullable = false)))
    val keyColumns: Seq[String] = Seq("date", "job_name")

    /** Derive per-(day, job) readiness from a runs table with columns
      * (period_end_time timestamp, job_name string, result_state string):
      * ready iff ANY successful run finished before the cutoff hour
      * (reference derive_timeliness_metrics, timeliness.py:81-89). */
    def derive(runs: DataFrame, cutoffHour: Int = 9): DataFrame =
      runs.filter(col("result_state") === "SUCCEEDED")
        .groupBy(col("period_end_time").cast(DateType).as("date"), col("job_name"))
        .agg((max(when(hour(col("period_end_time")) < cutoffHour, 1).otherwise(0)) === 1)
          .as("ready_by_09"))

    /** Upsert derived rows (MERGE keyed on (date, job_name)). lsn packs
      * (day ordinal << 32) | epochId — the 32-bit epoch field cannot collide
      * across days, so a re-derived day deterministically wins over any
      * earlier derivation of the same day regardless of run cadence. */
    def upsert(table: LakeTable, derived: DataFrame, epochId: Long): CommitResult =
      table.merge(derived.select(
        (datediff(col("date"), lit("1970-01-01")).cast(LongType) * (1L << 32) + epochId).as("lsn"),
        lit("U").as("op"),
        col("date"), col("job_name"), col("ready_by_09")), epochId)
  }

  /** quality: per-run counts of DQ failures from the data_quality_checks
    * audit log (reference quality.py:18-59), keyed by run_id. */
  object QualitySlo {
    val schema: StructType = StructType(Seq(
      StructField("run_id", LongType, nullable = false),
      StructField("error_count", LongType, nullable = false),
      StructField("warning_count", LongType, nullable = false),
      StructField("error_rows", LongType, nullable = false),
      StructField("warn_rows", LongType, nullable = false)))
    val keyColumns: Seq[String] = Seq("run_id")

    /** Aggregate the audit table: #checks fired and #rows failed, split by
      * criticality, per run.
      *
      * Error-aborted epochs append audit rows UNFENCED (at-least-once, see
      * ReplayEngine), so a crash-retry loop on the same failing epoch can
      * leave duplicate audit rows for one (run_id, check). The inner
      * max(failed_rows) per (run_id, table_name, criticality, function)
      * collapses those retries before counting — the SLO metric reflects the
      * run's failures, not its retry count. (function = check_name(column);
      * table_name keeps same-named checks from DIFFERENT tables sharing one
      * audit table distinct.) */
    def derive(audit: DataFrame): DataFrame = {
      val isErr = col("criticality") === "error"
      audit
        .groupBy(col("run_id"), col("table_name"), col("criticality"), col("function"))
        .agg(max("failed_rows").as("failed_rows"))
        .groupBy(col("run_id"))
        .agg(
          sum(when(isErr, 1L).otherwise(0L)).as("error_count"),
          sum(when(!isErr, 1L).otherwise(0L)).as("warning_count"),
          sum(when(isErr, col("failed_rows")).otherwise(0L)).as("error_rows"),
          sum(when(!isErr, col("failed_rows")).otherwise(0L)).as("warn_rows"))
    }

    /** MERGE keyed on run_id; lsn packs (run_id << 32) | epochId so a newer
      * re-derivation of the same run deterministically wins (see
      * TimelinessSlo.upsert for the collision rationale). */
    def upsert(table: LakeTable, derived: DataFrame, epochId: Long): CommitResult =
      table.merge(derived.select(
        (col("run_id") * (1L << 32) + epochId).as("lsn"),
        lit("U").as("op"),
        col("run_id"), col("error_count"), col("warning_count"),
        col("error_rows"), col("warn_rows")), epochId)
  }
}
