package graft.cdc

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.Serialization

import graft.cdc.lake._

/** The replay side of the engine: per-key max-LSN dedup, skew handling, the
  * epoch loop, checkpoint ledger, and lineage/metrics emission.
  */
object ingest {

  object Dedup {
    /** Per-key max-LSN dedup window (north rule; SURVEY.md §2.4 A5).
      *
      * Implemented as `groupBy(keys).agg(max_by(struct(*), lsn))` rather than a
      * row_number window: a declarative aggregate gets map-side partial
      * aggregation, so duplicate storms on a hot key are collapsed BEFORE the
      * shuffle — this is the primary skew defense for the dedup stage and it
      * scales with mappers, not with the hottest key's row count.
      */
    def latestPerKey(batch: DataFrame, keys: Seq[String], lsnCol: String = "lsn"): DataFrame = {
      batch
        .groupBy(keys.map(col): _*)
        .agg(max_by(struct(batch.columns.map(col).toIndexedSeq: _*), col(lsnCol)).as("_e"))
        .select("_e.*")
    }
  }

  object Salting {
    /** Explicit salted repartition for hot-key skew (north rule): spreads each
      * `keys`-group across `salt` sub-partitions. Use before per-key heavy ops
      * that can't use partial aggregation. */
    def saltedRepartition(df: DataFrame, numPartitions: Int, keys: Seq[String], salt: Int): DataFrame = {
      val saltCol: Column = pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salt))
      df.repartition(numPartitions, (keys.map(col) :+ saltCol): _*)
    }
  }

  /** Checkpointed offset/watermark ledger (north rule): tiny JSON state file
    * advanced by atomic rename after each committed epoch; replay resumes from
    * `lastEpoch + 1`. The lake table's own epoch fence makes a stale or lost
    * ledger safe — re-applying a committed epoch is a no-op. */
  final case class LedgerState(lastEpoch: Long, lsnHigh: Long)

  final class CheckpointLedger(dir: String) {
    private implicit val fmts: Formats = Serialization.formats(NoTypeHints)
    private val path = Paths.get(dir, "ledger.json")
    Files.createDirectories(Paths.get(dir))

    def read(): LedgerState =
      if (Files.exists(path)) Serialization.read[LedgerState](Files.readString(path))
      else LedgerState(-1L, -1L)

    def advance(s: LedgerState): Unit = {
      val tmp = Paths.get(dir, s".ledger-${UUID.randomUUID()}.json")
      Files.writeString(tmp, Serialization.write(s))
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  final case class EpochMetrics(
      epoch: Long,
      events_in: Long,
      events_deduped: Long,
      events_applied: Long,
      wall_ms: Long,
      events_per_sec: Double,
      content_checksum: Long = 0L) // xor-sum of sha256(content) over the batch (verify mode)

  final case class EpochResult(
      committed: Boolean,
      snapshotVersion: Long,
      metrics: EpochMetrics,
      lineage: Seq[LineageEntry])

  /** How epochs are applied to the lake table. */
  sealed trait MergeMode
  object MergeMode {
    /** Copy-on-write: every epoch rewrites the touched buckets (read-optimal). */
    case object CoW extends MergeMode
    /** Merge-on-read: epochs append per-key-winner delta files; reads apply
      * them with the fused max-LSN aggregation (write-optimal; compact with
      * `table.compactDeltas()` or any CoW merge touching the bucket). */
    case object MoR extends MergeMode
  }

  /** Epoch-driven CDC apply loop over a [[lake.LakeTable]].
    *
    * One `applyEpoch` = the reference's per-batch merge lifecycle
    * (/root/reference/src/models/writer.py:42-67) made explicit:
    * conform (schema registry) -> quality gate -> per-key max-LSN dedup ->
    * copy-on-write merge -> epoch-fenced atomic commit -> lineage + metrics.
    *
    * Exactly-once: commit embeds epochId; replaying any prefix of epochs after
    * a crash/restart is a sequence of fenced no-ops until the first
    * not-yet-committed epoch.
    */
  final class ReplayEngine(
      val table: LakeTable,
      val registry: SchemaRegistry,
      val gate: Option[quality.QualityGate] = None,
      val lineageTable: Option[LakeTable] = None,
      val metricsTable: Option[LakeTable] = None,
      val ledger: Option[CheckpointLedger] = None,
      /** Persistent `data_quality_checks` audit lake table: every epoch's
        * warn AND error failures are appended (errors BEFORE the abort, like
        * the reference's _handle_errors, data_quality_evaluator.py:88-93). */
      val auditTable: Option[LakeTable] = None,
      /** Row-level quarantine lake table: rows failing any check are appended
        * with their failure annotations serialized as JSON. */
      val quarantineTable: Option[LakeTable] = None,
      val mode: MergeMode = MergeMode.CoW,
      /** Verified replay: additionally compute sha256(content) for every event
        * in the epoch and record an order-insensitive checksum in the metrics
        * — the north rule's row-integrity primitive maintained continuously,
        * so any corruption between source and lake is caught at the epoch it
        * happens (compare against the same checksum computed source-side). */
      val verifyChecksums: Boolean = false) {

    // The merge aggregation uses a TypedImperativeAggregate (MaxByRow) that
    // runs in ObjectHashAggregateExec; Spark's default sort-fallback threshold
    // (128 groups!) would demote it to sort-based immediately. Partitions are
    // sized so their key count fits memory (same invariant as any hash join
    // build side), so raise the threshold. Tunable by setting it BEFORE
    // constructing the engine.
    if (table.spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == "128") {
      table.spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
    }

    /** Persist gate failures (audit summaries + quarantined rows), then abort
      * on error-level failures. With an audit table attached, warn+error
      * summaries are appended FIRST — errors are persisted before the abort,
      * reference-style (_handle_errors, data_quality_evaluator.py:88-93).
      *
      * Idempotence policy: audit/quarantine appends for epochs that will
      * COMMIT are fenced at this epochId, so a crash-replay of an
      * already-committed epoch cannot double-count failures in the SLO.
      * Error-aborted attempts append UNFENCED (at-least-once) so a corrected
      * resubmission of the same epoch id still gets its failures audited
      * (QualitySlo.derive dedupes the retries). */
    private def persistFailuresAndMaybeAbort(g: quality.QualityGate,
        failures: Seq[quality.CheckFailure], withMeta: DataFrame, epochId: Long): Unit = {
      val hasErrors = failures.exists(_.criticality == "error")
      val fenceId = if (hasErrors) -1L else epochId
      // the fence on the SIDE tables is scoped per source table: several
      // engines may share one audit/quarantine table, and a global fence
      // would let engine A's epoch-N append silently drop engine B's later
      // append for any epoch <= N (see LakeTable.append fenceScope)
      val scope = Some(table.name)
      auditTable.foreach { at =>
        at.append(quality.DataQualityChecks.auditRows(
          table.spark, failures, table.name, jobId = epochId, runId = epochId),
          epochId = fenceId, fenceScope = scope)
      }
      quarantineTable.foreach { qt =>
        val quarantine = g.split(withMeta.where(col("op") =!= "D")).quarantine
          .withColumn("epoch", lit(epochId))
          .withColumn("_warnings", to_json(col("_warnings")))
          .withColumn("_errors", to_json(col("_errors")))
        qt.append(quarantine.select(qt.snapshot.schema.fieldNames.map(col).toSeq: _*),
          epochId = fenceId, fenceScope = scope)
      }
      if (hasErrors) throw new quality.QualityGateError(failures.filter(_.criticality == "error"))
    }

    /** Apply one epoch of change events. `events` must carry `lsn`, `op`, and
      * payload columns for some registry version (extra columns are dropped by
      * conform; missing newer columns are null-filled).
      * `knownInputCount` skips the metrics count() scan when the caller already
      * knows the batch size (benchmark path). */
    def applyEpoch(events: DataFrame, epochId: Long,
        knownInputCount: Option[Long] = None): EpochResult = {
      val t0 = System.nanoTime()
      val snap = table.snapshot
      if (epochId >= 0 && epochId <= snap.epochId) {
        // replayed epoch: exactly-once fence, nothing runs
        return EpochResult(committed = false, snap.version,
          EpochMetrics(epochId, 0, 0, 0, 0, 0.0), Nil)
      }
      if (knownInputCount.contains(0L)) {
        // known-empty batch: skip before any write — the dense paths would
        // otherwise run their (fused-stats) write first and only then skip
        // the commit, leaving the written files as vacuum-able orphans
        return EpochResult(committed = false, snap.version,
          EpochMetrics(epochId, 0, 0, 0, 0, 0.0), Nil)
      }

      // 1. conform payload to the table's current schema version (additive
      //    evolution: old-version events null-fill / widen into the new shape),
      //    keeping the lsn/op event metadata alongside the payload
      val withMeta = {
        val have = events.columns.toSet
        val cols = Seq(col("lsn"), col("op")) ++ snap.schema.fields.map { f =>
          if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }
        events.select(cols: _*)
      }
      // quarantine-attached gated epochs persist the conformed batch: the
      // merge write is the scan that POPULATES the cache, so a
      // failure-bearing epoch's quarantine-row derivation reads the cached
      // batch instead of re-scanning the source — a dirty epoch costs
      // merge + (cached annotated pass + two small appends), never two full
      // source scans. The cache is epoch-batch-sized (bounded by the tail's
      // trigger size at 100 TB: maxFilesPerTrigger); MEMORY_AND_DISK spills
      // rather than evicting, and clean epochs pay only the in-memory copy.
      val cacheBatch = gate.exists(_.checks.nonEmpty) && quarantineTable.isDefined
      if (cacheBatch) { withMeta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK); () }
      try {

      // 2. quality gate (errors abort the epoch pre-commit; the atomic commit
      //    means an aborted epoch leaves no partial state). Two shapes:
      //    - FUSED (dense path): the gate's violation-count aggregates ride
      //      the merge job itself as an Observation, resolved after the write
      //      but BEFORE the commit (LakeTable's preCommit hook) — a clean
      //      gated dense epoch is ONE Spark job, no separate gate scan; an
      //      error-level failure aborts pre-commit and the written files are
      //      unreferenced, vacuum-able orphans.
      //    - SEPARATE (sparse / >64-bucket / kill-switched, same predicate
      //      as stats fusion via willFuseStats): one aggregate job before the
      //      write — an upstream Observation would drag every gated column
      //      into the sparse path's narrow stats pre-pass scan, and aborting
      //      before the write is strictly cheaper there anyway.
      val dense = knownInputCount.exists(_ >= snap.numBuckets.toLong * 32)
      val fuse = table.willFuseStats(snap, dense)
      var gateObs: Option[org.apache.spark.sql.Observation] = None
      gate.foreach { g =>
        if (g.checks.nonEmpty && fuse) {
          gateObs = Some(org.apache.spark.sql.Observation(
            s"gate-$epochId-${java.util.UUID.randomUUID()}"))
        } else {
          val failures = g.evaluate(withMeta.where(col("op") =!= "D"))
          if (failures.nonEmpty) persistFailuresAndMaybeAbort(g, failures, withMeta, epochId)
        }
      }

      // 3.+4. copy-on-write merge with the per-key max-LSN dedup FUSED into
      //    the merge aggregation (one wide shuffle; see LakeTable.merge),
      //    then the fenced commit. Epochs known to be dense (>= 32 events per
      //    bucket on average) skip the touched-bucket pre-pass entirely
      //    (per-bucket stats ride the merge job as observed metrics).
      //    Verified replay fuses its sha256 checksum into the SAME job the
      //    same way — verify mode costs sha CPU, not an extra batch scan.
      val csObs =
        if (verifyChecksums && fuse)
          Some(org.apache.spark.sql.Observation(s"cs-$epochId-${java.util.UUID.randomUUID()}"))
        else None
      val withGateObs = gateObs match {
        case Some(o) =>
          val aggs = gate.get.observedAggs(col("op") =!= "D")
          withMeta.observe(o, aggs.head, aggs.tail: _*)
        case None => withMeta
      }
      val gated = csObs match {
        case Some(o) => withGateObs.observe(o, sum(crc32(sha2(col("content"), 256))).as("cs"))
        case None => withGateObs
      }
      // fused-gate resolution: runs inside merge/deltaAppend after the write
      // job (Observation resolved) and before the snapshot commit
      val preCommit: () => Unit = () => gateObs.foreach { o =>
        val g = gate.get
        val failures = g.failuresFromObserved(o.get)
        if (failures.nonEmpty) persistFailuresAndMaybeAbort(g, failures, withMeta, epochId)
      }
      val res = mode match {
        case MergeMode.CoW => table.merge(gated, epochId, assumeFullTouch = dense, preCommit)
        case MergeMode.MoR => table.deltaAppend(gated, epochId, assumeFullTouch = dense, preCommit)
      }

      // 5. verified-replay checksum: observed on the merge job itself (dense)
      //    or one dedicated CPU pass over the batch (sparse)
      val checksum: Long =
        if (verifyChecksums && res.committed) csObs match {
          case Some(o) =>
            o.get.get("cs").collect { case n: Number => n.longValue }.getOrElse(0L)
          case None =>
            withMeta.agg(sum(crc32(sha2(col("content"), 256)))).collect()(0) match {
              case r if r.isNullAt(0) => 0L
              case r => r.getLong(0)
            }
        }
        else 0L

      val wallMs = (System.nanoTime() - t0) / 1000000L
      val applied = res.lineage.map(l => l.rows_upserted + l.rows_deleted).sum
      val eventsIn = knownInputCount.getOrElse(if (res.committed) events.count() else 0L)
      val m = EpochMetrics(epochId, eventsIn,
        events_deduped = math.max(0L, eventsIn - applied), events_applied = applied,
        wall_ms = wallMs,
        events_per_sec = if (wallMs > 0) eventsIn * 1000.0 / wallMs else 0.0,
        content_checksum = checksum)

      if (res.committed) {
        val spark = table.spark
        import spark.implicits._
        lineageTable.foreach(lt => lt.append(res.lineage.toDF(), epochId = -1L))
        metricsTable.foreach(mt => mt.append(Seq(m).toDF(), epochId = -1L))
        ledger.foreach(_.advance(LedgerState(epochId, res.snapshot.lsnHigh)))
      }
      EpochResult(res.committed, res.snapshot.version, m, res.lineage)
      } finally if (cacheBatch) { withMeta.unpersist(blocking = false); () }
    }
  }
}
