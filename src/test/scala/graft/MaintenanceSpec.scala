package graft

import org.apache.spark.sql.functions._

import graft.cdc._
import graft.cdc.lake._
import graft.cdc.ingest._
import graft.cdc.model._

/** Lake maintenance: time travel, compaction, vacuum. */
class MaintenanceSpec extends SparkSuite {

  private def build(nEpochs: Int): (LakeTable, gen.GenConfig) = {
    val cfg = gen.GenConfig(n = 4000L * nEpochs, nKeys = 800, numPartitions = 4)
    val table = LakeTable.createIfNotExists(spark, tmpDir("maint"), "t",
      RepoRow.schemaV1, RepoRow.keyColumns, numBuckets = 4)
    val engine = new ReplayEngine(table, SchemaRegistry.single(RepoRow.schemaV1))
    val all = gen.changeEvents(spark, cfg)
    (0 until nEpochs).foreach { e =>
      engine.applyEpoch(all.filter(col("lsn") >= e * 4000 && col("lsn") < (e + 1) * 4000), e)
    }
    (table, cfg)
  }

  test("time travel: every historical snapshot reads exactly; history is ordered") {
    val (table, cfg) = build(3)
    val hist = table.history()
    assert(hist == hist.sorted && hist.size == 4) // v0 (empty) + 3 epochs
    assert(table.readAt(hist.head).count() == 0)
    val counts = hist.map(v => table.readAt(v).count())
    assert(counts == counts.sorted, s"row counts should grow: $counts") // inserts dominate deletes here
    // as-of epoch 1 state equals replaying only epochs 0..1
    val cfg2 = cfg.copy(n = 8000)
    val expected = gen.oracleFinalState(cfg2)
    assert(table.readAt(hist(2)).count() == expected.size)
  }

  test("createView binds a snapshot: MVCC reads are stable across later commits") {
    val (table, _) = build(2)
    table.createView("mvcc_v")
    val before = spark.sql("SELECT count(*) FROM mvcc_v").collect()(0).getLong(0)
    // a later epoch commits more data; the bound view must NOT shift
    val engine = new ReplayEngine(table, SchemaRegistry.single(RepoRow.schemaV1))
    val more = gen.changeEvents(spark, gen.GenConfig(n = 12000, nKeys = 800, numPartitions = 4))
    assert(engine.applyEpoch(more.filter(col("lsn") >= 8000), 2).committed)
    assert(spark.sql("SELECT count(*) FROM mvcc_v").collect()(0).getLong(0) == before,
      "a view bound before the commit must keep reading its snapshot")
    // re-binding picks up the new state
    table.createView("mvcc_v")
    assert(spark.sql("SELECT count(*) FROM mvcc_v").collect()(0).getLong(0) > before)
  }

  test("compaction merges small files and preserves content exactly") {
    // small files accumulate on APPEND-shaped tables (audit/lineage/metrics);
    // merge tables rewrite whole buckets so they stay one file per bucket
    val table = LakeTable.createIfNotExists(spark, tmpDir("maint-app"), "t",
      RepoRow.schemaV1, RepoRow.keyColumns, numBuckets = 4)
    val all = gen.changeEvents(spark, gen.GenConfig(n = 9000, nKeys = 9000, deletePct = 0,
      numPartitions = 4))
    (0 until 3).foreach { e =>
      table.append(all.filter(col("lsn") >= e * 3000 && col("lsn") < (e + 1) * 3000)
        .drop("lsn", "op", "schema_version"))
    }
    val before = table.snapshot
    val rowsBefore = table.read().agg(sum(crc32(concat_ws("|", col("repo"), col("path"),
      sha2(col("content"), 256))))).collect()(0).getLong(0)
    assert(before.files.groupBy(_.bucket).exists(_._2.size >= 2), "need multi-file buckets")
    val n = table.compact(minFiles = 2)
    assert(n > 0)
    val after = table.snapshot
    assert(after.files.groupBy(_.bucket).forall(_._2.size == 1))
    val rowsAfter = table.read().agg(sum(crc32(concat_ws("|", col("repo"), col("path"),
      sha2(col("content"), 256))))).collect()(0).getLong(0)
    assert(rowsAfter == rowsBefore)
    assert(after.epochId == before.epochId, "compaction must not advance the epoch fence")
  }

  test("vacuum removes unreferenced files and old manifests; current read unaffected") {
    val (table, _) = build(3)
    table.compact()
    val checksum = table.read().count()
    val (manifests, files) = table.vacuum(keepSnapshots = 1)
    assert(manifests > 0 && files > 0, s"removed ($manifests, $files)")
    assert(table.read().count() == checksum)
    assert(table.history().size == 1)
    // a second vacuum is a no-op
    val (m2, f2) = table.vacuum(keepSnapshots = 1)
    assert(m2 == 0 && f2 == 0)
  }
}
