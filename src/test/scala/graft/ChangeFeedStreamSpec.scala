package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cdc._
import graft.cdc.lake._
import graft.cdc.ingest._
import graft.cdc.model._

/** Streaming CDC-out: `format("graft-changes")` tails the lake change feed
  * (offset = snapshot version) with exactly-once resume through the SS
  * checkpoint, and FAILS (never skips) when compaction folds past the
  * consumer. */
class ChangeFeedStreamSpec extends SparkSuite {

  private def drain(root: String, ckDir: String, outDir: String,
      startingVersion: String = "earliest"): Unit = {
    val q = spark.readStream.format("graft-changes")
      .option("path", root)
      .option("startingVersion", startingVersion)
      .load()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("stream tails the feed incrementally; checkpoint restart is exactly-once") {
    val cfg = gen.GenConfig(n = 6000, nKeys = 1000, numPartitions = 4)
    val root = tmpDir("cfs-lake")
    val ckDir = tmpDir("cfs-ck")
    val outDir = tmpDir("cfs-out")
    val table = LakeTable.createIfNotExists(spark, root, "t",
      RepoRow.schemaV1, RepoRow.keyColumns, numBuckets = 4)
    val engine = new ReplayEngine(table, SchemaRegistry.single(RepoRow.schemaV1),
      mode = MergeMode.MoR)
    val all = gen.changeEvents(spark, cfg).cache()

    engine.applyEpoch(all.filter(col("lsn") < 3000), 0)
    val wave1 = table.changesSince(table.history().head)
      .select("lsn", "repo", "path").collect().map(_.toSeq).toSet
    drain(root, ckDir, outDir)
    val got1 = spark.read.parquet(outDir).select("lsn", "repo", "path")
      .collect().map(_.toSeq).toSet
    assert(got1 == wave1, s"first drain must equal changesSince(earliest): " +
      s"${got1.size} vs ${wave1.size}")

    // second wave arrives; a restart on the SAME checkpoint appends only the
    // NEW delta rows (offset log remembers the consumed snapshot version)
    val mark = table.snapshot.version
    engine.applyEpoch(all.filter(col("lsn") >= 3000), 1)
    all.unpersist()
    val wave2 = table.changesSince(mark).select("lsn", "repo", "path")
      .collect().map(_.toSeq).toSet
    drain(root, ckDir, outDir)
    val got2 = spark.read.parquet(outDir).select("lsn", "repo", "path")
      .collect().map(_.toSeq).toSet
    assert(got2 == wave1 ++ wave2, "restart must append exactly the new changes")
    assert(got2.size == wave1.size + wave2.size, "no duplicates across restarts")

    // idle restart: nothing new committed -> nothing appended, no error
    drain(root, ckDir, outDir)
    assert(spark.read.parquet(outDir).count() == got2.size, "idle drain must be a no-op")
  }

  test("Trigger.AvailableNow drains a backfill in maxVersionsPerTrigger-bounded batches") {
    // native SupportsTriggerAvailableNow: the end is pinned at prepare time
    // and the drain proceeds in version-bounded micro-batches (backfill
    // pacing) — not the engine's single-batch fallback
    val root = tmpDir("cfs-an-lake")
    val table = LakeTable.createIfNotExists(spark, root, "t",
      RepoRow.schemaV1, RepoRow.keyColumns, numBuckets = 4)
    val engine = new ReplayEngine(table, SchemaRegistry.single(RepoRow.schemaV1),
      mode = MergeMode.MoR)
    val cfg = gen.GenConfig(n = 4000, nKeys = 800, numPartitions = 4)
    val all = gen.changeEvents(spark, cfg).cache()
    (0 until 4).foreach(e =>
      engine.applyEpoch(all.filter(col("lsn") >= e * 1000 && col("lsn") < (e + 1) * 1000), e))
    val expected = table.changesSince(table.history().head)
      .select("lsn", "repo", "path").collect().map(_.toSeq).toSet
    all.unpersist()
    val outDir = tmpDir("cfs-an-out")
    val q = spark.readStream.format("graft-changes")
      .option("path", root).option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", tmpDir("cfs-an-ck"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow must self-terminate at the pinned cap")
    val got = spark.read.parquet(outDir).select("lsn", "repo", "path")
      .collect().map(_.toSeq).toSet
    assert(got == expected, s"drained ${got.size} of ${expected.size} change rows")
    // one version per micro-batch: 4 delta commits -> at least 4 data batches
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 4, s"expected a bounded multi-batch drain, got $dataBatches data batches")
  }

  test("q44 path: feed-driven downstream table equals the direct replay") {
    val got = ops.cdcq.changeFeedStream(spark, "/root/testdata/sf0.001").collect().toSeq
    val expected = ops.cdcq.replay(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(got.nonEmpty && got == expected,
      s"feed-driven downstream must equal the batch replay (${got.size} vs ${expected.size})")
  }

  test("a stream that falls behind the compaction window fails loudly, never skips") {
    import spark.implicits._
    val root = tmpDir("cfs-fold-lake")
    val ckDir = tmpDir("cfs-fold-ck")
    val outDir = tmpDir("cfs-fold-out")
    val table = LakeTable.createIfNotExists(spark, root, "t",
      RepoRow.schemaV1, RepoRow.keyColumns, numBuckets = 2)
    val engine = new ReplayEngine(table, SchemaRegistry.single(RepoRow.schemaV1),
      mode = MergeMode.MoR)
    def ev(lsn: Long, path: String) = (lsn, "U", "r", path, s"c$lsn", "scala", s"body$lsn")
    engine.applyEpoch(Seq(ev(1, "a"), ev(2, "b"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content"), 0)
    drain(root, ckDir, outDir) // consumer checkpoint now at the epoch-0 snapshot

    // changes the consumer has NOT seen get folded away by compaction
    engine.applyEpoch(Seq(ev(3, "a"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content"), 1)
    table.compactDeltas()

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, ckDir, outDir)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("no longer available")),
      s"folded-loss must surface, got: ${messages(e).mkString(" | ")}")
  }
}
