package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cdc._
import graft.cdc.lake._
import graft.cdc.model._

/** Watermarked windowed analytics over the streaming change feed, plus the
  * SQL view surface over lake tables. */
class ChangeFeedMetricsSpec extends SparkSuite {

  test("windowed per-op change-feed metrics over a streamed tail") {
    val cfg = gen.GenConfig(n = 4000, nKeys = 800, numPartitions = 2)
    val srcDir = tmpDir("feed-src")
    // synthesize an event-time column from the LSN (1 event / 50 ms)
    gen.changeEvents(spark, cfg)
      .withColumn("ts", to_timestamp(lit(1700000000L) + col("lsn") / 20))
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = streaming.changeFeedMetrics(stream, "ts", windowLen = "30 seconds")
      .writeStream.outputMode("complete").format("memory").queryName("feed_metrics")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("feed_metrics")
    assert(out.select("op").distinct().count() == 3) // I, U, D all present
    assert(out.agg(sum("n_events")).collect()(0).getLong(0) == cfg.n)
    val windows = out.select("window.start").distinct().count()
    assert(windows >= 5, s"expected multiple 30s windows, got $windows")
  }

  test("SQL view over a lake table; view binds a snapshot (MVCC)") {
    val cfg = gen.GenConfig(n = 3000, nKeys = 600, numPartitions = 2)
    val table = LakeTable.createIfNotExists(spark, tmpDir("view"), "t",
      RepoRow.schemaV1, RepoRow.keyColumns, numBuckets = 4)
    val engine = new ingest.ReplayEngine(table, SchemaRegistry.single(RepoRow.schemaV1))
    val all = gen.changeEvents(spark, cfg)
    engine.applyEpoch(all.filter(col("lsn") < 1500), 0)
    table.createView("repo_files_v")
    val n0 = spark.sql("SELECT count(*) AS n FROM repo_files_v").collect()(0).getLong(0)
    assert(n0 > 0)
    val byLang = spark.sql(
      "SELECT lang, count(*) n FROM repo_files_v GROUP BY lang ORDER BY lang").collect()
    assert(byLang.nonEmpty)
    // commit epoch 1: the existing view still reads the old snapshot...
    engine.applyEpoch(all.filter(col("lsn") >= 1500), 1)
    assert(spark.sql("SELECT count(*) FROM repo_files_v").collect()(0).getLong(0) == n0)
    // ...re-registering binds the new one
    table.createView("repo_files_v")
    assert(spark.sql("SELECT count(*) FROM repo_files_v").collect()(0).getLong(0) != n0)
  }
}
