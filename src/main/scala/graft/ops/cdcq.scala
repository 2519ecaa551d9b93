package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc._
import graft.cdc.lake._
import graft.cdc.ingest._
import graft.cdc.model._

/** CDC engine exposed as oracle-checkable queries: the events table is a
  * change-stream stand-in (lsn = event_id, key = user_id -> (repo, path),
  * 'error' = delete). Each query replays the stream through the REAL lake
  * engine (epochs, dedup, CoW merge, fenced commits) into a temp-dir table
  * and returns the final state — which DuckDB re-derives relationally. This
  * makes the whole replay path (not just its pieces) part of the driver's
  * correctness gate.
  */
object cdcq {
  /** Scratch roots for the oracle queries' temp lake tables, checkpoints and
    * staged stream files. Prefers tmpfs (/dev/shm) for the same reason the
    * bench harness keeps its own CDC I/O there (BENCH.md): the single-box
    * root disk is a shared, non-scaling resource whose write/fsync latency
    * would otherwise dominate these small tables' commit and state-store
    * paths, while a real deployment's table roots sit on storage whose
    * bandwidth scales with the cluster. Falls back to java.io.tmpdir when
    * tmpfs is unavailable. Every dir created here is removed best-effort at
    * JVM exit, so repeated runs don't accumulate in shared memory. */
  private lazy val scratchBase: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) {
      val d = shm.resolve("graft-cdcq-scratch")
      java.nio.file.Files.createDirectories(d)
      d
    } else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val w = java.nio.file.Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
      finally w.close()
    }
  private def scratchDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(scratchBase, prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(d) catch { case _: Throwable => () }))
    d
  }

  /** One GraftCatalog per (prefix, dataset dir), created on first use with a
    * temp warehouse and a `db` namespace; returns the catalog name. Shared
    * by every SQL-surface oracle query so catalog setup can't drift. */
  private def ensureCatalog(spark: SparkSession, dir: String, prefix: String): String = {
    val cat = s"$prefix${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
    if (spark.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        scratchDir(s"graft-$prefix").toString)
    }
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    cat
  }

  /** Per-epoch event counts in ONE aggregate job over the (cached) changes.
    * Passing these as `knownInputCount` lets every epoch take the fused
    * dense-merge path (per-bucket stats ride the merge job as observed
    * metrics) AND skips the per-epoch metrics count() scan — one Spark job
    * per epoch instead of three (guide §1.2: remove unnecessary passes).
    * Exact by construction: floor(lsn / per) == e iff e*per <= lsn <
    * (e+1)*per, the identical range the epoch loop filters on. */
  private def epochCounts(changes: DataFrame, per: Long): Map[Int, Long] =
    changes.groupBy(floor(col("lsn") / per).cast("int").as("_e"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap


  /** Map the events table to change events with the north-rule key shape. */
  private def asChanges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .select(
        col("event_id").as("lsn"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        concat(lit("r"), (col("user_id") % 50).cast("string")).as("repo"),
        concat(lit("p/"), col("user_id").cast("string")).as("path"),
        col("event_id").cast("string").as("commit_id"),
        col("event_type").as("lang"),
        col("props").as("content"))

  private val tableSchema = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit_id", StringType),
    StructField("lang", StringType),
    StructField("content", StringType)))

  /** Flagship: multi-epoch replay through the lake engine; returns the final
    * table state (repo, path, commit_id, lang, content). */
  def replay(spark: SparkSession, dir: String): DataFrame = {
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val root = scratchDir("graft-cdcq").toString
    val table = LakeTable.createIfNotExists(spark, root, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val engine = new ReplayEngine(table, SchemaRegistry.single(tableSchema))
    val epochs = 4
    val per = (maxLsn + epochs) / epochs // ceil so the last range covers maxLsn
    val counts = epochCounts(changes, per)
    (0 until epochs).foreach { e =>
      engine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = Some(counts.getOrElse(e, 0L)))
    }
    changes.unpersist()
    table.read()
      .select(col("repo"), col("path"), col("commit_id"), col("lang"), col("content"))
      .orderBy(col("repo"), col("path"))
  }

  /** Flagship, merge-on-read mode: epochs append per-key-winner delta files;
    * the final read applies them (then a compaction fold is verified to be a
    * logical no-op). Same relational oracle as the CoW replay. */
  def replayMor(spark: SparkSession, dir: String): DataFrame = {
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val root = scratchDir("graft-cdcq-mor").toString
    val table = LakeTable.createIfNotExists(spark, root, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val engine = new ReplayEngine(table, SchemaRegistry.single(tableSchema),
      mode = ingest.MergeMode.MoR)
    val epochs = 4
    val per = (maxLsn + epochs) / epochs
    val counts = epochCounts(changes, per)
    (0 until epochs).foreach { e =>
      engine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = Some(counts.getOrElse(e, 0L)))
    }
    changes.unpersist()
    table.compactDeltas()
    table.read()
      .select(col("repo"), col("path"), col("commit_id"), col("lang"), col("content"))
      .orderBy(col("repo"), col("path"))
  }

  /** CDC-out (`LakeTable.changesSince`): the lake table as a change SOURCE.
    * A merge-on-read replay applies 4 epochs as per-key-winner delta files;
    * the feed taken since the post-epoch-1 snapshot must carry EXACTLY the
    * later two epochs' per-key winners (lsn, op, payload — tombstones
    * included), which DuckDB re-derives from the raw event ranges. The O(1)
    * completeness check is exercised too: after a compaction folds the
    * deltas away, `changesSince` from the same snapshot must refuse loudly
    * (silently returning survivors would be downstream data loss). */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val root = scratchDir("graft-cdcq-feed").toString
    val table = LakeTable.createIfNotExists(spark, root, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val engine = new ReplayEngine(table, SchemaRegistry.single(tableSchema),
      mode = ingest.MergeMode.MoR)
    val epochs = 4
    val per = (maxLsn + epochs) / epochs
    val counts = epochCounts(changes, per)
    var sinceVersion = -1L
    (0 until epochs).foreach { e =>
      engine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = Some(counts.getOrElse(e, 0L)))
      if (e == 1) sinceVersion = table.snapshot.version
    }
    changes.unpersist()
    // the feed resolves its delta files NOW (pre-compaction snapshot)
    val feed = table.changesSince(sinceVersion)
      .select(col("lsn"), col("op"), col("repo"), col("path"),
        col("commit_id"), col("lang"), col("content"))
      .orderBy(col("lsn"))
    // compaction folds the post-since deltas away: the completeness check
    // must now refuse the same feed instead of silently returning less
    assert(table.compactDeltas() > 0, "the MoR replay must leave deltas to compact")
    val refused =
      try { table.changesSince(sinceVersion); false }
      catch { case e: IllegalStateException => e.getMessage.contains("compacted/merged away") }
    assert(refused, "changesSince across a compaction must refuse (folded-loss detection)")
    feed
  }

  /** [[changeFeed]] through the SQL surface: the same MoR replay runs
    * against a GraftCatalog-registered table root, and the feed is read as
    * the `t.changes_since_<v>` metadata table — CDC-out as a first-class
    * SQL citizen, same relational oracle as q42. */
  def changeFeedSql(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gcf")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.repo_files")
    spark.sql(
      s"""CREATE TABLE $cat.db.repo_files
          (repo STRING, path STRING, commit_id STRING, lang STRING, content STRING)
          TBLPROPERTIES ('primary_key'='repo,path', 'buckets'='16')""")
    val root = spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + "/db/repo_files"
    val table = LakeTable.load(spark, root, "repo_files")
    val engine = new ReplayEngine(table, table.snapshot.registry,
      mode = ingest.MergeMode.MoR)
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val epochs = 4
    val per = (maxLsn + epochs) / epochs
    val counts = epochCounts(changes, per)
    var sinceVersion = -1L
    (0 until epochs).foreach { e =>
      engine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = Some(counts.getOrElse(e, 0L)))
      if (e == 1) sinceVersion = table.snapshot.version
    }
    changes.unpersist()
    spark.sql(
      s"""SELECT lsn, op, repo, path, commit_id, lang, content
          FROM $cat.db.repo_files.changes_since_$sinceVersion ORDER BY lsn""")
  }

  /** Streaming CDC-out end-to-end (q44): an upstream MoR replay produces the
    * change feed; a `format("graft-changes")` stream tails it (offset =
    * snapshot version) and [[streaming.replayStream]] applies each
    * micro-batch into an independent DOWNSTREAM lake table — feed rows carry
    * exactly the (lsn, op, payload) change shape the CDC-in engine consumes,
    * so CDC-out composes with CDC-in end-to-end. The tail is drained TWICE on
    * one checkpoint (mid-replay and after), proving incremental offsets; the
    * downstream table must equal the upstream replay — same relational
    * oracle as q30. */
  def changeFeedStream(spark: SparkSession, dir: String): DataFrame = {
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val upRoot = scratchDir("graft-cdcq-cfs-up").toString
    val downRoot = scratchDir("graft-cdcq-cfs-dn").toString
    val ck = scratchDir("graft-cdcq-cfs-ck").toString
    val up = LakeTable.createIfNotExists(spark, upRoot, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val upEngine = new ReplayEngine(up, SchemaRegistry.single(tableSchema),
      mode = ingest.MergeMode.MoR)
    val down = LakeTable.createIfNotExists(spark, downRoot, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val downEngine = new ReplayEngine(down, SchemaRegistry.single(tableSchema))
    def drainFeed(): Unit = {
      val feed = spark.readStream.format("graft-changes")
        .option("path", upRoot).option("startingVersion", "earliest").load()
      val q = streaming.replayStream(feed, downEngine, ck)
      q.awaitTermination(120000)
    }
    val epochs = 4
    val per = (maxLsn + epochs) / epochs
    val counts = epochCounts(changes, per)
    (0 until epochs).foreach { e =>
      upEngine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = Some(counts.getOrElse(e, 0L)))
      if (e == 1) drainFeed() // mid-replay drain: checkpoint holds a mid-log offset
    }
    changes.unpersist()
    drainFeed() // second drain on the SAME checkpoint picks up only epochs 2-3
    down.read()
      .select(col("repo"), col("path"), col("commit_id"), col("lang"), col("content"))
      .orderBy(col("repo"), col("path"))
  }

  /** Rebucket mid-replay (q45): the bucket-count lifecycle op under live
    * ingest. Epochs 0-1 apply merge-on-read against a 16-bucket catalog
    * table (leaving outstanding delta files); `CALL cat.system.rebucket`
    * rewrites the table to 64 buckets THROUGH SQL — absorbing the deltas,
    * leaving the epoch fence untouched — and epochs 2-3 then apply against
    * the new layout through the SAME engine handle (MVCC: the handle picks
    * the rebucketed snapshot up from `_CURRENT`). Final state must equal
    * the plain q30 replay — the rebucket is a logical no-op by contract,
    * and this query makes that contract oracle-checked end-to-end. The
    * layout change itself is asserted in-query (buckets 16 -> 64, no
    * surviving deltas, fence intact), so a silently-skipped rebucket fails
    * the query rather than trivially matching the oracle. */
  def replayRebucket(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "grb")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.repo_files")
    spark.sql(
      s"""CREATE TABLE $cat.db.repo_files
          (repo STRING, path STRING, commit_id STRING, lang STRING, content STRING)
          TBLPROPERTIES ('primary_key'='repo,path', 'buckets'='16')""")
    val root = spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + "/db/repo_files"
    val table = LakeTable.load(spark, root, "repo_files")
    val engine = new ReplayEngine(table, table.snapshot.registry,
      mode = ingest.MergeMode.MoR)
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val epochs = 4
    val per = (maxLsn + epochs) / epochs
    val counts = epochCounts(changes, per)
    (0 until epochs).foreach { e =>
      engine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = Some(counts.getOrElse(e, 0L)))
      if (e == 1) {
        val before = table.snapshot
        require(table.filesOf(before).exists(_.kind == "delta"),
          "q45 setup must leave MoR deltas for the rebucket to absorb")
        val res = spark.sql(s"CALL $cat.system.rebucket('db.repo_files', 64)").collect()(0)
        require(res.getInt(1) == 64, s"rebucket must report the new count: $res")
        val snap = table.snapshot
        require(snap.numBuckets == 64, "the engine handle must see the rebucketed layout")
        require(snap.epochId == before.epochId, "rebucket must not advance the epoch fence")
        require(table.filesOf(snap).forall(_.kind == "base"),
          "the rebucket rewrite must absorb outstanding deltas")
      }
    }
    changes.unpersist()
    table.compactDeltas()
    spark.sql(
      s"""SELECT repo, path, commit_id, lang, content
          FROM $cat.db.repo_files ORDER BY repo, path""")
  }

  /** Streaming replay end-to-end (SURVEY §2.8): the change stream laid out as
    * an epoch-ordered file tail — with deterministic stale REDELIVERIES of
    * earlier-epoch events seeded into later files — drained by ONE
    * `Trigger.AvailableNow` query: file source -> cross-epoch stateful dedup
    * (TTL-evicted via the lake's committed lsnHigh published through a
    * shared-storage watermark file) -> foreachBatch epochs through the SAME
    * ReplayEngine as q30.
    *
    * The redeliveries exercise the at-least-once tail: the stateful dedup
    * suppresses them before they cost an epoch any work, and it remains
    * load-bearing for DELETED keys (a stale pre-delete redelivery has no
    * surviving base row to outrank it — only the dedup watermark stops the
    * resurrection); existing keys are additionally guarded by the stored
    * row `_lsn` in base files. The TTL path is equally load-bearing: the
    * drain loop REQUIRES the state store to reach zero rows (eviction under
    * the published watermark) before stopping.
    *
    * Trigger choice: `Trigger.ProcessingTime` + poll + stop, NOT
    * AvailableNow — Spark 4.1's AvailableNow never terminates while a
    * ProcessingTimeTimeout is armed (a due deadline re-arms on every
    * no-data batch), so a TTL'd dedup must run as a long-lived query that
    * the caller stops once input is drained and state evicted — which is
    * the production shape of a binlog tail anyway. */
  def streamReplay(spark: SparkSession, dir: String): DataFrame =
    streamReplayImpl(spark, dir, restartMidway = false)

  /** [[streamReplay]] with a CRASH-RESUME in the middle: the first query is
    * stopped cold once roughly half the input is durably committed (whatever
    * micro-batch is in flight dies with it), and a SECOND query on the SAME
    * checkpoint drains the rest. Exactly-once across the restart is the
    * north rule's composition — Structured Streaming redelivers the
    * interrupted batch under its original batchId, the lake's epoch fence
    * makes a committed redelivery a no-op, and the dedup state store
    * restores from the checkpoint — so the final state matches the same
    * relational oracle as the uninterrupted q41 replay. */
  def streamReplayRestart(spark: SparkSession, dir: String): DataFrame =
    streamReplayImpl(spark, dir, restartMidway = true)

  private def streamReplayImpl(spark: SparkSession, dir: String,
      restartMidway: Boolean): DataFrame = {
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val root = scratchDir("graft-cdcq-stream")
    val srcDir = root.resolve("tail")
    java.nio.file.Files.createDirectories(srcDir)
    val epochs = 4
    val per = (maxLsn + epochs) / epochs
    // Stage the whole tail in ONE Spark job (guide §1.2: fewer passes): the
    // fresh rows tagged with their own epoch, unioned with the redeliveries
    // — every 7th event of the PREVIOUS epoch arrives again (the
    // at-least-once tail the stateful dedup exists for) tagged with the
    // NEXT epoch's file — written partitioned by epoch (one file each via
    // the epoch-aligned repartition), then moved into the tail dir. The
    // previous shape ran one coalesce(1) job per epoch.
    val stage = root.resolve("stage")
    val tagged = changes.withColumn("_ep", floor(col("lsn") / per))
      .filter(col("_ep") < epochs)
    val redelivered = tagged.filter(pmod(col("lsn"), lit(7)) === 0 && col("_ep") < epochs - 1)
      .withColumn("_ep", col("_ep") + 1)
    tagged.unionByName(redelivered)
      .repartition(epochs, col("_ep"))
      .write.partitionBy("_ep").parquet(stage.toString)
    (0 until epochs).foreach { e =>
      val dir = stage.resolve(s"_ep=$e")
      val s = java.nio.file.Files.list(dir)
      val parts =
        try s.filter(p => p.toString.endsWith(".parquet"))
          .collect(java.util.stream.Collectors.toList[java.nio.file.Path])
        finally s.close()
      require(parts.size == 1, s"epoch $e staged ${parts.size} files (want 1)")
      val tgt = srcDir.resolve(f"ep$e%03d.parquet")
      java.nio.file.Files.move(parts.get(0), tgt)
      // pin mtimes so the file source schedules the tail in binlog order
      // (statefulDedup makes the result order-insensitive; the pinned order
      // keeps the exercised path the intended one)
      java.nio.file.Files.setLastModifiedTime(tgt,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + e * 60000L))
    }
    val table = LakeTable.createIfNotExists(spark, root.resolve("lake").toString, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val engine = new ReplayEngine(table, SchemaRegistry.single(tableSchema))
    val wmFile = root.resolve("wm").toString
    def start(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = streaming.changeStream(spark, srcDir.toString, changes.schema,
        maxFilesPerTrigger = Some(1))
      // pacing: the trigger interval and TTL only bound how fast the drain
      // CONVERGES (eviction fires on the first timeout tick after the
      // watermark passes a key) — they carry no correctness weight, so keep
      // the idle gaps short
      val deduped = streaming.statefulDedup(stream,
        evictBelowLsn = Some(streaming.LsnWatermark.supplier(wmFile)), stateTtl = "400 milliseconds")
      // State-partition count, captured by the query from the session conf
      // at start() and pinned in the checkpoint: every micro-batch loads +
      // commits one state store PER PARTITION, so the session's generic
      // shuffle width (sized for data shuffles) over-pays pure store
      // metadata here. Size it from the cluster's parallelism, not a local
      // constant (A/B at local[32]: quarter-width saved ~0.5 s per query,
      // identical results); the conf is restored right after start so the
      // foreachBatch merges (engine session) and later queries are
      // untouched. Both q41 starts and the q41b restart run in this JVM
      // with the same derivation, matching the checkpoint-pinned count.
      val spKey = "spark.sql.shuffle.partitions"
      val spPrev = spark.conf.getOption(spKey)
      spark.conf.set(spKey,
        math.max(1, spark.sparkContext.defaultParallelism / 4).toString)
      try streaming.replayStream(deduped, engine, root.resolve("ck").toString,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
        watermarkFile = Some(wmFile))
      finally spPrev match {
        case Some(v) => spark.conf.set(spKey, v)
        case None => spark.conf.unset(spKey)
      }
    }
    // snapshot-JSON-parse-free poll: the tiny _CURRENT pointer is read per
    // tick and the manifest parsed only when the version actually advanced
    var cachedVersion = -1L
    var cachedLsnHigh = -1L
    def lsnHigh(): Long = {
      val v = table.currentVersionOpt.getOrElse(-1L)
      if (v != cachedVersion) { cachedVersion = v; cachedLsnHigh = table.snapshotAt(v).lsnHigh }
      cachedLsnHigh
    }
    if (restartMidway) {
      // crash point: stop the tail cold once ~half the input is durably
      // committed; the in-flight micro-batch dies with the query and must
      // be redelivered (same batchId) to the resumed query below
      val q1 = start()
      try {
        val crashAt = 2 * per
        val deadline = System.currentTimeMillis() + 240000
        // tight poll: the faster the epochs commit, the likelier a slow poll
        // overshoots the crash point and leaves the resumed query nothing to
        // replay (handled below by the eviction nudge, but aim first)
        while (q1.isActive && lsnHigh() < crashAt &&
          System.currentTimeMillis() < deadline) Thread.sleep(10)
        q1.exception.foreach(e => throw e)
        assert(lsnHigh() >= crashAt,
          s"the first query must reach the crash point (lsnHigh ${lsnHigh()} < $crashAt)")
      } finally q1.stop()
    }
    val q = start()
    try {
      def stateRows: Long = Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
      val deadline = System.currentTimeMillis() + 240000
      // Eviction liveness nudge: a RESTARTED query that finds nothing left to
      // replay (the crash poll raced past the last epoch's commit) never runs
      // a micro-batch — Spark only schedules no-data batches when a prior
      // execution in the SAME run armed them — so restored dedup state's TTL
      // timeouts are never processed and the state count sits above zero
      // forever. If the table is fully drained but state remains for >2 s,
      // stage ONE empty tail file: the file source schedules a batch for it,
      // the batch carries zero events (the epoch apply short-circuits) and
      // the armed timeouts fire, evicting the covered keys.
      var nudged = false
      var drainedAt = -1L
      while (q.isActive && (lsnHigh() < maxLsn || stateRows != 0) &&
        System.currentTimeMillis() < deadline) {
        if (lsnHigh() >= maxLsn && stateRows != 0) {
          val now = System.currentTimeMillis()
          if (drainedAt < 0) drainedAt = now
          else if (!nudged && now - drainedAt > 2000) {
            nudged = true
            val stage = root.resolve("stage-nudge")
            changes.limit(0).coalesce(1).write.parquet(stage.toString)
            val s = java.nio.file.Files.list(stage)
            val part =
              try s.filter(p => p.toString.endsWith(".parquet")).findFirst().get
              finally s.close()
            val tgt = srcDir.resolve("ep999.parquet")
            java.nio.file.Files.move(part, tgt)
            java.nio.file.Files.setLastModifiedTime(tgt,
              java.nio.file.attribute.FileTime.fromMillis(1700000000000L + 999 * 60000L))
          }
        }
        Thread.sleep(50)
      }
      // surface the ROOT CAUSE if the query died (a swallowed foreachBatch /
      // state-store failure would otherwise read as a misleading drain
      // timeout four minutes later)
      q.exception.foreach(e => throw e)
      // dev-only per-batch breakdown (guide §1: measure before changing)
      if (System.getProperty("graft.debug.stream", "0") == "1")
        q.recentProgress.foreach(p => println(s"[stream] batch=${p.batchId} " +
          s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
          s"state=${p.stateOperators.headOption.map(s => s.numRowsTotal + "/" + s.customMetrics)}"))
      assert(table.snapshot.lsnHigh == maxLsn,
        s"stream must drain every epoch (lsnHigh ${table.snapshot.lsnHigh} < $maxLsn)")
      assert(stateRows == 0,
        "TTL must evict all dedup state once the committed watermark covers it")
    } finally {
      q.stop()
      changes.unpersist()
    }
    table.read()
      .select(col("repo"), col("path"), col("commit_id"), col("lang"), col("content"))
      .orderBy(col("repo"), col("path"))
  }

  /** Replay with a quality gate + persistent data_quality_checks audit table
    * (the reference's flagship DQ behavior, data_quality_evaluator.py:56-93):
    * two warn-level rules are seeded to fire (lang outside {click,view};
    * value < 1.0), error-level not-null PK rules stay clean, and every
    * epoch's failure summaries are appended to the audit lake table. Returns
    * the audit table's deterministic columns, which DuckDB re-derives from
    * the raw events. */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val audit = dqReplayAudit(spark, dir).audit
    audit.read()
      .select(col("job_id"), col("criticality"), col("check_name"),
        col("columns").getItem(0).as("col_name"), col("failed_rows"))
      .orderBy(col("job_id"), col("check_name"))
  }

  /** The two DQ side tables one gated replay populates. */
  private final case class DqTables(audit: LakeTable, quarantine: LakeTable)

  /** Replay with seeded warn violations; returns the populated audit +
    * quarantine tables. Memoized per (session, dir): q32, q35 and q38 all
    * consume these tables, and the replay's result is deterministic +
    * immutable once built — the bench/driver pays the gated replay once,
    * not per consuming query. */
  private val auditCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DqTables]()
  private def dqReplayAudit(spark: SparkSession, dir: String): DqTables = {
    purgeStopped(auditCache)
    auditCache.computeIfAbsent((spark, dir), _ => dqReplayAuditBuild(spark, dir))
  }

  /** Entries keyed by a stopped session are dead weight (and their cached
    * handles reference a dead context) — drop them before any lookup. */
  private def purgeStopped[V](
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]): Unit =
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)

  private def dqReplayAuditBuild(spark: SparkSession, dir: String): DqTables = {
    import graft.cdc.model._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val changes = asChanges(spark, dir)
      .join(ev.select(col("event_id").as("lsn"), col("value")), Seq("lsn"))
      .cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val schema = StructType(tableSchema.fields :+ StructField("value", DoubleType))
    val cols = Seq(
      ColumnDef("repo", StringType, nullable = false, isPrimaryKey = true),
      ColumnDef("path", StringType, nullable = false, isPrimaryKey = true),
      ColumnDef("commit_id", StringType),
      ColumnDef("lang", StringType, qualityRule =
        Some(QualityRule(Criticality.Warn, allowedValues = Some(Seq("click", "view"))))),
      ColumnDef("content", StringType),
      ColumnDef("value", DoubleType, qualityRule =
        Some(QualityRule(Criticality.Warn, minValue = Some(1.0)))))
    val gate = new quality.QualityGate(quality.Check.fromColumns(cols))
    val root = scratchDir("graft-cdcq-dq").toString
    val table = LakeTable.createIfNotExists(spark, s"$root/t", "repo_files",
      schema, Seq("repo", "path"), numBuckets = 16)
    val audit = LakeTable.createIfNotExists(spark, s"$root/dq", quality.DataQualityChecks.tableName,
      quality.DataQualityChecks.schema, Seq("table_name", "check_name"), numBuckets = 4)
    // row-level quarantine: deterministic columns only (lsn orders the dump;
    // _warnings is the to_json'd failure-annotation array)
    val quarantineSchema = StructType(Seq(
      StructField("lsn", LongType, nullable = false),
      StructField("epoch", LongType, nullable = false),
      StructField("repo", StringType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("lang", StringType),
      StructField("value", DoubleType),
      StructField("_warnings", StringType)))
    val quarantine = LakeTable.createIfNotExists(spark, s"$root/qr", "quarantine",
      quarantineSchema, Seq("lsn"), numBuckets = 4)
    val engine = new ReplayEngine(table, SchemaRegistry.single(schema),
      gate = Some(gate), auditTable = Some(audit), quarantineTable = Some(quarantine))
    val epochs = 4
    val per = (maxLsn + epochs) / epochs
    // per-epoch counts (one aggregate over the cached batch) let the engine
    // take the dense path, where the gate aggregates ride the merge job as
    // observed metrics — a gated epoch costs ONE scan, not two
    val perEpochCounts = changes.groupBy(floor(col("lsn") / per).cast("int").as("_e"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until epochs).foreach { e =>
      engine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = perEpochCounts.get(e))
    }
    changes.unpersist()
    DqTables(audit, quarantine)
  }

  /** The quarantined ROWS of the gated replay (reference DQX
    * apply_checks_and_split, data_quality_evaluator.py:56-65): every event
    * row that failed a check, with its failure annotations serialized as
    * JSON. DuckDB re-derives the rows AND the annotation JSON from the raw
    * events — zero DQ behaviors left value-unchecked. */
  def dqQuarantine(spark: SparkSession, dir: String): DataFrame =
    dqReplayAudit(spark, dir).quarantine.read()
      .select(col("lsn"), col("epoch"), col("repo"), col("path"),
        col("lang"), col("value"), col("_warnings"))
      .orderBy(col("lsn"))

  /** The auto-derived PK-uniqueness check firing on a gated OVERWRITE sink
    * (reference's flagship DQX rule, data_quality_table.py:51-58): raw
    * events keyed by user_id carry duplicates, the error-level is_unique
    * check fires, its audit rows persist BEFORE the abort, and the write is
    * refused. Returns the audit rows. */
  def dqUniqueness(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"), col("value"))
    val td = TableDef("users_latest", Seq(
      ColumnDef("user_id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("event_type", StringType),
      ColumnDef("value", DoubleType)), numBuckets = 4)
    val gate = quality.QualityGate.forTable(td)
    val root = scratchDir("graft-dq-uniq").toString
    val table = LakeTable.createIfNotExists(spark, s"$root/t", td.name,
      td.schema, td.primaryKey, numBuckets = td.numBuckets)
    val audit = LakeTable.createIfNotExists(spark, s"$root/dq", quality.DataQualityChecks.tableName,
      quality.DataQualityChecks.schema, Seq("table_name", "check_name"), numBuckets = 4)
    val refused =
      try { quality.GatedWriter.overwrite(table, ev, gate, Some(audit), jobId = 0); false }
      catch { case _: quality.QualityGateError => true }
    assert(refused, "seeded duplicate PKs must abort the gated overwrite")
    assert(table.read().isEmpty, "aborted overwrite must leave the table empty")
    audit.read()
      .select(col("criticality"), col("check_name"),
        col("columns").getItem(0).as("col_name"), col("failed_rows"))
      .orderBy(col("check_name"))
  }

  /** The lake table through the Spark SQL surface: replay the stream, expose
    * the table state as a temp view via [[LakeTable.createView]], and answer
    * with `spark.sql` — the engine's tables are first-class SQL citizens
    * (views bind a snapshot, so concurrent commits don't shift results). */
  def sqlOverLake(spark: SparkSession, dir: String): DataFrame = {
    val changes = asChanges(spark, dir).cache()
    val maxLsn = changes.agg(max("lsn")).collect()(0).getLong(0)
    val root = scratchDir("graft-cdcq-sql").toString
    val table = LakeTable.createIfNotExists(spark, root, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val engine = new ReplayEngine(table, SchemaRegistry.single(tableSchema))
    val epochs = 2
    val per = (maxLsn + epochs) / epochs
    val counts = epochCounts(changes, per)
    (0 until epochs).foreach { e =>
      engine.applyEpoch(
        changes.filter(col("lsn") >= e * per && col("lsn") < (e + 1) * per), e,
        knownInputCount = Some(counts.getOrElse(e, 0L)))
    }
    changes.unpersist()
    table.createView("repo_files_v")
    spark.sql(
      """SELECT lang, COUNT(*) AS n_files, COUNT(DISTINCT repo) AS n_repos,
                MAX(commit_id) AS max_commit
         FROM repo_files_v GROUP BY lang ORDER BY lang""")
  }

  /** Timeliness SLO job (reference src/metadata/slo/timeliness.py): events
    * stand in for job runs (job = event_type, period_end_time = ts, run
    * succeeded iff value >= 1). Derives per-(day, job) ready_by_09 and
    * MERGEs it into the timeliness SLO lake table; returns the table state. */
  def sloTimeliness(spark: SparkSession, dir: String): DataFrame = {
    import graft.cdc.slo._
    val runs = spark.read.parquet(s"$dir/events.parquet")
      .select(col("ts").as("period_end_time"), col("event_type").as("job_name"),
        when(col("value") >= 1.0, "SUCCEEDED").otherwise("FAILED").as("result_state"))
    val root = scratchDir("graft-slo-t").toString
    val table = LakeTable.createIfNotExists(spark, root, "timeliness",
      TimelinessSlo.schema, TimelinessSlo.keyColumns, numBuckets = 4)
    TimelinessSlo.upsert(table, TimelinessSlo.derive(runs), epochId = 0)
    // date rendered ISO for the cross-engine compare (parquet date32 vs
    // DuckDB DATE deserialize differently driver-side)
    table.read()
      .select(col("date").cast("string").as("date"), col("job_name"), col("ready_by_09"))
      .orderBy(col("date"), col("job_name"))
  }

  /** Quality SLO job (reference src/metadata/slo/quality.py): aggregates the
    * data_quality_checks audit log produced by the gated replay into
    * per-run failure counts, MERGEd into the quality SLO lake table. */
  def sloQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.cdc.slo._
    val audit = dqReplayAudit(spark, dir).audit
    val root = scratchDir("graft-slo-q").toString
    val table = LakeTable.createIfNotExists(spark, root, "quality",
      QualitySlo.schema, QualitySlo.keyColumns, numBuckets = 4)
    QualitySlo.upsert(table, QualitySlo.derive(audit.read()), epochId = 0)
    table.read().orderBy(col("run_id"))
  }

  /** Build (once per session+dir) a GraftCatalog-registered lake table and
    * apply the change stream to it with two SQL `MERGE INTO` statements —
    * the whole path runs through Catalyst: GraftCatalog resolution, the
    * GraftMergeRewrite analyzer rule, and the engine's CoW merge kernel.
    * Requires `spark.sql.extensions = graft.sql.GraftExtensions` (set by
    * Verify/Bench/test sessions). Returns the catalog name. */
  private val sqlMergeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private def sqlMergeTable(spark: SparkSession, dir: String): String = {
    purgeStopped(sqlMergeCache)
    sqlMergeCache.computeIfAbsent((spark, dir), _ => {
      // catalog name must be unique per (session, dir): catalog plugin
      // instances are cached by name with their warehouse at first load
      val cat = s"gmerge${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val wh = scratchDir("graft-sqlmerge").toString
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(
        s"""CREATE TABLE $cat.db.repo_files
            (repo STRING, path STRING, commit_id STRING, lang STRING, content STRING)
            TBLPROPERTIES ('primary_key'='repo,path', 'buckets'='16')""")
      asChanges(spark, dir).createOrReplaceTempView(s"changes_$cat")
      val maxLsn = spark.table(s"changes_$cat").agg(max("lsn")).collect()(0).getLong(0)
      val half = (maxLsn + 2) / 2
      Seq(s"lsn < $half", s"lsn >= $half").foreach { range =>
        // one MERGE per epoch; the source pre-dedups to the epoch's per-key
        // winner (ANSI MERGE requires unique matches), deletes ride the
        // WHEN MATCHED ... DELETE leg keyed on the tombstone op
        spark.sql(
          s"""MERGE INTO $cat.db.repo_files t
              USING (SELECT repo, path, commit_id, lang, content, op FROM (
                       SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
                       FROM changes_$cat WHERE $range) WHERE rn = 1) s
              ON t.repo = s.repo AND t.path = s.path
              WHEN MATCHED AND s.op = 'D' THEN DELETE
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *""")
      }
      cat
    })
  }

  /** SQL MERGE INTO through Catalyst (SURVEY §7.5 step 8): same oracle as
    * the programmatic replay — the SQL surface and the engine API converge
    * on the identical final state. */
  def sqlMerge(spark: SparkSession, dir: String): DataFrame = {
    val cat = sqlMergeTable(spark, dir)
    spark.sql(
      s"""SELECT repo, path, commit_id, lang, content FROM $cat.db.repo_files
          ORDER BY repo, path""")
  }

  /** Data-skipping scan (file-level column bounds + key-hash bucket pruning)
    * over the SQL-merged table: a point lookup that — asserted in-query —
    * plans exactly ONE of the table's 16 buckets, plus an IN-list lookup,
    * both value-checked against the relational oracle. At the 100 TB
    * envelope this is the difference between a point read opening one
    * bucket's surviving files and opening the world. */
  def skippingScan(spark: SparkSession, dir: String): DataFrame = {
    val cat = sqlMergeTable(spark, dir)
    skipping.ScanStats.last.set(None)
    val point = spark.sql(
      s"""SELECT 'point' AS q, repo, path, commit_id, lang
          FROM $cat.db.repo_files WHERE repo = 'r7' AND path = 'p/7'""")
    point.collect()
    val (b, bTot, f, fTot) = skipping.ScanStats.last.get()
      .getOrElse(sys.error("the SQL scan must plan through readWhere"))
    require(b == 1 && bTot == 16,
      s"point lookup must plan exactly 1 of 16 buckets, planned $b/$bTot ($f/$fTot files)")
    val multi = spark.sql(
      s"""SELECT 'multi' AS q, repo, path, commit_id, lang
          FROM $cat.db.repo_files
          WHERE repo IN ('r1','r2','r3') AND path IN ('p/1','p/2','p/3')""")
    point.unionByName(multi).orderBy("q", "repo", "path")
  }

  /** SQL `UPDATE` + `DELETE FROM` through Catalyst (the GraftMergeRewrite
    * row-level lowerings): latest-per-user state is INSERTed into a catalog
    * table, low-value rows are UPDATEd to 'flagged', error rows DELETEd —
    * every statement runs the engine's tombstone merge kernel. The oracle
    * re-derives the same flag-then-delete pipeline relationally. */
  def sqlRowLevel(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "grl")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.users")
    spark.sql(
      s"""CREATE TABLE $cat.db.users (user_id BIGINT, event_type STRING, value DOUBLE)
          TBLPROPERTIES ('primary_key'='user_id', 'buckets'='8')""")
    val latest = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(max_by(struct(col("event_type"), col("value")), col("event_id")).as("e"))
      .select(col("user_id"), col("e.event_type").as("event_type"), col("e.value").as("value"))
    latest.writeTo(s"$cat.db.users").append()
    spark.sql(s"UPDATE $cat.db.users SET event_type = 'flagged' WHERE value < 1.0")
    spark.sql(s"DELETE FROM $cat.db.users WHERE event_type = 'error'")
    spark.sql(s"SELECT user_id, event_type, value FROM $cat.db.users ORDER BY user_id")
  }

  /** SQL MERGE with a partial `SET` list (the most common real-world MERGE
    * shape after `SET *`): latest-per-user state is INSERTed into a catalog
    * table, then a conditional `WHEN MATCHED AND s.maxv >= 90 THEN UPDATE
    * SET ...` merge applies per-column assignments that mix TARGET and
    * SOURCE references — non-assigned columns keep the target row's values
    * (ANSI), rows failing the leg condition are untouched, and the
    * update-only merge has NO insert leg (its slim aggregate source carries
    * only the key + referenced columns). The oracle re-derives the same
    * flag-and-add pipeline relationally. */
  def sqlMergePartialSet(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gmp")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.users")
    spark.sql(
      s"""CREATE TABLE $cat.db.users (user_id BIGINT, event_type STRING, value DOUBLE)
          TBLPROPERTIES ('primary_key'='user_id', 'buckets'='8')""")
    val latest = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(max_by(struct(col("event_type"), col("value")), col("event_id")).as("e"))
      .select(col("user_id"), col("e.event_type").as("event_type"), col("e.value").as("value"))
    latest.writeTo(s"$cat.db.users").append()
    spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id").agg(max(col("value")).as("maxv"))
      .createOrReplaceTempView(s"user_stats_$cat")
    spark.sql(
      s"""MERGE INTO $cat.db.users t
          USING user_stats_$cat s
          ON t.user_id = s.user_id
          WHEN MATCHED AND s.maxv >= 220.0 THEN
            UPDATE SET event_type = concat(t.event_type, ':hot'), value = t.value + s.maxv""")
    spark.sql(s"SELECT user_id, event_type, value FROM $cat.db.users ORDER BY user_id")
  }

  /** SQL MERGE with the ANSI third leg (`WHEN NOT MATCHED BY SOURCE THEN
    * DELETE`) — the full-sync pattern: a users table seeded with EVERY
    * user's latest state is synced to a source carrying only even-id
    * non-error users, so matched users update, absent target users (odd ids
    * and error-latest) are tombstoned through the same merge kernel. The
    * oracle re-derives the synced state relationally. */
  def sqlMergeFullSync(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gfs")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.users")
    spark.sql(
      s"""CREATE TABLE $cat.db.users (user_id BIGINT, event_type STRING, value DOUBLE)
          TBLPROPERTIES ('primary_key'='user_id', 'buckets'='8')""")
    val latest = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(max_by(struct(col("event_type"), col("value")), col("event_id")).as("e"))
      .select(col("user_id"), col("e.event_type").as("event_type"), col("e.value").as("value"))
    latest.writeTo(s"$cat.db.users").append()
    latest.filter(col("user_id") % 2 === 0 && col("event_type") =!= "error")
      .withColumn("value", col("value") + 1000.0)
      .createOrReplaceTempView(s"sync_src_$cat")
    spark.sql(
      s"""MERGE INTO $cat.db.users t
          USING sync_src_$cat s
          ON t.user_id = s.user_id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    spark.sql(s"SELECT user_id, event_type, value FROM $cat.db.users ORDER BY user_id")
  }

  /** SQL MERGE with the full ANSI multi-leg cascade: three ordered
    * conditional MATCHED legs (hot-update, DELETE, unconditional tail) and
    * two ordered conditional NOT MATCHED legs with distinct payloads —
    * first-match-wins everywhere. The target is seeded with EVEN user ids'
    * latest state only, the source is per-user stats over ALL users, so
    * every leg population is non-empty at sf0.01 (thresholds picked against
    * the generator's cnt~[49,88], maxv<=~250 envelope). The oracle
    * re-derives the cascade with disjoint CASE branches. */
  def sqlMergeMultiLeg(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gml")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.users")
    spark.sql(
      s"""CREATE TABLE $cat.db.users (user_id BIGINT, event_type STRING, value DOUBLE)
          TBLPROPERTIES ('primary_key'='user_id', 'buckets'='8')""")
    spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(max_by(struct(col("event_type"), col("value")), col("event_id")).as("e"))
      .select(col("user_id"), col("e.event_type").as("event_type"), col("e.value").as("value"))
      .filter(col("user_id") % 2 === 0)
      .writeTo(s"$cat.db.users").append()
    spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(max(col("value")).as("maxv"), count(lit(1)).as("cnt"))
      .createOrReplaceTempView(s"user_stats_$cat")
    spark.sql(
      s"""MERGE INTO $cat.db.users t
          USING user_stats_$cat s
          ON t.user_id = s.user_id
          WHEN MATCHED AND s.maxv >= 220.0 THEN
            UPDATE SET event_type = concat(t.event_type, ':hot'), value = s.maxv
          WHEN MATCHED AND s.cnt >= 70 THEN DELETE
          WHEN MATCHED THEN UPDATE SET value = t.value + 1.0
          WHEN NOT MATCHED AND s.maxv >= 220.0 THEN
            INSERT (user_id, event_type, value) VALUES (s.user_id, 'new-hot', s.maxv)
          WHEN NOT MATCHED AND s.cnt >= 60 THEN
            INSERT (user_id, event_type, value) VALUES (s.user_id, 'new', CAST(s.cnt AS DOUBLE))""")
    spark.sql(s"SELECT user_id, event_type, value FROM $cat.db.users ORDER BY user_id")
  }

  /** SQL time travel over the merged table: `VERSION AS OF 1` = the state
    * after the first MERGE (v0 is the empty create), current = after both. */
  def sqlTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val cat = sqlMergeTable(spark, dir)
    spark.sql(
      s"""SELECT 'v_final' AS label, count(*) AS n FROM $cat.db.repo_files
          UNION ALL
          SELECT 'v_mid' AS label, count(*) AS n FROM $cat.db.repo_files VERSION AS OF 1
          ORDER BY label""")
  }

  /** SQL `TIMESTAMP AS OF`: resolve the post-first-MERGE snapshot by its
    * commit wall-clock and read it alongside the same snapshot pinned by
    * `VERSION AS OF 1` — the two spellings must agree with the relational
    * mid-state the oracle derives. */
  def sqlTimeTravelTs(spark: SparkSession, dir: String): DataFrame = {
    val cat = sqlMergeTable(spark, dir)
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val ts = LakeTable.load(spark, s"$wh/db/repo_files", "repo_files")
      .snapshotAt(1L).committedAt.getOrElse(sys.error("commits must be stamped"))
    // Spark parses the TIMESTAMP AS OF literal in the SESSION time zone, so
    // render the commit millis in that zone (hard-coding UTC would pin a
    // shifted instant in any non-UTC session)
    // ZoneId.of handles every id Spark accepts (region AND offset-style
    // '+08:00') and throws on garbage; TimeZone.getTimeZone(String) would
    // silently fall back to GMT for offset ids.
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(
      java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))))
    spark.sql(
      s"""SELECT 'ts_mid' AS label, count(*) AS n
          FROM $cat.db.repo_files TIMESTAMP AS OF '${fmt.format(new java.util.Date(ts))}'
          UNION ALL
          SELECT 'v_mid' AS label, count(*) AS n FROM $cat.db.repo_files VERSION AS OF 1
          ORDER BY label""")
  }

  /** Replay with mid-stream additive schema evolution: after half the stream,
    * the table gains a `value_cents` column; later events carry it, earlier
    * rows read back as null. Exercises evolveSchema + conform-on-read +
    * mixed-schema-version files in one table. */
  def replayEvolve(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val maxLsn = ev.agg(max("event_id")).collect()(0).getLong(0)
    val half = (maxLsn + 1) / 2
    val changes = asChanges(spark, dir)
      .join(ev.select(col("event_id").as("lsn"), col("value")), Seq("lsn"))
      .withColumn("value_cents",
        when(col("lsn") >= half, round(col("value") * 100).cast("long"))
          .otherwise(lit(null).cast("long")))
      .cache()

    val v2Schema = StructType(tableSchema.fields :+ StructField("value_cents", LongType))
    val root = scratchDir("graft-cdcq-ev").toString
    val table = LakeTable.createIfNotExists(spark, root, "repo_files",
      tableSchema, Seq("repo", "path"), numBuckets = 16)
    val reg1 = SchemaRegistry.single(tableSchema)
    val engine1 = new ReplayEngine(table, reg1)
    // both epoch counts in one aggregate over the cached batch (dense-path
    // hint + metrics count, same rationale as epochCounts)
    val cnts = changes.agg(
      sum(when(col("lsn") < half, 1L).otherwise(0L)), count(lit(1))).head
    val (c0, c1) = (cnts.getLong(0), cnts.getLong(1) - cnts.getLong(0))
    engine1.applyEpoch(changes.filter(col("lsn") < half).drop("value_cents", "value"), 0,
      knownInputCount = Some(c0))
    // additive evolution between epochs (the north rule's mid-stream case)
    table.evolveSchema(v2Schema)
    val engine2 = new ReplayEngine(table, table.snapshot.registry)
    engine2.applyEpoch(changes.filter(col("lsn") >= half).drop("value"), 1,
      knownInputCount = Some(c1))
    changes.unpersist()
    table.read()
      .select(col("repo"), col("path"), col("commit_id"), col("lang"), col("value_cents"))
      .orderBy(col("repo"), col("path"))
  }

  /** Storage-partitioned join (GraftSpj): two single-key graft tables —
    * latest event per user, and per-user totals — joined on their shared
    * primary key through plain SQL. With the scans reporting the lake's
    * bucket layout as KeyGroupedPartitioning, Catalyst plans the join with
    * ZERO hash Exchanges (asserted in-query on the executed plan): at
    * 100 TB this deletes the shuffle of BOTH join inputs, the dominant cost
    * of any key-aligned star join. The oracle re-derives both sides from
    * the raw events and joins them in DuckDB. */
  def spjJoin(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gspj")
    Seq("user_latest", "user_stats").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $cat.db.$t"))
    spark.sql(s"""CREATE TABLE $cat.db.user_latest (user_id BIGINT, event_type STRING)
                  TBLPROPERTIES ('primary_key'='user_id', 'buckets'='8')""")
    spark.sql(s"""CREATE TABLE $cat.db.user_stats (user_id BIGINT, n_events BIGINT, total_value DOUBLE)
                  TBLPROPERTIES ('primary_key'='user_id', 'buckets'='8')""")
    val events = spark.read.parquet(s"$dir/events.parquet")
    events.groupBy("user_id")
      .agg(max_by(col("event_type"), col("event_id")).as("event_type"))
      .writeTo(s"$cat.db.user_latest").append()
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .writeTo(s"$cat.db.user_stats").append()

    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        s"""SELECT l.user_id, l.event_type, s.n_events, s.total_value
            FROM $cat.db.user_latest l JOIN $cat.db.user_stats s ON l.user_id = s.user_id
            ORDER BY l.user_id""")
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("graft keyed scan"),
        s"q46 must take the storage-partitioned scan path:\n$plan")
      require(!plan.contains("Exchange hashpartitioning"),
        s"q46 join must plan shuffle-free under KeyGroupedPartitioning:\n$plan")
      joined.collect() // execute under the pinned confs
      joined
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Manifest-answered aggregates (GraftAgg): the event log appended into a
    * keyed graft table, then `count(*) / count(col) / min / max` through
    * SQL — asserted in-query to plan as a LocalTableScan of ONE driver-built
    * row (zero data files opened, zero tasks). At the 10M-file envelope this
    * is the difference between a full-table scan job and a manifest fold.
    * The oracle recomputes the same aggregates over the raw events. */
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gagg")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.ev_log")
    spark.sql(s"""CREATE TABLE $cat.db.ev_log (event_id BIGINT, user_id BIGINT, event_type STRING)
                  TBLPROPERTIES ('primary_key'='event_id', 'buckets'='8')""")
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeTo(s"$cat.db.ev_log").append()
    val agg = spark.sql(
      s"""SELECT count(*) AS n_rows, count(user_id) AS n_user_vals,
                 min(event_id) AS min_lsn, max(event_id) AS max_lsn,
                 min(user_id) AS min_user, max(user_id) AS max_user
          FROM $cat.db.ev_log""")
    val plan = agg.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan"),
      s"q47 must answer from the manifest (LocalTableScan), not a scan:\n$plan")
    require(!plan.contains("graft keyed scan") && !plan.contains("Scan parquet"),
      s"q47 must not open any data file:\n$plan")
    agg
  }

  /** Runtime (join-time) pruning: the full event log in a keyed graft table,
    * probe-joined against a small broadcast dim of selected event ids. Spark
    * evaluates the dim first and hands the scan `In(event_id, survivors)`
    * (SupportsRuntimeFiltering) — the scan then re-plans to ONLY the buckets
    * whose hash can hold a surviving key, asserted in-query via both the
    * executed plan (`RuntimeFilters: [dynamicpruning...]`) and ScanStats
    * (buckets read < buckets total). At 100 TB this is the selective-join
    * complement of SPJ: the fact side's I/O scales with the DIM's
    * selectivity, not the fact's size. Oracle: the same join recomputed raw. */
  def runtimePrune(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "grtf")
    Seq("ev_fact", "ev_dim").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $cat.db.$t"))
    spark.sql(s"""CREATE TABLE $cat.db.ev_fact (event_id BIGINT, user_id BIGINT, event_type STRING)
                  TBLPROPERTIES ('primary_key'='event_id', 'buckets'='16')""")
    spark.sql(s"""CREATE TABLE $cat.db.ev_dim (event_id BIGINT, tag STRING)
                  TBLPROPERTIES ('primary_key'='event_id', 'buckets'='4')""")
    val events = spark.read.parquet(s"$dir/events.parquet")
    events.select(col("event_id"), col("user_id"), col("event_type"))
      .writeTo(s"$cat.db.ev_fact").append()
    // dim selectivity must be SCALE-INVARIANT (~6 keys at any sf): with a
    // fixed modulus the dim grows with the data and its keys eventually
    // hash into every bucket, making the pruning assertion below vacuous —
    // exactly what happened at sf0.1 with `% 997`. The oracle recomputes
    // the same max-derived modulus (integer division on both sides).
    val maxId = events.agg(max(col("event_id"))).head.getLong(0)
    val mod = math.max(1L, maxId / 6L)
    events.filter(col("event_id") % mod === 0)
      .select(col("event_id"), concat(lit("t"), col("event_id") % 5).as("tag"))
      .writeTo(s"$cat.db.ev_dim").append()
    graft.cdc.skipping.ScanStats.last.set(None)
    // the dim-side LIKE is trivially true but structurally SELECTIVE:
    // Spark's PartitionPruning only injects a DPP subquery when the build
    // side carries a likely-selective predicate beyond the join keys
    val joined = spark.sql(
      s"""SELECT f.event_id, f.user_id, f.event_type, d.tag
          FROM $cat.db.ev_fact f JOIN $cat.db.ev_dim d ON f.event_id = d.event_id
          WHERE d.tag LIKE 't%'
          ORDER BY f.event_id""")
    joined.collect() // execute so the DPP subquery fires and ScanStats lands
    val plan = joined.queryExecution.executedPlan.toString
    require(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"q48 fact scan must carry a runtime filter:\n$plan")
    val st = graft.cdc.skipping.ScanStats.last.get()
    require(st.exists { case (br, bt, _, _) => bt == 16 && br < bt },
      s"q48 runtime filter must prune fact buckets, got $st:\n$plan")
    joined
  }

  /** `t.files` metadata-table inventory (Iceberg analog): the event log in a
    * keyed table, then the live-file listing aggregated per kind through
    * SQL. The manifest row counts must reconcile EXACTLY with the data the
    * files hold — the oracle recomputes the total from raw events. In-query
    * checks pin the shape the oracle can't see: one base file per non-empty
    * bucket, every file carrying skipping stats. */
  def filesInventory(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gfil")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.ev_inv")
    spark.sql(s"""CREATE TABLE $cat.db.ev_inv (event_id BIGINT, user_id BIGINT, event_type STRING)
                  TBLPROPERTIES ('primary_key'='event_id', 'buckets'='8')""")
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeTo(s"$cat.db.ev_inv").append()
    val inv = spark.sql(
      s"""SELECT kind, CAST(sum(rows) AS BIGINT) AS n_rows
          FROM $cat.db.ev_inv.files GROUP BY kind ORDER BY kind""")
    val shape = spark.sql(
      s"""SELECT count(*) AS n_files, count(stats_json) AS n_statted,
                 count(DISTINCT bucket) AS n_buckets
          FROM $cat.db.ev_inv.files""").head
    require(shape.getLong(0) == shape.getLong(2) && shape.getLong(0) <= 8,
      s"q49 expects one base file per non-empty bucket, got $shape")
    require(shape.getLong(1) == shape.getLong(0),
      s"q49 expects skipping stats on every file, got $shape")
    inv
  }

  /** Sort-clustering (`CALL system.cluster`): the event log keyed by
    * event_id is rewritten with each bucket sorted by user_id into bounded
    * files — per-file user_id bounds come out tight and disjoint, so a
    * user_id range predicate skips most files of every bucket (asserted
    * in-query via ScanStats: files read <= half the live files). The range
    * bound derives from max(user_id) so selectivity is scale-invariant;
    * the oracle recomputes the same filter and aggregate over raw events. */
  def clusteredScan(spark: SparkSession, dir: String): DataFrame = {
    val cat = ensureCatalog(spark, dir, "gclu")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.ev_cl")
    spark.sql(s"""CREATE TABLE $cat.db.ev_cl (event_id BIGINT, user_id BIGINT, event_type STRING)
                  TBLPROPERTIES ('primary_key'='event_id', 'buckets'='8')""")
    val events = spark.read.parquet(s"$dir/events.parquet")
    events.select(col("event_id"), col("user_id"), col("event_type"))
      .writeTo(s"$cat.db.ev_cl").append()
    // scale the file cap with the data so every sf yields >= 3-4 sorted
    // files per bucket (a fixed cap degenerates to one file per bucket at
    // small scale factors and the skip assertion below turns vacuous)
    val (rowsTotal, maxUser) = {
      val r = events.agg(count(lit(1)), max(col("user_id"))).head
      (r.getLong(0), r.getLong(1))
    }
    val cap = math.max(50L, rowsTotal / 32L)
    spark.sql(s"CALL $cat.system.cluster(`table` => 'db.ev_cl', sort_by => 'user_id', max_rows_per_file => $cap)")
    val bound = maxUser / 10L
    graft.cdc.skipping.ScanStats.last.set(None)
    val agg = spark.sql(
      s"""SELECT event_type, count(*) AS n, min(user_id) AS min_u, max(user_id) AS max_u
          FROM $cat.db.ev_cl WHERE user_id <= $bound
          GROUP BY event_type ORDER BY event_type""")
    agg.collect() // land ScanStats for the assertion
    val st = graft.cdc.skipping.ScanStats.last.get()
    require(st.exists { case (_, _, fr, ft) => ft >= 16 && fr * 2 <= ft },
      s"q50 clustered range scan must skip at least half the files, got $st")
    agg
  }
}
