package graft.cdc

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** GraftLake — a from-scratch, Iceberg-style snapshot table format.
  *
  * The sandbox has no Delta/Iceberg jars, so the ACID substrate the reference
  * leans on (Delta MERGE / idempotent CREATE, /root/reference/src/models/writer.py:34-67,
  * /root/reference/src/models/table_builder.py:27-44) is reproduced minimally:
  *
  * Layout per table root:
  * {{{
  *   data/<snapshotVersion>-<uuid>/_b=<bucket>/part-*.parquet
  *   meta/v%016d.json     immutable snapshot manifests
  *   meta/_CURRENT        pointer to latest version (atomic rename)
  * }}}
  *
  * Commit protocol: a snapshot JSON is written to a temp name then moved with
  * ATOMIC_MOVE onto `v<N>.json` (fails if a concurrent writer got there first),
  * then `_CURRENT` is advanced. A crash between the data write and the meta
  * commit leaves orphan files that no snapshot references — harmless, GC-able.
  *
  * Exactly-once: each snapshot embeds the `epochId` that produced it; a commit
  * whose epochId is <= the current snapshot's is rejected as a replay
  * (idempotent epoch fence; reference analog is the idempotent `ensure`).
  *
  * Scale design (100 TB envelope): data is hash-bucketed on the merge key
  * (repo, path), so a merge touches only the buckets present in the batch —
  * rewrite amplification is (table size / numBuckets) × touched buckets, and a
  * hot repo is spread across all buckets because the bucket hash includes
  * `path`. Commit cost is O(files in manifest), driver-side only, no data move.
  * Locally numBuckets=32; at 100 TB you'd configure 4096+ so a bucket is a few
  * tens of GB and a 1000-executor cluster rewrites only what the batch touches.
  */
object lake {

  /** Process-wide manifest-read counter (sum over every table handle):
    * pins the "refs-only planning never sweeps" claims in tests, where the
    * SQL catalog's internal LakeTable handles are unreachable. Tests run
    * sequentially in the forked JVM, so delta-measurement is race-free. */
  val manifestReadsGlobal = new java.util.concurrent.atomic.AtomicLong(0L)

  final case class DataFile(
      path: String, // relative to table root
      bucket: Int,
      rows: Long,
      bytes: Long,
      schemaVersion: Int,
      lsnMin: Long,
      lsnMax: Long,
      kind: String = "base", // "base" (payload rows) | "delta" (lsn+op+payload change rows)
      /** Base files written by a merge/compaction carry a per-ROW `_lsn`
        * system column (the winning event's LSN): base rows then re-enter
        * later merges at their TRUE position in the log instead of the
        * always-lose sentinel -1, which makes CoW merges and MoR reads
        * order-correct even when a later epoch redelivers stale LSNs.
        * false (json4s default) for pre-field manifests and for
        * append/overwrite files, whose rows read back at -1. */
      rowLsn: Boolean = false,
      /** Per-column min/max/nullCount harvested from the parquet footer at
        * commit time ([[skipping.fromFooter]]) — the file-level data-skipping
        * index. None on pre-field manifests (json4s default): such files are
        * simply never skipped. */
      stats: Option[Map[String, skipping.ColStats]] = None)

  /** Pointer to one bucket's immutable manifest file (chunked-manifest mode,
    * Iceberg's manifest-list idea minimized): `path` is root-relative, the
    * counts let planners prune without reading the manifest; `rows`/`bytes`
    * sums feed table-level statistics without reading it either (0 on
    * refs written before the fields existed = stats unknown, never a lie). */
  final case class ManifestRef(path: String, bucket: Int, numFiles: Int, deltaFiles: Int,
      rows: Long = 0L, bytes: Long = 0L,
      /** Min/max [[DataFile.schemaVersion]] across the manifest's files —
        * lets planners prove "every file is on the current schema" from the
        * refs ALONE (SPJ/aggregate eligibility), without opening any
        * manifest. 0 = written before the fields existed = unknown, which
        * forces the sweep, never a wrong answer. */
      schemaVersionLo: Int = 0, schemaVersionHi: Int = 0)

  /** On-disk payload of one per-bucket manifest file. */
  final case class ManifestData(files: Seq[DataFile])

  final case class Snapshot(
      formatVersion: Int,
      table: String,
      version: Long,
      schemaVersion: Int,
      schemas: Map[String, String], // schemaVersion (as string key for JSON) -> StructType.json
      keyColumns: Seq[String],
      numBuckets: Int,
      epochId: Long,
      /** Highest LSN ever applied. INVARIANT: every stored row `_lsn` in the
        * table's base/delta files is <= this value (each commit folds its
        * files' lsnMax into it) — the ad-hoc SQL MERGE/DELETE/UPDATE
        * commands rely on it when stamping their batches at lsnHigh + 1. */
      lsnHigh: Long,
      properties: Map[String, String],
      files: Seq[DataFile],
      /** Highest lsnMax among delta files ever folded away (CoW merge /
        * compaction). Lets changesSince prove completeness in O(1): a delta
        * committed after snapshot v carries lsn > v.lsnHigh (binlog ordering
        * contract), so post-v changes were lost iff foldedLsnHigh > v.lsnHigh. */
      foldedLsnHigh: Option[Long] = None,
      /** Commit wall-clock (epoch millis), stamped by [[LakeTable.commit]] —
        * resolves `TIMESTAMP AS OF` time travel and age-based vacuum
        * retention. None on manifests written before the field existed
        * (json4s fills defaults, so old manifests stay readable); such
        * snapshots are treated as arbitrarily old. */
      committedAt: Option[Long] = None,
      /** Chunked-manifest mode (auto above 64 buckets): the file list lives
        * in per-bucket manifest files referenced here instead of inline in
        * `files`. A commit rewrites ONLY the touched buckets' manifests and
        * carries the rest by reference — commit cost is O(touched buckets'
        * files), not O(all files), which is what keeps the driver out of the
        * way at the 100 TB envelope (4096+ buckets, millions of files).
        * Resolve with LakeTable.filesOf / filesOfBuckets, never `files`
        * alone. */
      manifests: Seq[ManifestRef] = Nil) {
    /** Any MoR delta files outstanding — O(refs), no manifest reads. */
    def anyDeltas: Boolean =
      files.exists(_.kind == "delta") || manifests.exists(_.deltaFiles > 0)
    /** Total live rows from inline entries + ref sums, or None when a
      * pre-sum ref (0 with files present) makes the total unknowable
      * without resolving manifests. O(refs). */
    def knownRows: Option[Long] =
      if (manifests.forall(m => m.numFiles == 0 || m.rows > 0))
        Some(files.map(_.rows).sum + manifests.map(_.rows).sum)
      else None

    // memoized per Snapshot instance: planning consults schemaOf per FILE
    // (old-schema stats projection), and re-parsing the schema JSON per
    // file would dominate driver-side planning right after an ALTER
    // (non-constructor field: invisible to json4s, reset by copy())
    @transient private lazy val schemaMemo =
      new java.util.concurrent.ConcurrentHashMap[Int, StructType]()
    def schema: StructType = schemaOf(schemaVersion)
    def schemaOf(v: Int): StructType = schemaMemo.computeIfAbsent(v,
      k => DataType.fromJson(schemas(k.toString)).asInstanceOf[StructType])
    def registry: SchemaRegistry =
      SchemaRegistry(schemas.keysIterator.map(k => k.toInt -> schemaOf(k.toInt)).toMap)
  }

  /** Per-bucket lineage emitted by every committing operation (FIXTURES.md B4). */
  final case class LineageEntry(
      table: String,
      snapshot_version: Long,
      epoch: Long,
      partition: Int,
      lsn_min: Long,
      lsn_max: Long,
      rows_upserted: Long,
      rows_deleted: Long,
      files_added: Int,
      files_removed: Int,
      committed_at: java.sql.Timestamp)

  final case class CommitResult(
      committed: Boolean,
      snapshot: Snapshot,
      lineage: Seq[LineageEntry])

  /** Optimistic-concurrency failure: another writer committed this version. */
  final class CommitConflictException(table: String, version: Long, cause: Throwable)
    extends RuntimeException(
      s"concurrent commit: snapshot v$version of '$table' already exists (optimistic concurrency — reload and retry)",
      cause)

  private implicit val jsonFormats: Formats = Serialization.formats(NoTypeHints)

  /** Highest snapshot format this reader understands: 1 = inline file list,
    * 2 = adds chunked per-bucket manifests (`Snapshot.manifests`). A reader
    * that ignored `manifests` would silently see a partial table, so
    * [[LakeTable.snapshotAt]] refuses any snapshot above this version —
    * the same reader/format-version gate Iceberg and Delta apply. */
  val SupportedFormatVersion = 2

  /** Observability for the distributed vacuum sweep: the size of the
    * LARGEST per-task referenced-path subset shipped by the last sweep —
    * proves the sweep ships per-snapshot-dir slices, never the full
    * referenced set, to any one task. -1 until a distributed sweep runs. */
  object Vacuum {
    val lastMaxTaskRefs = new java.util.concurrent.atomic.AtomicInteger(-1)
  }

  /** Phase timing, enabled with -Dgraft.debug.timing=1 (dev/bench only). */
  private[cdc] def timed[T](label: String)(f: => T): T =
    if (System.getProperty("graft.debug.timing", "0") == "1") {
      val t0 = System.nanoTime()
      val r = f
      println(f"[timing] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    } else f

  object LakeTable {
    /** Idempotent create (reference: src/delta_engine/execute/ddl.py:47-63). */
    def createIfNotExists(
        spark: SparkSession,
        root: String,
        name: String,
        schema: StructType,
        keyColumns: Seq[String],
        numBuckets: Int = 32,
        properties: Map[String, String] = Map.empty): LakeTable = {
      require(!schema.fieldNames.exists(_.equalsIgnoreCase("_lsn")),
        s"table '$name': _lsn is a reserved system column name (per-row log position)")
      val t = new LakeTable(spark, root, name)
      if (t.currentVersionOpt.isEmpty) {
        val snap0 = Snapshot(1, name, 0L, 1,
          Map("1" -> schema.json), keyColumns, numBuckets, -1L, -1L, properties, Nil)
        t.commit(snap0)
      }
      t
    }

    def load(spark: SparkSession, root: String, name: String): LakeTable = {
      val t = new LakeTable(spark, root, name)
      require(t.currentVersionOpt.nonEmpty, s"lake table not found at $root")
      // fail FAST on a pre-reservation table whose payload has an _lsn
      // column: the read path would otherwise silently drop the user's
      // column (it collides with the per-row system column)
      require(!t.snapshot.schema.fieldNames.exists(_.equalsIgnoreCase("_lsn")),
        s"table '$name' has a payload column named _lsn, which this version reserves " +
          "as the per-row system column — rename the column before upgrading")
      t
    }

    def exists(root: String): Boolean =
      Files.exists(Paths.get(root, "meta", "_CURRENT"))
  }

  final class LakeTable(val spark: SparkSession, val root: String, val name: String) {
    private val metaDir: Path = Paths.get(root, "meta")
    private val dataDir: Path = Paths.get(root, "data")

    // ---- snapshot / manifest IO -------------------------------------------

    private def snapPath(v: Long): Path = metaDir.resolve(f"v$v%016d.json")

    def currentVersionOpt: Option[Long] = {
      val cur = metaDir.resolve("_CURRENT")
      if (Files.exists(cur)) Some(Files.readString(cur).trim.toLong)
      else if (Files.isDirectory(metaDir)) {
        // fallback: recover from manifest listing (pointer write crashed)
        val s = Files.list(metaDir)
        val vs =
          try s.toArray.map(_.toString).flatMap { p =>
            val n = Paths.get(p).getFileName.toString
            if (n.startsWith("v") && n.endsWith(".json")) Some(n.stripPrefix("v").stripSuffix(".json").toLong)
            else None
          } finally s.close()
        if (vs.isEmpty) None else Some(vs.max)
      } else None
    }

    def snapshot: Snapshot = snapshotAt(currentVersionOpt.getOrElse(
      throw new IllegalStateException(s"table $name at $root has no snapshot")))

    def snapshotAt(v: Long): Snapshot = {
      val s = Serialization.read[Snapshot](Files.readString(snapPath(v)))
      require(s.formatVersion <= SupportedFormatVersion,
        s"snapshot v$v of '$name' has formatVersion ${s.formatVersion}, but this reader " +
          s"supports <= $SupportedFormatVersion — refusing to read a partial view; " +
          "upgrade the graft library")
      s
    }

    /** Atomic snapshot commit with epoch fence. Returns false iff fenced.
      * Metadata-only commits (schema evolution) pass `fence = false`: they
      * carry the current epochId forward rather than advancing it. */
    def commit(next: Snapshot, fence: Boolean = true): Boolean = synchronized {
      Files.createDirectories(metaDir)
      var prevCommittedAt = 0L
      currentVersionOpt.foreach { cv =>
        val cur = snapshotAt(cv)
        prevCommittedAt = cur.committedAt.getOrElse(0L)
        if (fence && next.epochId >= 0 && next.epochId <= cur.epochId) return false // replayed epoch: no-op
        // a version at or below the current one means another writer
        // committed since this snapshot was read — that's the optimistic-
        // concurrency loss, typed so retry-safe callers (append) can act
        if (next.version <= cur.version)
          throw new CommitConflictException(name, next.version, null)
        require(next.version == cur.version + 1,
          s"non-monotonic commit: have v${cur.version}, got v${next.version}")
      }
      val tmp = metaDir.resolve(s".tmp-${UUID.randomUUID()}.json")
      // stamp the commit wall-clock and normalize the format version: chunked
      // manifests are a format-2 feature, and bumping ONLY when they appear
      // keeps pure-inline tables readable by format-1 readers forever.
      // The stamp is MONOTONICIZED against the previous snapshot's (Delta's
      // in-commit-timestamp approach): a wall-clock regression or a second
      // writer host with clock skew can otherwise stamp v+1 before v, which
      // would make TIMESTAMP AS OF resolve the wrong snapshot (versionAt
      // scans newest-first assuming monotone stamps) — and the strict +1
      // also guarantees consecutive same-millisecond commits stay
      // distinguishable by timestamp.
      val stamped = next.copy(
        committedAt = Some(math.max(System.currentTimeMillis(), prevCommittedAt + 1)),
        formatVersion = if (next.manifests.nonEmpty) 2 else next.formatVersion)
      Files.writeString(tmp, Serialization.write(stamped))
      // Claim the manifest name with fail-if-exists semantics: a hard link is
      // atomic AND refuses an existing target on POSIX, unlike ATOMIC_MOVE
      // (which silently replaces). Losing one of two concurrent writers is the
      // whole point of optimistic concurrency — the loser gets a conflict.
      // Filesystems without hard links (some FUSE/NFS/SMB mounts) fall back
      // to an O_EXCL CREATE_NEW write — same fail-if-exists claim, with a
      // (tiny, documented) torn-manifest window on crash mid-copy that the
      // _CURRENT pointer shields readers from.
      try Files.createLink(snapPath(next.version), tmp)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          throw new CommitConflictException(name, next.version, e)
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          try Files.write(snapPath(next.version), Files.readAllBytes(tmp),
            java.nio.file.StandardOpenOption.CREATE_NEW, java.nio.file.StandardOpenOption.WRITE)
          catch {
            case e2: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp)
              throw new CommitConflictException(name, next.version, e2)
          }
        case NonFatal(e) => Files.deleteIfExists(tmp); throw e
      } finally Files.deleteIfExists(tmp)
      val ptrTmp = metaDir.resolve(s".ptr-${UUID.randomUUID()}")
      Files.writeString(ptrTmp, next.version.toString)
      Files.move(ptrTmp, metaDir.resolve("_CURRENT"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      true
    }

    // ---- chunked manifests --------------------------------------------------

    /** Chunked-manifest mode: automatic above 64 buckets (the envelope where
      * an inline O(all files) list stops being a sane driver-side payload),
      * or forced via table property `graft.manifest.chunk = always`. The
      * predicate is a pure function of creation-time state, so a table is
      * chunked or inline for life. */
    private def chunkedManifests(snap: Snapshot): Boolean =
      snap.numBuckets > 64 || snap.properties.get("graft.manifest.chunk").contains("always")

    /** Immutable once written (uuid names), so cached for the handle's life. */
    private val manifestCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFile]]()
    /** Cache-miss counter — observability for the O(touched) commit claim. */
    val manifestReads = new java.util.concurrent.atomic.AtomicLong(0L)

    private def readManifest(ref: ManifestRef): Seq[DataFile] =
      manifestCache.computeIfAbsent(ref.path, p => {
        manifestReads.incrementAndGet()
        lake.manifestReadsGlobal.incrementAndGet() // cross-handle observability
        Serialization.read[ManifestData](Files.readString(Paths.get(root, p))).files
      })

    private def writeManifest(bucket: Int, files: Seq[DataFile]): ManifestRef = {
      val mDir = metaDir.resolve("m")
      Files.createDirectories(mDir)
      val rel = s"meta/m/${UUID.randomUUID().toString.take(12)}-b$bucket.json"
      Files.writeString(Paths.get(root, rel), Serialization.write(ManifestData(files)))
      manifestCache.put(rel, files)
      ManifestRef(rel, bucket, files.size, files.count(_.kind == "delta"),
        files.map(_.rows).sum, files.map(_.bytes).sum,
        schemaVersionLo = if (files.isEmpty) 0 else files.map(_.schemaVersion).min,
        schemaVersionHi = if (files.isEmpty) 0 else files.map(_.schemaVersion).max)
    }

    /** All data files of a snapshot (inline + manifest-resolved). In chunked
      * mode this reads every manifest — use [[filesOfBuckets]] with a bucket
      * set whenever the caller knows one (merge, pruned reads). */
    def filesOf(snap: Snapshot): Seq[DataFile] =
      if (snap.manifests.isEmpty) snap.files
      else snap.files ++ snap.manifests.flatMap(readManifest)

    /** Bucket-pruned file resolution: reads ONLY the requested buckets'
      * manifests (`deltaOnly` additionally skips manifests whose ref reports
      * zero delta files — changesSince / compactDeltas pruning). */
    def filesOfBuckets(snap: Snapshot, buckets: Option[Set[Int]],
        deltaOnly: Boolean = false): Seq[DataFile] = {
      def want(b: Int) = buckets.forall(_.contains(b))
      val inline = snap.files.filter(f => want(f.bucket) && (!deltaOnly || f.kind == "delta"))
      val fromManifests = snap.manifests
        .filter(m => want(m.bucket) && (!deltaOnly || m.deltaFiles > 0))
        .flatMap(readManifest)
        .filter(f => !deltaOnly || f.kind == "delta")
      inline ++ fromManifests
    }

    /** Buckets that currently hold MoR delta files — O(manifest refs) in
      * chunked mode (no manifest reads: the refs carry delta counts). */
    private def bucketsWithDeltas(snap: Snapshot): Set[Int] =
      snap.files.filter(_.kind == "delta").map(_.bucket).toSet ++
        snap.manifests.filter(_.deltaFiles > 0).map(_.bucket)

    /** Per-bucket file counts without reading any manifest (refs carry them). */
    private def fileCountsByBucket(snap: Snapshot): Map[Int, Int] = {
      val pairs = snap.files.groupBy(_.bucket).view.mapValues(_.size).toSeq ++
        snap.manifests.map(m => m.bucket -> m.numFiles)
      pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }

    /** Per-bucket ROW sums, likewise O(refs) in chunked mode (ManifestRef
      * carries the sum; pre-field refs report 0 = unknown, never a lie). */
    private def rowsByBucket(snap: Snapshot): Map[Int, Long] = {
      val pairs = snap.files.groupBy(_.bucket).view.mapValues(_.map(_.rows).sum).toSeq ++
        snap.manifests.map(m => m.bucket -> m.rows)
      pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }

    /** Per-bucket DELTA-file counts, likewise O(refs) in chunked mode. */
    private def deltaCountsByBucket(snap: Snapshot): Map[Int, Int] = {
      val pairs = snap.files.filter(_.kind == "delta")
        .groupBy(_.bucket).view.mapValues(_.size).toSeq ++
        snap.manifests.filter(_.deltaFiles > 0).map(m => m.bucket -> m.deltaFiles)
      pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }

    /** Next snapshot's file state after dropping ALL files of
      * `removedBuckets` and adding `added`: inline list math in inline mode;
      * in chunked mode, new manifest files are written ONLY for affected
      * buckets (removed ∪ added) and every other bucket's manifest is
      * carried by reference — O(touched), never O(table). */
    private def nextFileState(cur: Snapshot, removedBuckets: Set[Int],
        added: Seq[DataFile]): (Seq[DataFile], Seq[ManifestRef]) =
      if (!chunkedManifests(cur)) {
        // filesOf (not cur.files): if the chunk property was ever flipped
        // off on a chunked table, the manifests migrate back inline instead
        // of being silently dropped (pure-inline tables pay nothing — the
        // manifest list is empty)
        (filesOf(cur).filterNot(f => removedBuckets(f.bucket)) ++ added, Nil)
      } else {
        val addedByBucket = added.groupBy(_.bucket)
        val affected = removedBuckets ++ addedByBucket.keySet
        val keptByBucket = filesOfBuckets(cur, Some(affected -- removedBuckets)).groupBy(_.bucket)
        val newRefs = affected.toSeq.sorted.flatMap { b =>
          val list = keptByBucket.getOrElse(b, Nil) ++ addedByBucket.getOrElse(b, Nil)
          if (list.isEmpty) None else Some(writeManifest(b, list))
        }
        // inline files of UNaffected buckets stay inline (covers a table
        // flipped to chunked mid-life — nothing is dropped either way)
        val inlineCarried = cur.files.filterNot(f => affected(f.bucket))
        // superseded manifests leave the cache: a long-lived writer handle
        // must not accumulate every file list it ever wrote
        cur.manifests.filter(m => affected(m.bucket)).foreach(m => manifestCache.remove(m.path))
        (inlineCarried, cur.manifests.filterNot(m => affected(m.bucket)) ++ newRefs)
      }

    /** Per-source Hadoop options for every data-file read/write of this
      * table: the `file:` scheme resolves to RawLocalFileSystem instead of
      * the default ChecksumFileSystem wrapper. Hadoop's client-side `.crc`
      * sidecars DOUBLE the small-file operations of every commit (one
      * sidecar written, chmod'd and renamed per data file — and with no
      * native Hadoop lib in this environment each permission call forks a
      * `chmod` shell) and add one extra open+read per scanned file. Parquet
      * already CRC-checks its own pages (PageHeader crc, enabled by
      * default), so the sidecar is a redundant integrity layer on the data
      * path. Scoped per-read/per-write via options — the session's global
      * FileSystem (used by checkpoints, external inputs) is untouched, and
      * on cluster deployments where table roots live on object stores the
      * `fs.file.impl` key is simply inert. */
    private val rawLocalFsOptions = Map(
      "fs.file.impl" -> "org.apache.hadoop.fs.RawLocalFileSystem",
      "fs.file.impl.disable.cache" -> "true")

    /** Run one engine ACTION (merge/compact/delta job) with a scan-split
      * floor of the cluster's parallelism: a merge's map side reads the
      * touched buckets' base files, and the default split packing
      * (`maxPartitionBytes` + `openCostInBytes`) happily folds MANY bucket
      * files into ONE task when they are small — serializing per-file reader
      * setup on a single core while the rest idle. `minPartitionNum` is
      * Spark's own floor for exactly this; deriving it from
      * `defaultParallelism` keeps it scale-adaptive (at production file
      * sizes the floor is already met and the conf is inert). Session-conf
      * scoped to the action and restored — engine actions are
      * single-threaded per table (commit is synchronized). */
    private def withScanParallelism[T](numBuckets: Int)(f: => T): T = {
      // AQE is also disabled for the engine's own jobs: the merge/compact
      // plan shape is statically known (ONE hash shuffle on the key columns,
      // reduce side = the bucketed write) — adaptive re-planning only adds a
      // per-shuffle materialization round and its coalescing would fold the
      // bucket-aligned reduce partitions (the CDC bench harness pins the
      // same thing for the same reason). The shuffle width is likewise
      // pinned to the BUCKET COUNT — the engine's reduce side writes one
      // bucket-aligned group per partition, so bucket count IS the job's
      // natural width (the harness pins its replay sessions identically,
      // and at production bucket counts the pin RAISES width to the
      // layout's parallelism rather than lowering it). All confs restored
      // after the job.
      val confs =
        (if (System.getProperty("graft.engine.minPartitionNum", "1") == "1")
          Seq("spark.sql.files.minPartitionNum" ->
            spark.sparkContext.defaultParallelism.toString)
        else Nil) ++
        (if (System.getProperty("graft.engine.noAqe", "1") == "1")
          Seq("spark.sql.adaptive.enabled" -> "false")
        else Nil) ++
        (if (System.getProperty("graft.engine.bucketShuffle", "1") == "1")
          Seq("spark.sql.shuffle.partitions" -> math.max(1, numBuckets).toString)
        else Nil)
      if (confs.isEmpty) return f
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // ---- read path ---------------------------------------------------------

    /** Bucket assignment: hash of the full merge key, so a hot repo spreads
      * across every bucket (skew) while each key still lives in exactly one.
      *
      * Deliberately `pmod(hash(keys), NB)` — Spark's own Murmur3 shuffle hash —
      * so that after a join/aggregate that shuffled on the key columns, every
      * bucket lands wholly inside one task whenever NB and the shuffle
      * partition count divide each other. The merge write then needs NO extra
      * repartition: one shuffle saved per epoch, ~NB output files. */
    def bucketExpr(snap: Snapshot): org.apache.spark.sql.Column =
      if (snap.keyColumns.isEmpty)
        // keyless table (append/scan-only — e.g. CTAS without a primary_key
        // property): no key to co-locate by, so buckets are a pure
        // write-parallelism spread that preserves the incoming partitioning
        pmod(spark_partition_id(), lit(snap.numBuckets)).cast(IntegerType)
      else pmod(hash(snap.keyColumns.map(col): _*), lit(snap.numBuckets)).cast(IntegerType)

    /** Expose the current table state to Spark SQL as a temp view
      * (`spark.sql("SELECT ... FROM <viewName>")`). Re-call after commits to
      * see a newer snapshot (views bind a snapshot — MVCC reads for free). */
    def createView(viewName: String): Unit = read().createOrReplaceTempView(viewName)

    /** Read the current table state. Files written under older schema versions
      * are read with their own physical schema then conformed (cast / null-fill)
      * to the current one — robust type widening without relying on the parquet
      * reader's widening support. */
    def read(): DataFrame = readBuckets(snapshot, None)

    /** Current state of the selected buckets. If MoR delta files exist for
      * them, they are applied at read time with the same fused max-LSN
      * aggregation the CoW merge uses. */
    def readBuckets(snap: Snapshot, buckets: Option[Set[Int]]): DataFrame =
      readBucketsWithLsn(snap, buckets).drop("_lsn")

    /** [[readBuckets]] plus the per-row `_lsn` system column — the internal
      * read the merge/compaction paths use so rewritten base files keep each
      * row's true log position (rows from lsn-less files surface -1). */
    private def readBucketsWithLsn(snap: Snapshot, buckets: Option[Set[Int]]): DataFrame =
      readFilesWithLsn(snap, filesOfBuckets(snap, buckets))

    /** Predicate-planned read: the scan's file list is pruned BEFORE any
      * parquet is opened, on two levels —
      *
      *  1. '''Bucket pruning''': a conjunction that pins every key column to
      *     literals (point lookup / IN list) resolves, driver-side, to the
      *     exact buckets those key tuples hash to — a SQL
      *     `WHERE repo = 'r' AND path = 'p'` against a 4096-bucket 100 TB
      *     table plans one bucket's manifest and files, never the world.
      *  2. '''File skipping''': within the planned buckets, base files whose
      *     manifest column bounds refute the predicate are dropped. Only
      *     delta-FREE buckets skip: a MoR delta row can carry a key's new
      *     value outside its base file's bounds, and per-key resolution
      *     crosses files — with no deltas, base rows ARE table rows, so
      *     dropping a refuted file is exactly row-level filtering. (Bucket
      *     pruning needs no such guard — a key's entire history lives in its
      *     one bucket.)
      *
      * Every predicate is re-applied row-level above this scan (the V1
      * relation keeps `unhandledFilters` = all), so both levels are pure
      * I/O elision. */
    def readWhere(snap: Snapshot, filters: Seq[org.apache.spark.sql.sources.Filter]): DataFrame = {
      if (filters.isEmpty) return readBuckets(snap, None)
      val buckets = skipping.bucketsForKeys(filters, snap.keyColumns, snap.schema, snap.numBuckets)
      val wanted = filesOfBuckets(snap, buckets)
      val deltaBuckets = wanted.filter(_.kind == "delta").map(_.bucket).toSet
      val kept = wanted.filter { f =>
        f.kind == "delta" || deltaBuckets(f.bucket) || f.stats.forall { s0 =>
          // an old-schema file's bounds may be encoded under the OLD type
          // (DATE days vs TIMESTAMP micros after a widening) — project the
          // stats to what stays valid before comparing
          val s = if (f.schemaVersion == snap.schemaVersion) s0
            else skipping.compatibleStats(s0, snap.schemaOf(f.schemaVersion), snap.schema)
          filters.forall(flt => skipping.mayMatch(s, f.rows, snap.schema, flt))
        }
      }
      skipping.ScanStats.last.set(Some((
        buckets.map(_.size).getOrElse(snap.numBuckets), snap.numBuckets,
        kept.size, snap.files.size + snap.manifests.map(_.numFiles).sum)))
      readFilesWithLsn(snap, kept).drop("_lsn")
    }

    private def readFilesWithLsn(snap: Snapshot, wanted: Seq[DataFile]): DataFrame = {
      val base = readBase(snap, wanted.filter(_.kind == "base"))
      val deltaFiles = wanted.filter(_.kind == "delta")
      if (deltaFiles.isEmpty) base
      else mergeExpr(base.select(
          (Seq(col("_lsn").as("lsn"), lit(null).cast(StringType).as("op")) ++
            snap.schema.fieldNames.map(col)): _*)
          .unionByName(readDeltas(snap, deltaFiles)), snap)
    }

    /** The read-side half of schema conformance, shared by the base and
      * delta readers: cast columns the file carries, null-fill columns
      * added since its schema version (the projection mirror of
      * SchemaRegistry.conform's additive-evolution rules). */
    private def conformedPayload(snap: Snapshot, fileSchema: StructType): Seq[org.apache.spark.sql.Column] = {
      val have = fileSchema.fieldNames.toSet
      snap.schema.fields.toSeq.map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
    }

    /** Read base files, conforming each (schemaVersion, rowLsn) group to the
      * current schema; output = `_lsn` system column (stored per row for
      * merge-written files, -1 for append/overwrite/pre-field files) followed
      * by the payload. */
    private def readBase(snap: Snapshot, files: Seq[DataFile]): DataFrame = {
      val lsnField = StructField("_lsn", LongType, nullable = false)
      if (files.isEmpty) {
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(lsnField +: snap.schema.fields))
      } else {
        files.groupBy(f => (f.schemaVersion, f.rowLsn)).map { case ((sv, hasLsn), group) =>
          val paths = group.map(f => Paths.get(root, f.path).toString)
          val fileSchema = snap.schemaOf(sv)
          val physical = if (hasLsn) StructType(lsnField +: fileSchema.fields) else fileSchema
          val df = spark.read.options(rawLocalFsOptions).schema(physical).parquet(paths: _*)
          val lsnCol = if (hasLsn) col("_lsn") else lit(-1L).as("_lsn")
          df.select((lsnCol +: conformedPayload(snap, fileSchema)).toSeq: _*)
        }.reduce(_ unionByName _)
      }
    }

    /** Read delta files: (lsn, op) change metadata ahead of the payload,
      * payload conformed per schema-version group. */
    private def readDeltas(snap: Snapshot, files: Seq[DataFile]): DataFrame = {
      val metaFields = Seq(StructField("lsn", LongType, nullable = false),
        StructField("op", StringType, nullable = true))
      if (files.isEmpty) {
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(metaFields ++ snap.schema.fields))
      } else {
        files.groupBy(_.schemaVersion).map { case (sv, group) =>
          val paths = group.map(f => Paths.get(root, f.path).toString)
          val fileSchema = snap.schemaOf(sv)
          val physical = StructType(metaFields ++ fileSchema.fields)
          val df = spark.read.options(rawLocalFsOptions).schema(physical).parquet(paths: _*)
          df.select((Seq(col("lsn"), col("op")) ++ conformedPayload(snap, fileSchema)).toSeq: _*)
        }.reduce(_ unionByName _)
      }
    }

    /** The fused max-LSN resolution: input rows carry (lsn, op, payload...);
      * per key the highest-LSN row wins, a winning delete drops the key.
      * Used by both the CoW merge and the MoR read path. Output keeps the
      * winner's LSN as `_lsn` so merge writes can persist it per row.
      *
      * Because base rows enter at their STORED row LSN (not -1), a stale
      * redelivered event in a later epoch loses to the state it would have
      * regressed — order-correct without relying on upstream dedup. The one
      * boundary: a key already DELETED has no base row to outrank a stale
      * pre-delete redelivery, so anti-resurrection of deleted keys still
      * needs the cross-epoch dedup watermark (streaming.statefulDedup) or an
      * in-order tail. */
    private def mergeExpr(all: DataFrame, snap: Snapshot): DataFrame = {
      val keys = snap.keyColumns
      val nonKey = snap.schema.fieldNames.toSeq.filterNot(keys.contains)
      all.groupBy(keys.map(col): _*)
        .agg(graft.functions.MaxByRow.maxByRow(
          struct((Seq(col("lsn"), col("op")) ++ nonKey.map(col)): _*), col("lsn")).as("_e"))
        .filter(!(col("_e.op") <=> lit("D")))
        .select((keys.map(col) ++ nonKey.map(c => col(s"_e.$c").as(c)) :+
          col("_e.lsn").as("_lsn")): _*)
    }

    // ---- write path --------------------------------------------------------

    /** Write `df` bucket-partitioned under a fresh snapshot data dir; returns
      * the new DataFiles. Parquet row counts come from file footers (no second
      * scan of the data). */
    private def writeBucketed(df: DataFrame, snap: Snapshot, newVersion: Long,
        repartitionByBucket: Boolean = true, kind: String = "base",
        withRowLsn: Boolean = false, sortCols: Seq[String] = Nil,
        maxRowsPerFile: Option[Long] = None): Seq[DataFile] = {
      val outDir = dataDir.resolve(s"$newVersion-${UUID.randomUUID().toString.take(8)}")
      val metaCols =
        if (kind == "delta") Seq(col("lsn"), col("op"))
        else if (withRowLsn) Seq(col("_lsn")) // per-row system column (DataFile.rowLsn)
        else Nil
      val cols = metaCols ++ snap.schema.fieldNames.map(col)
      val bucketed = df.withColumn("_b", bucketExpr(snap))
        .select((cols :+ col("_b")).toSeq: _*)
      // merge output is already hash-partitioned on the key columns, which
      // determines the bucket — skip the extra shuffle in that case.
      // When we DO repartition, pin the partition count to numBuckets: there
      // are only numBuckets distinct _b values, so session-default shuffle
      // partitions beyond that are guaranteed-empty tasks (pure scheduling
      // overhead on small appends; at scale the bucket count IS the write's
      // natural parallelism ceiling either way).
      val laidOut0 =
        if (repartitionByBucket) bucketed.repartition(snap.numBuckets, col("_b")) else bucketed
      // cluster-on-write: explicit args (the cluster() op) win; otherwise
      // BASE writes honor the table's `graft.cluster.by` policy so the
      // layout persists across merges/compactions instead of decaying.
      // Delta writes never sort — they are change logs, ordered by nature.
      // An explicit maxRowsPerFile is honored regardless of sortCols (the
      // policy only FILLS what the caller left unset).
      val (polSort, polCap) =
        if (sortCols.isEmpty && kind != "delta") clusterPolicy(snap) else (Nil, None)
      val effSort = if (sortCols.nonEmpty) sortCols else polSort
      val effCap = maxRowsPerFile.orElse(polCap)
      // clustering (see [[cluster]]): rows arrive at the dynamic-partition
      // writer sorted by (_b, sortCols), so each maxRecordsPerFile split is
      // a contiguous SORTED run — per-file bounds come out tight and
      // pairwise disjoint when a bucket lives in one task partition
      // (repartitionByBucket / cluster / compact / rebucket); merge-path
      // writes (already key-partitioned, no re-shuffle) may split a bucket
      // across tasks, where per-file bounds stay tight but can overlap
      // between tasks' files — skipping is may-match, so still sound
      val laidOut =
        if (effSort.isEmpty) laidOut0
        else laidOut0.sortWithinPartitions((col("_b") +: effSort.map(col)).toSeq: _*)
      val writer = effCap.foldLeft(laidOut.write.options(rawLocalFsOptions))(
        (w, n) => w.option("maxRecordsPerFile", n.toString))
      timed("write:parquet")(withScanParallelism(snap.numBuckets)(
        writer.partitionBy("_b").parquet(outDir.toString)))
      val paths = timed("write:list")(listParquet(outDir))
      // footer reads are driver-side; parallelize so commit latency stays
      // O(files / threads), not O(files)
      import scala.jdk.CollectionConverters._
      paths.asJava.parallelStream().map[DataFile] { p =>
        val rel = Paths.get(root).relativize(p).toString
        val bucket = p.getParent.getFileName.toString.stripPrefix("_b=").toInt
        // ONE footer read per file yields the row count AND the per-column
        // skipping bounds — the commit pays no extra I/O for the stats index
        val (rows, stats) = parquetFooterInfo(p)
        // lsn ranges are stamped post-hoc by callers (they know the batch stats)
        DataFile(rel, bucket, rows, Files.size(p), snap.schemaVersion,
          -1L, -1L, kind, rowLsn = kind == "base" && withRowLsn, stats = stats)
      }.collect(java.util.stream.Collectors.toList[DataFile]).asScala.toSeq
    }

    /** Cluster-on-write policy from table properties: `graft.cluster.by =
      * c1,c2` (+ optional `graft.cluster.maxRowsPerFile`, default 1M) makes
      * every base rewrite keep each bucket sorted by the given columns in
      * bounded files — set it once (e.g. after `CALL system.cluster`) and
      * the clustering persists instead of decaying on the next merge.
      * Policy rules, not commit rules: unknown and UNORDERABLE columns
      * (map types) are dropped silently (case-insensitive resolution) and
      * a malformed cap falls back to the default — a layout preference
      * must never fail a data commit. */
    private def clusterPolicy(snap: Snapshot): (Seq[String], Option[Long]) =
      snap.properties.get("graft.cluster.by") match {
        case None => (Nil, None)
        case Some(csv) =>
          val cols = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            .flatMap(c => snap.schema.fields.find(_.name.equalsIgnoreCase(c)))
            .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(f.dataType))
            .map(_.name)
          if (cols.isEmpty) (Nil, None)
          else {
            val cap = snap.properties.get("graft.cluster.maxRowsPerFile")
              .flatMap(v => scala.util.Try(v.trim.toLong).toOption).filter(_ > 0)
            (cols, cap.orElse(Some(1L << 20)))
          }
      }

    private def listParquet(dir: Path): Seq[Path] = {
      val out = Seq.newBuilder[Path]
      val s = Files.walk(dir)
      try s.forEach { p =>
        if (p.toString.endsWith(".parquet") && Files.isRegularFile(p)) out += p
      } finally s.close()
      out.result()
    }

    private def parquetFooterInfo(p: Path): (Long, Option[Map[String, skipping.ColStats]]) = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = spark.sessionState.newHadoopConf()
      rawLocalFsOptions.foreach { case (k, v) => conf.set(k, v) } // skip the .crc side-read
      val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf)
      val r = ParquetFileReader.open(in)
      try (r.getRecordCount,
        scala.util.Try(skipping.fromFooter(r.getFooter)).toOption.flatten)
      finally r.close()
    }

    private def nowTs(): java.sql.Timestamp = new java.sql.Timestamp(System.currentTimeMillis())

    /** The change-event protocol reserves `lsn` and `op` as metadata column
      * names; a payload column with either name would be irresolvably
      * ambiguous inside the merge aggregation. Fail fast with the reason
      * instead of surfacing an AMBIGUOUS_REFERENCE from deep in the plan.
      * (Append/overwrite/read paths carry no metadata columns and accept any
      * names — e.g. the quarantine table legitimately stores an `lsn`.) */
    private def requireMergeableSchema(snap: Snapshot): Unit = {
      require(snap.keyColumns.nonEmpty,
        s"table '$name' cannot be a MERGE target: it has no key columns " +
          "(created without a primary_key) — keyless tables are append/overwrite/read-only")
      val clash = snap.schema.fieldNames.map(_.toLowerCase).toSet
        .intersect(Set("lsn", "op"))
      require(clash.isEmpty,
        s"table '$name' cannot be a MERGE target: payload column(s) ${clash.mkString(", ")} " +
          "collide with the change-event protocol's reserved metadata columns (lsn, op); " +
          "rename the column(s) — append/overwrite/read remain available")
    }

    /** Whether a merge/deltaAppend for this snapshot will fuse its per-bucket
      * stats into the write job as observed metrics (dense path) instead of
      * running the narrow stats pre-pass. Callers that want to piggyback
      * their own Observations on the write job (verified-replay checksum,
      * fused quality gate) MUST gate on this same predicate — an upstream
      * Observation on the sparse path would drag every observed column into
      * the narrow (keys, lsn, op) pre-pass scan. */
    def willFuseStats(snap: Snapshot, assumeFullTouch: Boolean): Boolean =
      // threshold 32 (was 64): the observed-metric expression set is 4 x
      // numBuckets, and at 64 buckets the 256-expression analysis+codegen
      // per epoch measurably costs MORE than the one narrow stats pre-pass
      // it replaces (A/B on the 64-bucket rebucket replay); at <= 32 the
      // fusion still wins (one job per epoch, gate/checksum piggyback)
      assumeFullTouch && snap.numBuckets <= 32 &&
        System.getProperty("graft.merge.fuseStats", "1") == "1"

    /** Fold removed delta files' lsn range into the snapshot-level
      * high-watermark (see Snapshot.foldedLsnHigh). */
    private def foldDeltas(cur: Snapshot, removed: Seq[DataFile]): Option[Long] = {
      val folded = removed.filter(f => f.kind == "delta").map(_.lsnMax).filter(_ >= 0)
      if (folded.isEmpty) cur.foldedLsnHigh
      else Some(math.max(cur.foldedLsnHigh.getOrElse(-1L), folded.max))
    }

    /** Full overwrite (reference: src/models/writer.py:34-40). An unfenced
      * write (epochId = -1) carries the current fence FORWARD rather than
      * regressing it — otherwise a later crash-replay of already-committed
      * epochs would re-apply them. Overwrite discards ALL current files,
      * including outstanding MoR deltas, so their lsn range is folded into
      * foldedLsnHigh — otherwise changesSince(v) across the overwrite would
      * silently return an incomplete feed instead of throwing. */
    def overwrite(df: DataFrame, epochId: Long = -1L, lsnHigh: Long = -1L): CommitResult = {
      val cur = snapshot
      if (epochId >= 0 && epochId <= cur.epochId) return CommitResult(committed = false, cur, Nil)
      val next0 = cur.copy(version = cur.version + 1, epochId = math.max(epochId, cur.epochId),
        lsnHigh = math.max(lsnHigh, cur.lsnHigh))
      val files = writeBucketed(cur.registry.conform(df, cur.schemaVersion), cur, next0.version)
      val allBuckets = (0 until cur.numBuckets).toSet
      // the removed delta lsn fold needs the OLD delta files' ranges: in
      // chunked mode resolve only delta-bearing manifests (ref-pruned)
      val removedDeltas = filesOfBuckets(cur, None, deltaOnly = true)
      val (nf, nm) = nextFileState(cur, allBuckets, files)
      val next = next0.copy(files = nf, manifests = nm,
        foldedLsnHigh = foldDeltas(cur, removedDeltas))
      val ok = commit(next, fence = epochId >= 0)
      val removedCounts = fileCountsByBucket(cur)
      val lin = files.groupBy(_.bucket).map { case (b, fs) =>
        LineageEntry(name, next.version, epochId, b, lsnHigh, lsnHigh,
          fs.map(_.rows).sum, 0L, fs.size, removedCounts.getOrElse(b, 0), nowTs())
      }.toSeq
      CommitResult(ok, if (ok) next else cur, if (ok) lin else Nil)
    }

    /** Append without rewriting (reference: src/models/data_quality_evaluator.py:67-68).
      * Unfenced appends (epochId = -1) carry the fence forward (see overwrite).
      *
      * `fenceScope`: idempotence fence keyed per SOURCE rather than the table's
      * single global epoch fence — a shared side table (e.g. one
      * data_quality_checks audit table fed by several ReplayEngines) stores
      * one high-watermark per scope in its snapshot properties
      * (`graft.fence.<scope>`), so engine A's epoch-5 append can never fence
      * out engine B's later epoch-3 append. Scoped appends leave the global
      * epoch fence untouched. */
    def append(df: DataFrame, epochId: Long = -1L, lsnHigh: Long = -1L,
        fenceScope: Option[String] = None): CommitResult = {
      // Bounded optimistic retry: an append removes nothing, so losing the
      // version race to a concurrent writer (e.g. several ReplayEngines
      // sharing one audit table) is always safely retryable — reload the
      // snapshot and re-commit the ALREADY-WRITTEN files under the next
      // version (the data job runs once per logical append; files record
      // their own schemaVersion, so a concurrent schema evolution between
      // attempts still reads back correctly). The fence re-check on each
      // attempt preserves idempotence. Merge/overwrite do NOT auto-retry:
      // their rewrites are derived from the now-stale snapshot.
      val scopedKey = fenceScope.map(s => s"graft.fence.$s")
      var written: Seq[DataFile] = null
      var attempt = 0
      while (true) {
        val cur = snapshot
        scopedKey match {
          case Some(k) =>
            if (epochId >= 0 && cur.properties.get(k).exists(_.toLong >= epochId))
              return CommitResult(committed = false, cur, Nil) // replayed epoch for this scope
          case None =>
            if (epochId >= 0 && epochId <= cur.epochId) return CommitResult(committed = false, cur, Nil)
        }
        val next0 = cur.copy(version = cur.version + 1,
          epochId = if (scopedKey.isEmpty) math.max(epochId, cur.epochId) else cur.epochId,
          lsnHigh = math.max(lsnHigh, cur.lsnHigh),
          properties = scopedKey.filter(_ => epochId >= 0)
            .map(k => cur.properties + (k -> epochId.toString)).getOrElse(cur.properties))
        if (written == null)
          written = writeBucketed(cur.registry.conform(df, cur.schemaVersion), cur, next0.version)
        val (nf, nm) = nextFileState(cur, Set.empty, written)
        val next = next0.copy(files = nf, manifests = nm)
        try {
          val ok = commit(next, fence = scopedKey.isEmpty && epochId >= 0)
          val lin = written.groupBy(_.bucket).map { case (b, fs) =>
            LineageEntry(name, next.version, epochId, b, lsnHigh, lsnHigh,
              fs.map(_.rows).sum, 0L, fs.size, 0, nowTs())
          }.toSeq
          return CommitResult(ok, if (ok) next else cur, if (ok) lin else Nil)
        } catch {
          case e: CommitConflictException =>
            attempt += 1
            if (attempt >= 5) throw e
        }
      }
      sys.error("unreachable")
    }

    /** Additive schema evolution: commit a metadata-only snapshot whose current
      * schema is `next` (new nullable columns / widened types). Existing data
      * files keep their physical schemaVersion and are conformed on read.
      *
      * KEY columns may never change type — not even widen: the bucket
      * assignment hashes the key columns' VALUES at their current types
      * (`pmod(hash(keys), NB)`), and Spark's Murmur3 hashes an int and the
      * same value as a long differently, so a widened key would re-home
      * every existing key to a different bucket than its stored rows —
      * merges would then silently see (and split) keys across buckets. */
    def evolveSchema(next: StructType): Snapshot = {
      require(!next.fieldNames.exists(_.equalsIgnoreCase("_lsn")),
        s"table '$name': _lsn is a reserved system column name")
      val cur = snapshot
      cur.keyColumns.foreach { k =>
        val prev = cur.schema.fields.find(_.name.equalsIgnoreCase(k))
        val nf = next.fields.find(_.name.equalsIgnoreCase(k))
        require(prev.map(_.dataType) == nf.map(_.dataType),
          s"table '$name': key column '$k' cannot change type (bucket assignment " +
            "hashes key values at their declared type; widening would re-home every " +
            "existing key to a different bucket than its stored rows)")
      }
      val reg = cur.registry.evolve(next)
      val ns = cur.copy(version = cur.version + 1,
        schemaVersion = reg.latestVersion,
        schemas = cur.schemas + (reg.latestVersion.toString -> next.json))
      require(commit(ns.copy(epochId = cur.epochId), fence = false),
        "schema evolution commit failed")
      snapshot
    }

    /** Metadata-only commit: merge table properties into the next snapshot,
      * dropping any in `remove`
      * (reference: SetTableProperties DDL, src/delta_engine/execute/ddl.py). */
    def setProperties(ps: Map[String, String], remove: Seq[String] = Nil): Snapshot = {
      val cur = snapshot
      val next = cur.copy(version = cur.version + 1,
        properties = (cur.properties ++ ps) -- remove)
      require(commit(next, fence = false), "setProperties commit failed")
      snapshot
    }

    /** Metadata-only schema amendment IN PLACE of the current schema version:
      * column names and types must be unchanged; nullability may only loosen;
      * comments are free. Used for SetColumnComments / DROP NOT NULL actions —
      * physical file schemas are unaffected, so no new schema version is cut
      * (contrast [[evolveSchema]], which adds a version). */
    def amendSchema(next: StructType): Snapshot = {
      val cur = snapshot
      val prev = cur.schema
      require(prev.fields.map(_.name).toSeq == next.fields.map(_.name).toSeq,
        "amendSchema cannot add/drop/rename columns — use evolveSchema")
      prev.fields.zip(next.fields).foreach { case (p, n) =>
        require(p.dataType == n.dataType,
          s"amendSchema cannot change types ('${p.name}') — use evolveSchema")
        require(!(p.nullable && !n.nullable),
          s"amendSchema cannot tighten '${p.name}' to NOT NULL")
      }
      val ns = cur.copy(version = cur.version + 1,
        schemas = cur.schemas + (cur.schemaVersion.toString -> next.json))
      require(commit(ns, fence = false), "amendSchema commit failed")
      snapshot
    }

    /** Copy-on-write MERGE keyed on the table's key columns — the CDC-apply
      * kernel (reference contract: whenMatchedUpdateAll / whenNotMatchedInsertAll,
      * /root/reference/src/models/writer.py:42-67, plus a delete extension).
      *
      * `batch` carries columns: lsn:long, op:string(I|U|D) + the current
      * schema's columns. It may contain MULTIPLE events per key: per-key
      * max-LSN dedup is FUSED into the merge itself (see below). Only buckets
      * present in the batch are read and rewritten; untouched buckets carry
      * over by manifest reference (zero data movement).
      *
      * Physical shape — ONE Spark job, one wide shuffle, per dense epoch:
      * union(target rows @ their stored row _lsn, batch events) -> hash-aggregate
      * max_by_row(payload, lsn) per key (custom TypedImperativeAggregate,
      * graft.functions.MaxByRow — the built-in max_by(struct, lsn) degrades
      * to SortAggregate for wide payloads) -> drop keys whose winner is a
      * delete -> bucketed write. Dedup, matched-update, not-matched-insert
      * and delete collapse into one partial-aggregatable shuffle: a duplicate
      * storm on a hot key combines map-side, and the aggregate's hash
      * partitioning on the key columns is already bucket-aligned for the
      * write (no extra repartition). Per-bucket lineage stats ride along via
      * Dataset.observe — no separate pass.
      *
      * Sparse epochs (`assumeFullTouch = false` and no density hint): a
      * narrow stats pass over (repo, path, lsn, op) — content column-pruned
      * out of the scan — first computes the touched-bucket set, so only those
      * buckets' files are read and rewritten; untouched buckets carry over by
      * manifest reference (zero data movement). This is the path that matters
      * at 100 TB: epoch cost scales with the batch's key spread, not with
      * table size.
      *
      * Ordering contract (binlog tail): epoch ids are fenced monotonic, and
      * within a batch order and duplication are free (max-LSN resolution).
      * ACROSS epochs the resolution is by true log position everywhere:
      * base rows re-enter the race at their STORED row `_lsn` (written by
      * every merge/compaction; -1 only for append/overwrite/pre-upgrade
      * files) and MoR delta rows at their own LSNs — so a later epoch that
      * redelivers stale LSNs cannot regress an existing key. The one
      * ordering obligation that remains upstream: a key already DELETED has
      * no row to outrank a stale pre-delete redelivery, so deleted-key
      * anti-resurrection needs an in-order tail or the cross-epoch dedup
      * watermark (streaming.statefulDedup).
      *
      * `preCommit` runs after the write job completes (any Observations on
      * `batch` have resolved) but BEFORE the snapshot commit — throwing from
      * it aborts the epoch with zero committed state (the written files are
      * unreferenced, vacuum-able orphans). The ReplayEngine fuses the
      * quality gate here on the dense path.
      */
    def merge(batch: DataFrame, epochId: Long, assumeFullTouch: Boolean = false,
        preCommit: () => Unit = () => ()): CommitResult = {
      val cur = snapshot
      requireMergeableSchema(cur)
      if (epochId >= 0 && epochId <= cur.epochId) return CommitResult(committed = false, cur, Nil)
      // Dense epochs (most buckets touched) skip the stats pre-pass entirely:
      // the per-bucket stats ride the merge job itself as observed metrics —
      // ONE job per epoch, no second scan of the batch. The observed-metrics
      // expression set is linear in numBuckets, so this fusion applies up to
      // 64 buckets; beyond that (production: 4096+) the narrow aggregate
      // pre-pass below stays the right shape (its cost amortizes over the
      // proportionally larger epoch).
      if (willFuseStats(cur, assumeFullTouch))
        return mergeDense(batch, epochId, cur, preCommit)
      val keys = cur.keyColumns
      val payload = cur.schema.fieldNames.toSeq
      val nonKey = payload.filterNot(keys.contains)

      // per-bucket batch stats, one narrow aggregate job (content is
      // column-pruned out of the scan). Dense epochs aggregate RAW events
      // straight to <= numBuckets groups — fully map-side combinable, no
      // per-key stage. Sparse epochs first reduce to per-key winners so the
      // lineage counts are exact applied rows (and the touched-bucket set
      // prunes the target read).
      val statsRows = perBucketStats(batch, cur, assumeFullTouch)
      if (statsRows.isEmpty) return CommitResult(committed = false, cur, Nil)
      val touched: Set[Int] = statsRows.map(_.getAs[Int]("_b")).toSet
      val lsnByBucket = statsRows.map(r =>
        r.getAs[Int]("_b") -> (r.getAs[Long]("lmin"), r.getAs[Long]("lmax"))).toMap
      val lsnHigh = lsnByBucket.values.map(_._2).max

      // fused dedup+merge: base rows join the race at their stored row _lsn,
      // MoR delta rows at their own LSN, batch events at theirs — one
      // aggregation resolves everything by true log position (a CoW merge
      // also compacts any deltas of touched buckets)
      val ordered = (Seq(col("lsn"), col("op")) ++ payload.map(col))
      // chunked mode: only the touched buckets' manifests are read — the
      // sparse epoch never materializes the full file list driver-side
      val wanted = filesOfBuckets(cur, Some(touched))
      // base rows re-enter the race at their STORED row LSN (see mergeExpr)
      val base = readBase(cur, wanted.filter(_.kind == "base"))
        .select((Seq(col("_lsn").as("lsn"), lit(null).cast(StringType).as("op")) ++ payload.map(col)): _*)
      val deltas = readDeltas(cur, wanted.filter(_.kind == "delta"))
      val merged = mergeExpr(base.unionByName(deltas).unionByName(batch.select(ordered: _*)), cur)

      val nextVersion = cur.version + 1
      timed("merge:plan")(merged.queryExecution.executedPlan)
      // the aggregate hash-partitioned on the key columns, which determines
      // the bucket — no repartition before the bucketed write
      val rawFiles = timed("merge:agg+write")(writeBucketed(merged, cur, nextVersion,
        repartitionByBucket = false, withRowLsn = true))
      val newFiles = rawFiles.map(f =>
        f.copy(lsnMin = lsnByBucket.get(f.bucket).map(_._1).getOrElse(-1L),
          lsnMax = lsnByBucket.get(f.bucket).map(_._2).getOrElse(-1L)))
      val (nf, nm) = nextFileState(cur, touched, newFiles)
      val next = cur.copy(version = nextVersion, epochId = math.max(epochId, cur.epochId),
        lsnHigh = math.max(lsnHigh, cur.lsnHigh), files = nf, manifests = nm,
        foldedLsnHigh = foldDeltas(cur, wanted))
      preCommit()
      val ok = commit(next, fence = epochId >= 0)
      val removedByBucket = wanted.groupBy(_.bucket)
      val lin = statsRows.map { r =>
        val b = r.getAs[Int]("_b")
        LineageEntry(name, nextVersion, epochId, b,
          r.getAs[Long]("lmin"), r.getAs[Long]("lmax"),
          r.getAs[Long]("ups"), r.getAs[Long]("dels"),
          newFiles.count(_.bucket == b), removedByBucket.get(b).map(_.size).getOrElse(0), nowTs())
      }.toSeq
      CommitResult(ok, if (ok) next else cur, if (ok) lin else Nil)
    }

    /** Dense-epoch merge: all buckets are read and rewritten, and the
      * per-bucket batch stats (lsn ranges, upsert/delete counts — lineage +
      * file stamping) are collected as OBSERVED METRICS on the batch leg of
      * the one merge job. Untouched buckets (no batch rows) are rewritten
      * too (they were read anyway under the full-touch assumption) and keep
      * their previous lsn-range stamps.
      *
      * Contract: `assumeFullTouch` callers assert a non-trivial batch (the
      * ReplayEngine gates it on knownInputCount >= numBuckets*32). An
      * actually-empty batch stays CORRECT — the commit is skipped when the
      * observed counts are zero — but the full-table rewrite has already run
      * and its files are left as vacuum-able orphans; emptiness cannot be
      * known earlier without a pre-pass, which is the very job this path
      * exists to avoid. */
    private def mergeDense(batch: DataFrame, epochId: Long, cur: Snapshot,
        preCommit: () => Unit = () => ()): CommitResult = {
      val payload = cur.schema.fieldNames.toSeq
      val nb = cur.numBuckets
      val obs = org.apache.spark.sql.Observation(s"merge-stats-${UUID.randomUUID()}")
      val aggs = (0 until nb).flatMap { b =>
        val isB = col("_ob") === b
        Seq(
          min(when(isB, col("lsn"))).as(s"lmin$b"),
          max(when(isB, col("lsn"))).as(s"lmax$b"),
          sum(when(isB && col("op") === "D", 1L).otherwise(0L)).as(s"dels$b"),
          sum(when(isB && col("op") =!= "D", 1L).otherwise(0L)).as(s"ups$b"))
      }
      val ordered = Seq(col("lsn"), col("op")) ++ payload.map(col)
      val batchObs = batch
        .select((ordered :+ bucketExpr(cur).as("_ob")): _*)
        .observe(obs, aggs.head, aggs.tail: _*)
        .drop("_ob")
      val curFiles = filesOf(cur) // dense = full touch: resolving all is the job
      val base = readBase(cur, curFiles.filter(_.kind == "base"))
        .select((Seq(col("_lsn").as("lsn"), lit(null).cast(StringType).as("op")) ++ payload.map(col)): _*)
      val deltas = readDeltas(cur, curFiles.filter(_.kind == "delta"))
      val merged = mergeExpr(base.unionByName(deltas).unionByName(batchObs), cur)

      val nextVersion = cur.version + 1
      val rawFiles = timed("merge:agg+write")(writeBucketed(merged, cur, nextVersion,
        repartitionByBucket = false, withRowLsn = true))
      preCommit() // batch Observations have resolved; abort here = zero committed state

      val m = obs.get
      def metric(n: String): Option[Long] =
        m.get(n).collect { case x: Number => x.longValue }
      val perBucket = (0 until nb).flatMap { b =>
        val ups = metric(s"ups$b").getOrElse(0L)
        val dels = metric(s"dels$b").getOrElse(0L)
        if (ups + dels == 0) None
        else Some(b -> (metric(s"lmin$b").getOrElse(-1L), metric(s"lmax$b").getOrElse(-1L), ups, dels))
      }.toMap
      if (perBucket.isEmpty) return CommitResult(committed = false, cur, Nil) // empty batch
      val lsnHigh = perBucket.values.map(_._2).max

      val oldByBucket = curFiles.filter(_.lsnMin >= 0).groupBy(_.bucket)
      val newFiles = rawFiles.map { f =>
        perBucket.get(f.bucket) match {
          case Some((lmin, lmax, _, _)) => f.copy(lsnMin = lmin, lsnMax = lmax)
          case None => // untouched bucket rewritten verbatim: keep old stamps
            val olds = oldByBucket.getOrElse(f.bucket, Nil)
            f.copy(lsnMin = if (olds.isEmpty) -1L else olds.map(_.lsnMin).min,
              lsnMax = if (olds.isEmpty) -1L else olds.map(_.lsnMax).max)
        }
      }
      val (nf, nm) = nextFileState(cur, (0 until nb).toSet, newFiles)
      val next = cur.copy(version = nextVersion, epochId = math.max(epochId, cur.epochId),
        lsnHigh = math.max(lsnHigh, cur.lsnHigh), files = nf, manifests = nm,
        foldedLsnHigh = foldDeltas(cur, curFiles))
      val ok = commit(next, fence = epochId >= 0)
      val removedByBucket = curFiles.groupBy(_.bucket)
      val lin = perBucket.toSeq.map { case (b, (lmin, lmax, ups, dels)) =>
        LineageEntry(name, nextVersion, epochId, b, lmin, lmax, ups, dels,
          newFiles.count(_.bucket == b), removedByBucket.get(b).map(_.size).getOrElse(0), nowTs())
      }
      CommitResult(ok, if (ok) next else cur, if (ok) lin else Nil)
    }

    /** Per-bucket batch stats, one narrow aggregate job (content is
      * column-pruned out of the scan). Dense epochs aggregate RAW events
      * straight to <= numBuckets groups — fully map-side combinable, no
      * per-key stage. Sparse epochs first reduce to per-key winners, so the
      * lineage counts are the batch's per-key change rows (and the
      * touched-bucket set prunes the target read). Counting note: a winner
      * that then LOSES to a higher stored row `_lsn` (a stale redelivery)
      * is still counted — lineage/metrics report the batch's change volume,
      * an upper bound on rows actually applied under redelivery. */
    private def perBucketStats(batch: DataFrame, cur: Snapshot,
        assumeFullTouch: Boolean): Array[org.apache.spark.sql.Row] = {
      val keys = cur.keyColumns
      val narrow = batch.select((keys.map(col) :+ col("lsn") :+ col("op")): _*)
      val perBucket =
        if (assumeFullTouch) narrow.groupBy(bucketExpr(cur).as("_b"))
        else narrow
          .groupBy(keys.map(col): _*)
          .agg(max_by(col("op"), col("lsn")).as("op"), max("lsn").as("lsn"))
          .groupBy(bucketExpr(cur).as("_b"))
      timed("merge:stats")(perBucket
        .agg(min("lsn").as("lmin"), max("lsn").as("lmax"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("dels"),
          sum(when(col("op") =!= "D", 1L).otherwise(0L)).as("ups"))
        .collect())
    }

    /** Merge-on-read apply: dedup the batch to per-key winners and append
      * them as bucketed DELTA files (deletes kept as tombstones) — no base
      * rewrite. Readers apply deltas with the same fused max-LSN aggregation;
      * [[compactDeltas]] (or any CoW merge touching the bucket) folds them
      * into base files. The MoR trade: epoch apply cost ~ batch size instead
      * of ~ touched-bucket size; read cost grows with outstanding deltas. */
    def deltaAppend(batch: DataFrame, epochId: Long, assumeFullTouch: Boolean = false,
        preCommit: () => Unit = () => ()): CommitResult = {
      val cur = snapshot
      requireMergeableSchema(cur)
      if (epochId >= 0 && epochId <= cur.epochId) return CommitResult(committed = false, cur, Nil)
      val keys = cur.keyColumns
      val payload = cur.schema.fieldNames.toSeq
      val nonKey = payload.filterNot(keys.contains)
      // dense epochs: fuse the per-bucket stats into the winners job as
      // observed metrics (see mergeDense) — one job, no batch pre-pass
      // (same kill-switch as the CoW path). Same empty-batch contract as
      // mergeDense: an actually-empty batch stays CORRECT (zero observed
      // counts skip the commit) but its already-written delta files become
      // vacuum-able orphans — assumeFullTouch callers assert non-trivial
      // batches (ReplayEngine gates on knownInputCount).
      val fuseStats = willFuseStats(cur, assumeFullTouch)

      var statsRows: Array[org.apache.spark.sql.Row] = Array.empty
      var obsOpt: Option[org.apache.spark.sql.Observation] = None
      val source: DataFrame =
        if (fuseStats) {
          val obs = org.apache.spark.sql.Observation(s"delta-stats-${UUID.randomUUID()}")
          obsOpt = Some(obs)
          val aggs = (0 until cur.numBuckets).flatMap { b =>
            val isB = col("_ob") === b
            Seq(
              min(when(isB, col("lsn"))).as(s"lmin$b"),
              max(when(isB, col("lsn"))).as(s"lmax$b"),
              sum(when(isB && col("op") === "D", 1L).otherwise(0L)).as(s"dels$b"),
              sum(when(isB && col("op") =!= "D", 1L).otherwise(0L)).as(s"ups$b"))
          }
          batch.select((Seq(col("lsn"), col("op")) ++ payload.map(col) :+ bucketExpr(cur).as("_ob")): _*)
            .observe(obs, aggs.head, aggs.tail: _*)
            .drop("_ob")
        } else {
          statsRows = perBucketStats(batch, cur, assumeFullTouch)
          if (statsRows.isEmpty) return CommitResult(committed = false, cur, Nil)
          batch.select((Seq(col("lsn"), col("op")) ++ payload.map(col)): _*)
        }

      // per-key winners incl. delete tombstones, keeping (lsn, op)
      val winners = source
        .groupBy(keys.map(col): _*)
        .agg(graft.functions.MaxByRow.maxByRow(
          struct((Seq(col("lsn"), col("op")) ++ nonKey.map(col)): _*), col("lsn")).as("_e"))
        .select(Seq(col("_e.lsn").as("lsn"), col("_e.op").as("op")) ++ keys.map(col) ++
          nonKey.map(c => col(s"_e.$c").as(c)): _*)

      val nextVersion = cur.version + 1
      val rawFiles = timed("merge:delta+write")(writeBucketed(winners, cur, nextVersion,
        repartitionByBucket = false, kind = "delta"))
      preCommit() // see merge(): abort here leaves only vacuum-able orphans

      // resolve stats: either from the pre-pass rows or the observed metrics
      val perBucket: Map[Int, (Long, Long, Long, Long)] = obsOpt match {
        case Some(obs) =>
          val m = obs.get
          def metric(n: String): Option[Long] =
            m.get(n).collect { case x: Number => x.longValue }
          (0 until cur.numBuckets).flatMap { b =>
            val ups = metric(s"ups$b").getOrElse(0L)
            val dels = metric(s"dels$b").getOrElse(0L)
            if (ups + dels == 0) None
            else Some(b -> (metric(s"lmin$b").getOrElse(-1L), metric(s"lmax$b").getOrElse(-1L), ups, dels))
          }.toMap
        case None =>
          statsRows.map(r => r.getAs[Int]("_b") ->
            (r.getAs[Long]("lmin"), r.getAs[Long]("lmax"),
              r.getAs[Long]("ups"), r.getAs[Long]("dels"))).toMap
      }
      if (perBucket.isEmpty) return CommitResult(committed = false, cur, Nil) // empty batch
      val lsnHigh = perBucket.values.map(_._2).max

      val newFiles = rawFiles.map(f =>
        f.copy(lsnMin = perBucket.get(f.bucket).map(_._1).getOrElse(-1L),
          lsnMax = perBucket.get(f.bucket).map(_._2).getOrElse(-1L)))
      val (nf, nm) = nextFileState(cur, Set.empty, newFiles)
      val next = cur.copy(version = nextVersion, epochId = math.max(epochId, cur.epochId),
        lsnHigh = math.max(lsnHigh, cur.lsnHigh), files = nf, manifests = nm)
      val ok = commit(next, fence = epochId >= 0)
      if (ok) maybeAutoCompact(next)
      val lin = perBucket.toSeq.map { case (b, (lmin, lmax, ups, dels)) =>
        LineageEntry(name, nextVersion, epochId, b, lmin, lmax, ups, dels,
          newFiles.count(_.bucket == b), 0, nowTs())
      }
      CommitResult(ok, if (ok) next else cur, if (ok) lin else Nil)
    }

    /** MoR read-amplification guard: with table property
      * `graft.mor.compactAfter = k`, any bucket whose outstanding delta-file
      * count exceeds k is folded into its base right after the delta commit
      * — per-bucket read cost stays O(base + k deltas) under arbitrarily
      * long uncompacted epoch runs, instead of growing linearly with epoch
      * count. Bucket selection is O(manifest refs); the fold rewrites ONLY
      * the over-threshold buckets. Trade-off: each fold advances
      * foldedLsnHigh, so `changesSince` consumers must keep their lag under
      * the policy window (the standard compaction-lag contract of every
      * incremental-feed store) — leave the property unset to schedule
      * compaction explicitly. */
    private def maybeAutoCompact(snap: Snapshot): Unit =
      // BEST-EFFORT by contract: the delta commit this policy piggybacks on
      // has already succeeded, so neither a malformed property value nor a
      // fold failure (e.g. a commit conflict with a concurrent writer) may
      // propagate — the caller's epoch write IS durable and a streaming
      // batch must not be failed retroactively. The fold retries on the
      // next over-threshold append.
      snap.properties.get("graft.mor.compactAfter")
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption).foreach { k =>
          try {
            val over = deltaCountsByBucket(snap).filter(_._2 > k).keySet
            if (over.nonEmpty) { compactDeltas(Some(over)); () }
          } catch {
            case scala.util.control.NonFatal(e) =>
              println(s"[graft] auto-compaction of $name deferred: ${e.getMessage}")
          }
        }

    /** Fold outstanding MoR delta files into base files (per-bucket CoW
      * rewrite; logical no-op, epoch fence untouched). `only` restricts the
      * fold to a bucket subset (the auto-compaction policy's selective
      * path). Returns buckets compacted. */
    def compactDeltas(only: Option[Set[Int]] = None): Int = synchronized {
      val cur = snapshot
      val deltaBuckets = {
        val b = bucketsWithDeltas(cur)
        only.map(b.intersect).getOrElse(b)
      }
      if (deltaBuckets.isEmpty) return 0
      val data = readBucketsWithLsn(cur, Some(deltaBuckets)) // fused apply, row LSNs kept
      val olds = filesOfBuckets(cur, Some(deltaBuckets))
      val newFiles = writeBucketed(data, cur, cur.version + 1, repartitionByBucket = false,
        withRowLsn = true)
        .map { f =>
          val o = olds.filter(x => x.bucket == f.bucket && x.lsnMin >= 0)
          f.copy(lsnMin = if (o.isEmpty) -1L else o.map(_.lsnMin).min,
            lsnMax = if (o.isEmpty) -1L else o.map(_.lsnMax).max)
        }
      val (nf, nm) = nextFileState(cur, deltaBuckets, newFiles)
      val next = cur.copy(version = cur.version + 1, files = nf, manifests = nm,
        foldedLsnHigh = foldDeltas(cur, olds))
      require(commit(next, fence = false), "delta compaction commit failed")
      deltaBuckets.size
    }

    /** CDC-out: the change rows (lsn, op, payload) committed AFTER snapshot
      * `sinceVersion`, from MoR delta files — the lake table as a change
      * SOURCE for downstream incremental consumers. Only available while the
      * deltas are uncompacted (CoW epochs / compaction fold them away); pair
      * with a compaction policy that lags the downstream consumers. */
    def changesSince(sinceVersion: Long, endVersion: Option[Long] = None,
        filters: Seq[org.apache.spark.sql.sources.Filter] = Nil): DataFrame = {
      // `endVersion` pins the feed's upper bound to a specific snapshot
      // (MVCC): a resolved SQL relation captures it at resolution time so a
      // concurrent commit (or schema evolution) between resolution and scan
      // can never change the rows or mis-bind the declared schema.
      val cur = endVersion.map(snapshotAt).getOrElse(snapshot)
      val sinceSnap =
        try snapshotAt(sinceVersion)
        catch {
          case e: java.nio.file.NoSuchFileException =>
            throw new IllegalStateException(
              s"changes since v$sinceVersion no longer available: snapshot manifest was vacuumed", e)
        }
      // completeness check, O(1) in commit history: every delta committed
      // AFTER `since` carries lsn > since.lsnHigh (binlog ordering contract),
      // so post-since changes were folded away by a CoW merge / compaction
      // iff the folded high-watermark exceeds since.lsnHigh — silently
      // returning the survivors would be silent data loss downstream.
      if (cur.foldedLsnHigh.exists(_ > sinceSnap.lsnHigh))
        throw new IllegalStateException(
          s"changes since v$sinceVersion no longer available: delta files committed after it " +
            s"were compacted/merged away (foldedLsnHigh=${cur.foldedLsnHigh.get} > " +
            s"sinceLsnHigh=${sinceSnap.lsnHigh}; schedule compaction to lag consumers)")
      // delta-only resolution: manifests without delta files are never read
      val before = filesOfBuckets(sinceSnap, None, deltaOnly = true).map(_.path).toSet
      val newDeltas = filesOfBuckets(cur, None, deltaOnly = true).filterNot(f => before(f.path))
      // file skipping on the FEED: a narrow tail (`WHERE lsn >= x`, an
      // op-filtered or payload-filtered read) plans only the delta files
      // that may match. Two independent refuters, both may-match safe:
      // the manifest's exact per-file lsn stamps (present even when footer
      // stats are not) and the harvested per-column footer bounds evaluated
      // against the feed schema (lsn, op, payload...). Unlike the base-table
      // path this needs no delta-free guard: feed rows ARE delta-file rows,
      // no cross-file resolution happens here.
      val kept =
        if (filters.isEmpty) newDeltas
        else {
          val feedSchema = StructType(
            StructField("lsn", LongType, nullable = false) +:
              StructField("op", StringType, nullable = true) +: cur.schema.fields)
          def lsnRangeOk(f: DataFile, flt: org.apache.spark.sql.sources.Filter): Boolean = {
            import org.apache.spark.sql.sources._
            def v(a: Any): Option[Long] = a match {
              case n: Number => Some(n.longValue); case _ => None
            }
            if (f.lsnMin < 0) true // unstamped: never prune
            else flt match {
              case EqualTo("lsn", x) => v(x).forall(l => f.lsnMin <= l && l <= f.lsnMax)
              case GreaterThan("lsn", x) => v(x).forall(l => f.lsnMax > l)
              case GreaterThanOrEqual("lsn", x) => v(x).forall(l => f.lsnMax >= l)
              case LessThan("lsn", x) => v(x).forall(l => f.lsnMin < l)
              case LessThanOrEqual("lsn", x) => v(x).forall(l => f.lsnMin <= l)
              // keep the file when a NON-NULL value fails the Number
              // extraction (conservative, like every other branch's
              // v(x).forall); prune only when every value is provably out
              // of range or null
              case In("lsn", xs) if xs != null && xs.nonEmpty =>
                xs.exists(x => x != null && v(x).forall(l => f.lsnMin <= l && l <= f.lsnMax))
              case And(l, r) => lsnRangeOk(f, l) && lsnRangeOk(f, r)
              case Or(l, r) => lsnRangeOk(f, l) || lsnRangeOk(f, r)
              case _ => true
            }
          }
          newDeltas.filter { f =>
            filters.forall(flt => lsnRangeOk(f, flt)) &&
              f.stats.forall { s0 =>
                // same old-schema bounds projection as readWhere (lsn/op
                // are physical feed columns outside the registry schema
                // and pass through untouched)
                val s = if (f.schemaVersion == cur.schemaVersion) s0
                  else skipping.compatibleStats(s0, cur.schemaOf(f.schemaVersion), cur.schema)
                filters.forall(flt => skipping.mayMatch(s, f.rows, feedSchema, flt))
              }
          }
        }
      skipping.ScanStats.lastFeed.set(Some((kept.size, newDeltas.size)))
      readDeltas(cur, kept)
    }

    // ---- maintenance ------------------------------------------------------

    /** Time travel: read the table as of an older snapshot version. CoW never
      * mutates files in place, so any non-vacuumed snapshot reads exactly. */
    def readAt(version: Long): DataFrame = {
      val snap = snapshotAt(version)
      readBuckets(snap, None)
    }

    /** Resolve `TIMESTAMP AS OF`: the LARGEST snapshot version whose commit
      * wall-clock is at or before `tsMillis` (Iceberg/Delta semantics).
      * Pre-committedAt manifests count as arbitrarily old, so they resolve
      * for any timestamp. Throws if the timestamp predates every retained
      * snapshot. */
    def versionAt(tsMillis: Long): Long = {
      // committedAt is monotone in version BY CONSTRUCTION (commit()
      // monotonicizes each stamp against its predecessor's, never trusting
      // the wall clock alone), so scan newest-first and stop at the first
      // eligible snapshot — O(versions newer than ts) manifest parses, not
      // O(all retained versions)
      history().reverseIterator
        .find(v => snapshotAt(v).committedAt.getOrElse(0L) <= tsMillis)
        .getOrElse(throw new IllegalArgumentException(
          s"no snapshot of '$name' committed at or before timestamp $tsMillis " +
            "(it predates the table, or older snapshots were vacuumed)"))
    }

    /** List snapshot versions currently on disk (oldest first). */
    def history(): Seq[Long] = {
      if (!Files.isDirectory(metaDir)) return Nil
      val s = Files.list(metaDir)
      try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(_.stripPrefix("v").stripSuffix(".json").toLong).sorted.toSeq
      finally s.close()
    }

    /** Compact a bucket's small files into one file per bucket (logical no-op;
      * data rewrite only). Buckets whose file count is below `minFiles` are
      * left alone. Returns the number of buckets compacted. */
    def compact(minFiles: Int = 2): Int = synchronized {
      val cur = snapshot
      // bucket selection is ref-count-only (no manifest reads). Under a
      // cluster-on-write policy the TARGET layout is ceil(rows / cap) files
      // per bucket, not one: a bucket already at (or under) its target is
      // done — without this, scheduled compactions would rewrite perfectly
      // laid-out buckets forever and always report progress
      val expected: Int => Long = clusterPolicy(cur)._2 match {
        case None => _ => 1L
        case Some(cap) =>
          val rows = rowsByBucket(cur)
          b => math.max(1L, (rows.getOrElse(b, 0L) + cap - 1) / cap)
      }
      val buckets = fileCountsByBucket(cur)
        .filter { case (b, n) => n >= minFiles && n > expected(b) }.keySet
      if (buckets.isEmpty) return 0
      val toCompact = filesOfBuckets(cur, Some(buckets)).groupBy(_.bucket)
      val data = readBucketsWithLsn(cur, Some(buckets))
      val newFiles = writeBucketed(data, cur, cur.version + 1, withRowLsn = true).map { f =>
        // exclude the -1 "unstamped" sentinel from the range fold (matches
        // compactDeltas) so one unstamped file can't corrupt the lsn range
        val olds = toCompact.getOrElse(f.bucket, Nil).filter(_.lsnMin >= 0)
        f.copy(lsnMin = if (olds.isEmpty) -1L else olds.map(_.lsnMin).min,
          lsnMax = if (olds.isEmpty) -1L else olds.map(_.lsnMax).max)
      }
      val (nf, nm) = nextFileState(cur, buckets, newFiles)
      val next = cur.copy(version = cur.version + 1, files = nf, manifests = nm,
        foldedLsnHigh = foldDeltas(cur, toCompact.values.flatten.toSeq))
      require(commit(next, fence = false), "compaction commit failed")
      buckets.size
    }

    /** Change the table's hash-bucket count — the one layout knob fixed at
      * create time. A growing table eventually outgrows its bucket count
      * (per-bucket rewrite amplification is table size / numBuckets), so
      * 32 → 256 must be a maintenance op, not a re-create. Logical no-op:
      * one full CoW rewrite (ONE wide shuffle on the new bucket hash +
      * bucket-aligned write — the same cost envelope as a dense merge
      * epoch), epoch fence untouched, so in-flight CDC replay/streaming
      * continues across it unchanged. Outstanding MoR deltas are absorbed
      * by the rewrite (the fused read applies them), so their lsn range
      * folds into foldedLsnHigh exactly like compaction. Per-row `_lsn`
      * stamps survive the rewrite; the new files' lsn RANGES are the old
      * files' global envelope (per-bucket ranges can't be mapped across the
      * hash change without a per-row pass — conservative ranges only cost
      * pruning selectivity, never correctness). Chunked-manifest mode
      * re-evaluates against the NEW count (a 32 → 256 rebucket flips the
      * table into chunked commits automatically). Returns the new snapshot
      * version. */
    def rebucket(newBuckets: Int): Long = synchronized {
      val cur = snapshot
      require(newBuckets >= 1, s"bucket count must be >= 1, got $newBuckets")
      if (newBuckets == cur.numBuckets) return cur.version // already there: no-op
      val reshaped = cur.copy(numBuckets = newBuckets)
      val olds = filesOf(cur)
      val oldDeltas = olds.filter(_.kind == "delta")
      // fused read (base ⊕ deltas, row lsn kept) under the OLD layout,
      // rewritten under the NEW bucket hash
      val data = readBucketsWithLsn(cur, None)
      val stamped = olds.filter(_.lsnMin >= 0)
      val (lo, hi) =
        if (stamped.isEmpty) (-1L, -1L)
        else (stamped.map(_.lsnMin).min, stamped.map(_.lsnMax).max)
      val newFiles = writeBucketed(data, reshaped, cur.version + 1, withRowLsn = true)
        .map(_.copy(lsnMin = lo, lsnMax = hi))
      // every old bucket is removed; nextFileState runs against the NEW
      // shape so the chunked/inline decision tracks the new count
      val (nf, nm) = nextFileState(reshaped, (0 until cur.numBuckets).toSet, newFiles)
      val next = reshaped.copy(version = cur.version + 1, files = nf, manifests = nm,
        foldedLsnHigh = foldDeltas(cur, oldDeltas))
      require(commit(next, fence = false), "rebucket commit failed")
      next.version
    }

    /** Sort-cluster maintenance op: rewrite every bucket ordered by
      * `sortCols`, split into files of at most `maxRowsPerFile` rows. The
      * bucket layout (key hashing) is untouched — clustering changes the
      * order WITHIN buckets, so a bucket becomes several files with tight,
      * pairwise-disjoint bounds on the sort columns and a non-key range or
      * equality predicate then skips most of the bucket's files at planning
      * time ([[skipping]]). This is the file-bounds complement of bucket
      * pruning: key predicates prune buckets, clustered-column predicates
      * prune files within buckets. Logically a no-op (fenced-neutral full
      * CoW rewrite, per-row `_lsn` preserved, outstanding MoR deltas
      * absorbed with the fold watermark advanced — stale feeds refuse,
      * exactly like [[rebucket]]). Iceberg analog: rewriteDataFiles with a
      * sort order. Returns the new snapshot version. */
    def cluster(sortCols: Seq[String], maxRowsPerFile: Long = 1L << 20): Long = synchronized {
      val cur = snapshot
      require(sortCols.nonEmpty, "cluster needs at least one sort column")
      require(maxRowsPerFile > 0, s"maxRowsPerFile must be positive, got $maxRowsPerFile")
      // resolve case-insensitively to the schema's spelling
      val resolved = sortCols.map { c =>
        cur.schema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(
            s"cluster column '$c' not in schema ${cur.schema.fieldNames.mkString("(", ", ", ")")}"))
      }
      val olds = filesOf(cur)
      val oldDeltas = olds.filter(_.kind == "delta")
      val data = readBucketsWithLsn(cur, None)
      // bucket membership is unchanged (unlike rebucket's global envelope),
      // so stamp each rewritten file with ITS bucket's old lsn range — the
      // tight per-bucket fold compact() uses (-1 sentinel excluded)
      val oldByBucket = olds.groupBy(_.bucket)
      val newFiles = writeBucketed(data, cur, cur.version + 1, withRowLsn = true,
        sortCols = resolved, maxRowsPerFile = Some(maxRowsPerFile))
        .map { f =>
          val stamped = oldByBucket.getOrElse(f.bucket, Nil).filter(_.lsnMin >= 0)
          f.copy(lsnMin = if (stamped.isEmpty) -1L else stamped.map(_.lsnMin).min,
            lsnMax = if (stamped.isEmpty) -1L else stamped.map(_.lsnMax).max)
        }
      val (nf, nm) = nextFileState(cur, (0 until cur.numBuckets).toSet, newFiles)
      val next = cur.copy(version = cur.version + 1, files = nf, manifests = nm,
        foldedLsnHigh = foldDeltas(cur, oldDeltas))
      require(commit(next, fence = false), "cluster commit failed")
      next.version
    }

    /** Garbage-collect: drop all snapshots except the newest `keepSnapshots`
      * and delete every data file no kept snapshot references, plus orphan
      * files from crashed writes. Returns (#manifests removed, #files removed). */
    def vacuum(keepSnapshots: Int = 1): (Int, Int) = synchronized {
      vacuumKeeping(history().takeRight(math.max(1, keepSnapshots)).toSet)
    }

    /** Age-based retention: drop every snapshot whose commit wall-clock is
      * older than `olderThan` (the current snapshot always survives — a
      * quiet table must stay readable), then sweep orphans. Pre-committedAt
      * snapshots count as arbitrarily old. */
    def vacuum(olderThan: java.time.Duration): (Int, Int) = synchronized {
      val cutoff = System.currentTimeMillis() - olderThan.toMillis
      val versions = history()
      val keep = versions.filter(v => snapshotAt(v).committedAt.getOrElse(0L) >= cutoff).toSet ++
        versions.lastOption
      vacuumKeeping(keep)
    }

    private def vacuumKeeping(keep: Set[Long]): (Int, Int) = synchronized {
      val versions = history()
      val keptSnaps = keep.toSeq.map(snapshotAt)
      val referenced: Set[String] = keptSnaps.flatMap(s => filesOf(s).map(_.path)).toSet
      var manifestsRemoved = 0
      versions.filterNot(keep).foreach { v => Files.deleteIfExists(snapPath(v)); manifestsRemoved += 1 }
      // GC per-bucket manifest files no kept snapshot references
      val keptManifests: Set[String] = keptSnaps.flatMap(_.manifests.map(_.path)).toSet
      val mDir = metaDir.resolve("m")
      if (Files.isDirectory(mDir)) {
        val ms = Files.list(mDir)
        try ms.forEach { m =>
          val rel = Paths.get(root).relativize(m).toString
          if (!keptManifests(rel)) {
            Files.deleteIfExists(m); manifestCache.remove(rel); manifestsRemoved += 1
          }
        } finally ms.close()
      }
      val filesRemoved = if (Files.isDirectory(dataDir)) sweepOrphans(referenced) else 0
      (manifestsRemoved, filesRemoved)
    }

    /** Orphan-file sweep under `data/`. Small tables walk driver-side (a
      * Spark job costs more than the walk); above `auto`'s threshold — the
      * 100 TB envelope, where the tree holds millions of files — the listing
      * AND deletion run as ONE Spark job with a task per snapshot data dir:
      * executors list + delete against shared storage and report (removed,
      * kept) counts, the driver never materializes the file tree. Dirs left
      * with zero files are pruned driver-side from the per-task counts.
      * Override with -Dgraft.vacuum.distributed=always|never. */
    private def sweepOrphans(referenced: Set[String]): Int = {
      val snapDirs: Seq[String] = {
        val s = Files.list(dataDir)
        try s.toArray.map(_.asInstanceOf[Path]).filter(Files.isDirectory(_)).map(_.toString).toSeq
        finally s.close()
      }
      val mode = System.getProperty("graft.vacuum.distributed", "auto")
      val useSpark = snapDirs.nonEmpty &&
        (mode == "always" || (mode == "auto" && referenced.size >= 65536))
      if (!useSpark) {
        var removed = 0
        listParquet(dataDir).foreach { p =>
          val rel = Paths.get(root).relativize(p).toString
          if (!referenced(rel)) { Files.deleteIfExists(p); removed += 1 }
        }
        // prune now-empty snapshot data dirs
        val ds = Files.list(dataDir)
        try ds.forEach { d =>
          if (Files.isDirectory(d)) {
            val probe = Files.walk(d)
            val empty = try !probe.anyMatch(f => Files.isRegularFile(f)) finally probe.close()
            if (empty) deleteTree(d)
          }
        } finally ds.close()
        removed
      } else {
        val rootStr = root
        // Ship each task ONLY its snapshot dir's referenced subset, carried
        // in the task's own input partition: data paths are
        // `data/<snapshotDir>/_b=<n>/...`, so the referenced set partitions
        // cleanly by its second path segment. The driver already holds the
        // full set (it derived it from the kept snapshots' manifests), but
        // no executor ever receives more than its dirs' slices — the old
        // full-set broadcast put a multi-hundred-MB object on EVERY executor
        // at the 10M-file envelope.
        val refsByDir: Map[String, Seq[String]] = referenced.toSeq.groupBy { rel =>
          val p = Paths.get(rel)
          if (p.getNameCount >= 2) dataDir.resolve(p.getName(1).toString).toString
          else rootStr // malformed ref: grouped away from every real dir
        }
        val perDirInput = snapDirs.map(d => (d, refsByDir.getOrElse(d, Nil)))
        Vacuum.lastMaxTaskRefs.set(
          if (perDirInput.isEmpty) 0 else perDirInput.map(_._2.size).max)
        val perDir = spark.sparkContext
          .parallelize(perDirInput, math.max(1, math.min(snapDirs.size, 64)))
          .map { case (dirStr, refSeq) =>
            val refs = refSeq.toSet
            val dir = Paths.get(dirStr)
            var removed = 0; var kept = 0
            val s = Files.walk(dir)
            try s.forEach { p =>
              if (Files.isRegularFile(p)) {
                val rel = Paths.get(rootStr).relativize(p).toString
                if (p.toString.endsWith(".parquet") && !refs.contains(rel)) {
                  Files.deleteIfExists(p); removed += 1
                } else kept += 1 // referenced parquet OR any non-parquet file
                  // (in-flight _temporary trees, markers): dir must survive,
                  // same contract as the sequential sweep
              }
            } finally s.close()
            (dirStr, removed, kept)
          }.collect()
        perDir.filter(_._3 == 0).foreach { case (d, _, _) => deleteTree(Paths.get(d)) }
        perDir.map(_._2).sum
      }
    }

    private def deleteTree(d: Path): Unit = {
      val w = Files.walk(d)
      try w.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(x => Files.deleteIfExists(x))
      finally w.close()
    }
  }
}
