package graft.sql

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.lake

/** SQL maintenance entry points (Spark 4 `ProcedureCatalog` / `CALL`):
  *
  * {{{
  *   CALL g.system.compact(`table` => 'db.t')               -- small-file fold
  *   CALL g.system.compact_deltas(`table` => 'db.t')        -- MoR delta fold
  *   CALL g.system.vacuum(`table` => 'db.t', keep_snapshots => 3)
  *   CALL g.system.expire_snapshots(`table` => 'db.t', older_than_hours => 168)
  *   CALL g.system.rebucket(`table` => 'db.t', buckets => 256)
  * }}}
  *
  * Thin lowering onto the engine's programmatic maintenance ops
  * (`LakeTable.compact` / `compactDeltas` / `vacuum` / `rebucket`) so a
  * SQL-only operator can run the table lifecycle without touching the Scala
  * API — the Iceberg `CALL cat.system.*` surface re-expressed over our
  * snapshot format. Each call returns a one-row result set describing what
  * it did (buckets folded, manifests/files removed), built as a
  * [[LocalScan]]: the counts are driver-side scalars the maintenance op
  * already computed, so a distributed result scan would be pure overhead.
  *
  * Reference analog: the reference schedules maintenance outside the engine
  * entirely (Databricks-managed OPTIMIZE/VACUUM, per its Delta delegation);
  * here the lake format is ours, so the lifecycle surface must be too.
  */
object GraftProcedures {

  /** Procedure names under the `system` namespace, in SHOW PROCEDURES order. */
  val names: Seq[String] =
    Seq("compact", "compact_deltas", "vacuum", "expire_snapshots", "rebucket", "cluster")

  def load(name: String, resolve: String => lake.LakeTable): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "compact" => Some(new GraftProcedure("compact",
        "Fold each bucket's small base files into one file per bucket (logical no-op)",
        Seq(param("table", StringType, None, "lake table, e.g. 'db.t'"),
          param("min_files", IntegerType, Some("2"), "only fold buckets with at least this many files")),
        StructType(Seq(StructField("buckets_compacted", IntegerType, nullable = false))),
        { (in, res) =>
          val n = res(in.getUTF8String(0).toString).compact(minFiles = in.getInt(1))
          Array[Any](n)
        }, resolve))
      case "compact_deltas" => Some(new GraftProcedure("compact_deltas",
        "Fold outstanding MoR delta files into their bucket base files",
        Seq(param("table", StringType, None, "lake table, e.g. 'db.t'")),
        StructType(Seq(StructField("buckets_folded", IntegerType, nullable = false))),
        { (in, res) =>
          Array[Any](res(in.getUTF8String(0).toString).compactDeltas())
        }, resolve))
      case "vacuum" => Some(new GraftProcedure("vacuum",
        "Drop all but the newest keep_snapshots snapshots and sweep unreferenced data files",
        Seq(param("table", StringType, None, "lake table, e.g. 'db.t'"),
          param("keep_snapshots", IntegerType, Some("1"), "retained snapshot count (min 1)")),
        StructType(Seq(StructField("manifests_removed", IntegerType, nullable = false),
          StructField("files_removed", IntegerType, nullable = false))),
        { (in, res) =>
          val (m, f) = res(in.getUTF8String(0).toString).vacuum(keepSnapshots = in.getInt(1))
          Array[Any](m, f)
        }, resolve))
      case "expire_snapshots" => Some(new GraftProcedure("expire_snapshots",
        "Drop snapshots whose commit time is older than older_than_hours, then sweep orphans",
        Seq(param("table", StringType, None, "lake table, e.g. 'db.t'"),
          param("older_than_hours", IntegerType, None, "age-based retention window")),
        StructType(Seq(StructField("manifests_removed", IntegerType, nullable = false),
          StructField("files_removed", IntegerType, nullable = false))),
        { (in, res) =>
          val (m, f) = res(in.getUTF8String(0).toString)
            .vacuum(java.time.Duration.ofHours(in.getInt(1).toLong))
          Array[Any](m, f)
        }, resolve))
      case "rebucket" => Some(new GraftProcedure("rebucket",
        "Rewrite the table under a new hash-bucket count (fenced full CoW rewrite)",
        Seq(param("table", StringType, None, "lake table, e.g. 'db.t'"),
          param("buckets", IntegerType, None, "new bucket count (power of two recommended)")),
        StructType(Seq(StructField("new_version", LongType, nullable = false),
          StructField("buckets", IntegerType, nullable = false))),
        { (in, res) =>
          val t = res(in.getUTF8String(0).toString)
          val v = t.rebucket(in.getInt(1))
          Array[Any](v, in.getInt(1))
        }, resolve))
      case "cluster" => Some(new GraftProcedure("cluster",
        "Rewrite each bucket sorted by the given columns, split into bounded files " +
          "(logical no-op; makes non-key range predicates skip files)",
        Seq(param("table", StringType, None, "lake table, e.g. 'db.t'"),
          param("sort_by", StringType, None, "comma-separated sort columns"),
          param("max_rows_per_file", LongType, Some(s"${1L << 20}"),
            "row cap per rewritten file")),
        StructType(Seq(StructField("new_version", LongType, nullable = false))),
        { (in, res) =>
          val t = res(in.getUTF8String(0).toString)
          val cols = in.getUTF8String(1).toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          Array[Any](t.cluster(cols, in.getLong(2)))
        }, resolve))
      case _ => None
    }

  private def param(name: String, dt: DataType, default: Option[String],
      comment: String): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt).comment(comment)
    default.foreach(b.defaultValue)
    b.build()
  }
}

/** One maintenance procedure: already bound at construction (the parameter
  * list is static — `bind` just validates arity and returns `this`). `body`
  * receives the aligned argument row and the catalog's table resolver and
  * returns the single result row's values. */
private[sql] class GraftProcedure(procName: String, desc: String,
    params: Seq[ProcedureParameter], resultSchema: StructType,
    body: (InternalRow, String => lake.LakeTable) => Array[Any],
    resolve: String => lake.LakeTable)
  extends UnboundProcedure with BoundProcedure {

  override def name(): String = procName
  override def description(): String = desc
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray

  // Maintenance mutates table state; never allow the optimizer to collapse
  // or re-invoke the call.
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): JIterator[Scan] = {
    val values = body(input, resolve).map {
      case s: String => UTF8String.fromString(s)
      case other => other.asInstanceOf[AnyRef]
    }
    val row: InternalRow = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = resultSchema
      override def rows(): Array[InternalRow] = Array(row)
      override def description(): String = s"graft.system.$procName result"
    }
    java.util.Collections.singletonList(scan).iterator()
  }
}
