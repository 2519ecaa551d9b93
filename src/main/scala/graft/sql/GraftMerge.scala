package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.command.RunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** SQL `MERGE INTO` against GraftLake tables, through Catalyst.
  *
  * Spark's own row-level-operation rewrite requires a full DSv2 write stack
  * (`SupportsRowLevelOperations` + executor-side `BatchWrite`), and throws
  * for any other table. This rule intercepts the logical `MergeIntoTable`
  * BEFORE that rewrite (both live in the analyzer's Resolution batch; this
  * one matches the still-unaligned form, which the built-in ignores) and
  * lowers it onto the engine's own CDC-apply kernel — `LakeTable.merge`'s
  * fused dedup + copy-on-write merge + atomic snapshot commit.
  *
  * Supported MERGE shape = the reference DeltaWriter contract
  * (/root/reference/src/models/writer.py:22-67: PK-equality condition built
  * from the table's primary key, whenMatchedUpdateAll / whenNotMatchedInsertAll,
  * plus this engine's delete extension):
  *
  * {{{
  *   MERGE INTO g.db.t t USING src s
  *   ON t.k1 = s.k1 AND t.k2 = s.k2          -- exactly the table's PK
  *   [WHEN MATCHED AND <cond-over-s> THEN DELETE]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED [AND <cond-over-s>] THEN INSERT *
  * }}}
  *
  * The leg conditions must reference SOURCE columns only (the CDC shape —
  * e.g. `s.op = 'delete'`); target-side or unqualified references fall
  * through rather than silently rebinding. ANSI matched/not-matched
  * semantics are preserved: the DELETE leg applies only to keys PRESENT in
  * the target (a source "delete" for an absent key falls to the NOT MATCHED
  * leg and inserts unless the insert condition excludes it — write
  * `WHEN NOT MATCHED AND s.op <> 'delete' THEN INSERT *` for tombstone
  * streams).
  *
  * Any other form (partial SET lists, non-PK or tautological conditions,
  * NOT MATCHED BY SOURCE) falls through to Spark's built-in path, whose
  * error message names the unsupported feature. Register via
  * `spark.sql.extensions = graft.sql.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => GraftMergeRewrite)
    // NOTE: the stats rule (GraftStats.scala) is NOT injectable here — every
    // SparkSessionExtensions optimizer hook (incl. injectPreCBORule, which
    // despite the name runs in a batch BEFORE "Early Filter and Projection
    // Push-Down") precedes V2ScanRelationPushDown, i.e. runs before the
    // V1ScanWrapper it must rewrite exists. GraftCatalog.initialize registers
    // it via experimental.extraOptimizations ("User Provided Optimizers",
    // the one post-pushdown logical batch).
  }
}

object GraftMergeRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m @ MergeIntoTable(target, source, cond, matched, notMatched, notMatchedBySource, _)
        if source.resolved && notMatchedBySource.isEmpty =>
      graftTarget(target) match {
        case Some(gt) =>
          val keys = gt.table.snapshot.keyColumns
          (keyEquality(cond, keys), classify(matched), classifyInsert(notMatched)) match {
            case (true, Some(deleteCond), Some(insertCond))
                if deleteCond.forall(sourceOnly(_, source)) &&
                  insertCond.forall(sourceOnly(_, source)) =>
              GraftMergeCommand(gt, source, deleteCond, insertCond)
            case _ => m // unsupported shape: let Spark's path report it
          }
        case None => m
      }

    // SQL DELETE FROM / UPDATE: row-level ops other than MERGE, lowered onto
    // the same tombstone merge kernel (LakeTable.merge). Supported shape =
    // a predicate over the target's own columns, no subqueries; UPDATE
    // additionally requires top-level column assignments that leave the
    // primary key untouched (a keyed merge can't express a PK rewrite).
    // Anything else falls through to Spark's UNSUPPORTED_FEATURE error.
    case d @ DeleteFromTable(target, cond) if noSubquery(cond) =>
      graftTarget(target) match {
        case Some(gt) => GraftDeleteCommand(gt, cond)
        case None => d
      }
    case u @ UpdateTable(target, assignments, cond) if cond.forall(noSubquery) =>
      graftTarget(target) match {
        case Some(gt) =>
          val snap = gt.table.snapshot
          val keys = snap.keyColumns.map(_.toLowerCase).toSet
          // assignment keys must name REAL non-key columns: an unknown name
          // must keep Spark's unresolved-column error, never lower into a
          // command that would silently drop the assignment
          val columns = snap.schema.fieldNames.map(_.toLowerCase).toSet
          val named = assignments.map(a => nameOf(a.key).map(_ -> a.value))
          if (named.exists(_.isEmpty) ||
              named.flatten.exists { case (k, _) => keys(k) || !columns(k) } ||
              assignments.exists(a => !noSubquery(a.value))) u // fall through
          else GraftUpdateCommand(gt, named.flatten, cond)
        case None => u
      }
  }

  private def graftTarget(target: LogicalPlan): Option[GraftTable] =
    EliminateSubqueryAliases(target) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some(r.table.asInstanceOf[GraftTable])
      case _ => None
    }

  private def noSubquery(e: Expression): Boolean =
    !e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])

  /** The leg conditions may reference SOURCE columns only: every resolved
    * attribute must come from the source's output, and every unresolved one
    * must be qualified with the source's alias. Target-side or unqualified
    * references make the shape unsupported — falling through to Spark's
    * error beats silently rebinding `t.x` to the source's same-named
    * column. */
  private def sourceOnly(cond: Expression, source: LogicalPlan): Boolean = {
    val srcAlias = source match {
      case SubqueryAlias(id, _) => Some(id.name.toLowerCase)
      case _ => None
    }
    def ok(e: Expression): Boolean = e match {
      case u: UnresolvedAttribute =>
        u.nameParts.length > 1 && srcAlias.contains(u.nameParts.head.toLowerCase)
      case a: AttributeReference => source.outputSet.contains(a)
      case other => other.children.forall(ok)
    }
    ok(cond)
  }

  /** cond must be a conjunction of column equalities covering EXACTLY the
    * table's key set, with the two sides of each equality provably coming
    * from DIFFERENT relations (distinct qualifiers pre-resolution, distinct
    * exprIds post-resolution) — otherwise `t.k = t.k`-style tautologies
    * would lower to a PK merge while meaning something entirely different.
    * Name-based because the rule runs before full resolution. */
  private def keyEquality(cond: Expression, keys: Seq[String]): Boolean = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    // (column name, relation tag) — tag is the qualifier or the exprId
    def side(e: Expression): Option[(String, String)] = e match {
      case u: UnresolvedAttribute if u.nameParts.length > 1 =>
        Some(u.nameParts.last.toLowerCase -> u.nameParts.init.mkString(".").toLowerCase)
      case a: AttributeReference => Some(a.name.toLowerCase -> s"#${a.exprId.id}")
      case _ => None
    }
    val pairs = split(cond).map {
      case EqualTo(l, r) =>
        (side(l), side(r)) match {
          case (Some((a, qa)), Some((b, qb))) if a == b && qa != qb => Some(a)
          case _ => None
        }
      case _ => None
    }
    pairs.forall(_.isDefined) && pairs.flatten.toSet == keys.map(_.toLowerCase).toSet
  }

  private def nameOf(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.nameParts.last.toLowerCase)
    case a: AttributeReference => Some(a.name.toLowerCase)
    case c: org.apache.spark.sql.catalyst.expressions.Cast => nameOf(c.child)
    case _ => None
  }

  /** `SET *` / `INSERT *` reach this rule either still as star actions or
    * already expanded by ResolveReferences into identity assignment lists
    * (t.col := s.col for every column) — accept both spellings. */
  private def isIdentity(assigns: Seq[Assignment]): Boolean =
    assigns.nonEmpty && assigns.forall { a =>
      (nameOf(a.key), nameOf(a.value)) match {
        case (Some(k), Some(v)) => k == v
        case _ => false
      }
    }

  private def isUpdateAll(a: MergeAction): Boolean = a match {
    case UpdateStarAction(None) => true
    case UpdateAction(None, assigns, _) => isIdentity(assigns)
    case _ => false
  }

  /** matched actions: one unconditional UPDATE SET * and at most one DELETE
    * (its condition, over source columns, becomes the op discriminator).
    * Returns None when the shape is unsupported. */
  private def classify(matched: Seq[MergeAction]): Option[Option[Expression]] = matched match {
    case Seq(u) if isUpdateAll(u) => Some(None)
    case Seq(DeleteAction(c), u) if isUpdateAll(u) =>
      Some(Some(c.getOrElse(Bridge.expression(lit(true)))))
    case Seq(u, DeleteAction(c)) if isUpdateAll(u) =>
      Some(Some(c.getOrElse(Bridge.expression(lit(false)))))
    case _ => None
  }

  /** not-matched actions: one INSERT * with an optional (source-only)
    * condition. Some(None) = unconditional, Some(Some(c)) = conditional,
    * None = unsupported shape. */
  private def classifyInsert(notMatched: Seq[MergeAction]): Option[Option[Expression]] =
    notMatched match {
      case Seq(InsertStarAction(c)) => Some(c)
      case Seq(InsertAction(c, assigns)) if isIdentity(assigns) => Some(c)
      case _ => None
    }
}

/** The lowered command: executes the source plan, shapes it into a change
  * batch (op derived from the DELETE condition, ANSI matched-ness decided by
  * a key-pruned join against the target; all events at one ad-hoc LSN above
  * the table's committed high-watermark) and applies it through
  * `LakeTable.merge` — dedup + CoW merge + epoch-fence-preserving commit,
  * the same kernel every other ingest path uses. */
object GraftMergeCommand {
  /** Observability/test hook: (files read by the last matched-ness probe,
    * total files in that snapshot) — proves the probe prunes to the source
    * batch's buckets instead of scanning the table. */
  val lastProbe =
    new java.util.concurrent.atomic.AtomicReference[Option[(Int, Int)]](None)
}

case class GraftMergeCommand(
    @transient graftTable: GraftTable,
    source: LogicalPlan,
    deleteCondition: Option[Expression],
    insertCondition: Option[Expression]) extends RunnableCommand {

  override def children: Seq[LogicalPlan] = Seq(source)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): GraftMergeCommand =
    copy(source = newChildren.head)

  override def run(session: SparkSession): Seq[Row] = {
    val table = graftTable.table
    val snap = table.snapshot
    // the source plan is consumed several times (bucket probe, merge stats
    // pre-pass, write job); persist it so it EXECUTES once — besides the
    // obvious cost win, a non-deterministic source (rand()/LIMIT/sampling)
    // re-executed per consumer could yield a probe bucket set that doesn't
    // cover the keys the join later sees. MERGE sources are batch-sized by
    // contract, so the cache is bounded.
    val src = Bridge.ofRows(session, source)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runWith(session, src, table, snap)
    finally { src.unpersist(blocking = false); () }
  }

  private def runWith(session: SparkSession, src: org.apache.spark.sql.DataFrame,
      table: graft.cdc.lake.LakeTable, snap: graft.cdc.lake.Snapshot): Seq[Row] = {
    // leg conditions are source-only by the rule's contract; rebind them
    // against the source DataFrame by name (qualifiers stripped)
    def byName(c: Expression): org.apache.spark.sql.Column = GraftRowLevel.byName(c)
    val keys = snap.keyColumns
    // ANSI matched-ness: the DELETE leg fires only for keys PRESENT in the
    // target, the insert condition only gates ABSENT ones. One key- AND
    // bucket-pruned left join against the target's key columns (unique by
    // the merge invariant) decides per source row; skipped entirely when
    // both legs are unconditional (then MERGE ≡ plain upsert and
    // matched-ness is irrelevant). The flag column name is salted so a
    // source that legitimately carries a `_matched` column can never make
    // the join ambiguous or rebind the coalesce.
    val needMatch = deleteCondition.isDefined || insertCondition.isDefined
    val matchedCol = s"_matched_${java.util.UUID.randomUUID().toString.take(8)}"
    val flagged =
      if (!needMatch) src.withColumn(matchedCol, lit(true))
      else {
        // prune the probe to the buckets the source batch touches: one
        // narrow pre-pass over the source's (cast) key columns yields the
        // bucket set, and only those buckets' key columns are read — at the
        // 100 TB envelope a sparse MERGE batch probes a few buckets' files,
        // never the whole table. (The source plan runs once more here; a
        // MERGE source is batch-sized by contract, the target is not.)
        val keyTypes = snap.schema.fields
          .map(f => f.name.toLowerCase -> f.dataType).toMap
        val castKeys = keys.map(k =>
          keyTypes.get(k.toLowerCase).map(col(k).cast(_)).getOrElse(col(k)).as(k))
        val touched = src.select(castKeys: _*)
          .select(table.bucketExpr(snap).as("_b")).distinct()
          .collect().map(_.getInt(0)).toSet
        val probeFiles = table.filesOfBuckets(snap, Some(touched))
        // total file count from the refs alone (zero manifest reads — the
        // observability hook must not pay the O(all buckets) cost the
        // pruned probe exists to avoid)
        GraftMergeCommand.lastProbe.set(Some(
          (probeFiles.size, snap.files.size + snap.manifests.map(_.numFiles).sum)))
        val tgtKeys = table.readBuckets(snap, Some(touched))
          .select(keys.map(col): _*).withColumn(matchedCol, lit(true))
        src.join(tgtKeys, keys, "left")
          .withColumn(matchedCol, coalesce(col(matchedCol), lit(false)))
      }
    val delC = deleteCondition.map(byName).getOrElse(lit(false))
    val insC = insertCondition.map(byName).getOrElse(lit(true))
    // matched rows always participate (update or delete); unmatched rows
    // only when the insert condition admits them
    val kept = flagged.filter(col(matchedCol) || insC)
    val opCol = when(col(matchedCol) && delC, "D").otherwise("U")
    // all rows of one SQL MERGE share one LSN above the committed
    // watermark: by the Snapshot.lsnHigh invariant every stored row _lsn
    // is <= lsnHigh, so lsnHigh + 1 outranks every existing row and the
    // batch wins per key (multiple source rows per key is undefined under
    // SQL MERGE anyway).
    //
    // CONTRACT (mixing ad-hoc SQL with a live binlog tail): this stamp
    // extends the table's LSN domain past the upstream binlog position, so a
    // later CDC epoch whose genuine events carry exactly these next
    // positions would tie the ad-hoc rows instead of outranking them. A
    // binlog tail that interleaves with ad-hoc row-level SQL must therefore
    // keep its LSNs ABOVE the table's lsnHigh (re-read it after ad-hoc
    // writes) — the same "one log, one ordering" rule every LSN-resolved
    // store imposes. Stamping ad-hoc writes in a disjoint high range was
    // considered and rejected: rows parked at 2^62 would outrank every
    // FUTURE genuine event, silently freezing those keys.
    val lsn = math.max(snap.lsnHigh, 0L) + 1L
    val payload = snap.schema.fieldNames.toSeq
    val batch = kept.select(
      (Seq(lit(lsn).as("lsn"), opCol.as("op")) ++ payload.map(col)): _*)
    table.merge(batch, epochId = -1L)
    Nil
  }
}

private[sql] object GraftRowLevel {
  /** Rebind an expression against a FRESH DataFrame of the target by NAME
    * (qualifiers stripped): the rewrite rules match before full resolution,
    * so attributes may be unresolved or bound to the V2 relation the lowered
    * command no longer uses. A name that doesn't exist on the target then
    * fails resolution with Spark's standard unresolved-column error. */
  def byName(e: Expression): org.apache.spark.sql.Column = Bridge.column(e.transformUp {
    case u: UnresolvedAttribute => UnresolvedAttribute(Seq(u.nameParts.last))
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  })
}

/** SQL `DELETE FROM` lowered onto the tombstone merge kernel: target rows
  * matching the predicate re-emit as op='D' change events at one ad-hoc LSN
  * above the committed high-watermark, applied through [[graft.cdc.lake]]'s
  * `LakeTable.merge` — the same fenced CoW kernel as every other write.
  * Scale shape: the predicate pushes into the target's parquet scan, and the
  * merge's sparse path rewrites only the buckets holding matching keys. */
case class GraftDeleteCommand(
    @transient graftTable: GraftTable,
    condition: Expression) extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val table = graftTable.table
    val snap = table.snapshot
    val lsn = math.max(snap.lsnHigh, 0L) + 1L
    val payload = snap.schema.fieldNames.toSeq
    val batch = table.readBuckets(snap, None)
      .filter(GraftRowLevel.byName(condition))
      .select((Seq(lit(lsn).as("lsn"), lit("D").as("op")) ++ payload.map(col)): _*)
    table.merge(batch, epochId = -1L)
    Nil
  }
}

/** SQL `UPDATE` lowered onto the merge kernel: matching target rows re-emit
  * as op='U' events with the SET assignments applied (primary-key columns
  * are never assignable — the rewrite rule falls through to Spark's error
  * for those). Same scan/rewrite scale shape as [[GraftDeleteCommand]]. */
case class GraftUpdateCommand(
    @transient graftTable: GraftTable,
    assignments: Seq[(String, Expression)],
    condition: Option[Expression]) extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val table = graftTable.table
    val snap = table.snapshot
    val lsn = math.max(snap.lsnHigh, 0L) + 1L
    val assigned = assignments.map { case (k, v) => k -> GraftRowLevel.byName(v) }.toMap
    val rows0 = table.readBuckets(snap, None)
    val rows = condition.map(c => rows0.filter(GraftRowLevel.byName(c))).getOrElse(rows0)
    val batch = rows.select((Seq(lit(lsn).as("lsn"), lit("U").as("op")) ++
      snap.schema.fields.toSeq.map { f =>
        assigned.get(f.name.toLowerCase)
          .map(_.cast(f.dataType).as(f.name)).getOrElse(col(f.name))
      }): _*)
    table.merge(batch, epochId = -1L)
    Nil
  }
}
