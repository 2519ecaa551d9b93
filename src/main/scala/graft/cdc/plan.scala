package graft.cdc

import org.apache.spark.sql.types._

import graft.cdc.model._

/** Declarative schema-sync engine: snapshot -> plan -> validate -> execute
  * ("terraform for tables"), re-expressed from the reference's delta_engine
  * (/root/reference/src/delta_engine/orchestrate/orchestrator.py:51-66,
  * compile/planner.py:35-134, validation/rules.py:90-305, actions.py:18-147).
  *
  * The planner REPRESENTS the reference's full action vocabulary — including
  * non-additive ones (column drops, NOT NULL tightening, PK changes) — and
  * the validator REFUSES the unsafe ones, exactly like the reference refuses
  * rather than silently ignoring them. Execution is restricted to the
  * additive evolutions the north rule allows plus metadata-only changes
  * (properties, comments, nullability loosening).
  *
  * The planner is pure and idempotent: planning against a state the plan was
  * just applied to yields an empty plan (property-tested).
  */
object plan {

  sealed trait SchemaAction { def table: String }
  final case class CreateTable(table: String, definition: TableDef) extends SchemaAction
  final case class AddColumn(table: String, column: ColumnDef) extends SchemaAction
  final case class WidenType(table: String, column: String, from: DataType, to: DataType) extends SchemaAction
  final case class DropColumn(table: String, column: String) extends SchemaAction
  /** makeNullable = true is DROP NOT NULL (safe); false is SET NOT NULL (refused). */
  final case class NullabilityChange(table: String, column: String, makeNullable: Boolean) extends SchemaAction
  final case class SetColumnComments(table: String, comments: Map[String, String]) extends SchemaAction
  final case class SetTableComment(table: String, comment: String) extends SchemaAction
  final case class SetProperties(table: String, properties: Map[String, String]) extends SchemaAction
  final case class PrimaryKeyAdd(table: String, name: String, columns: Seq[String]) extends SchemaAction
  final case class PrimaryKeyDrop(table: String, name: String) extends SchemaAction

  final case class AlignTable(table: String, actions: Seq[SchemaAction])
  final case class TablePlan(creates: Seq[CreateTable], aligns: Seq[AlignTable]) {
    def isEmpty: Boolean = creates.isEmpty && aligns.isEmpty
  }

  final class InvalidModelError(msg: String) extends RuntimeException(msg)
  final class UnsafePlanError(msg: String) extends RuntimeException(msg)

  object Planner {
    /** Diff desired models vs observed states (reference: planner.py:35-134).
      * Per-align action order mirrors the reference executor's deterministic
      * order: drop-PK, add-cols, widen, drop-cols, nullability, add-PK,
      * comments, table comment, properties. */
    def plan(desired: Seq[TableDef], observed: Seq[TableState]): TablePlan = {
      val byName = observed.map(s => s.name -> s).toMap
      val creates = Seq.newBuilder[CreateTable]
      val aligns = Seq.newBuilder[AlignTable]
      desired.foreach { d =>
        byName.get(d.name).filter(_.exists) match {
          case None => creates += CreateTable(d.name, d)
          case Some(state) =>
            val actions = diff(d, state)
            if (actions.nonEmpty) aligns += AlignTable(d.name, actions)
        }
      }
      TablePlan(creates.result(), aligns.result())
    }

    private def diff(d: TableDef, s: TableState): Seq[SchemaAction] = {
      val have = s.schema.fields.map(f => f.name -> f).toMap
      val desiredNames = d.columns.map(_.name).toSet

      val adds = d.columns.filterNot(c => have.contains(c.name)).map(c => AddColumn(d.name, c))
      val widens = d.columns.flatMap { c =>
        have.get(c.name).filter(_.dataType != c.dataType)
          .map(f => WidenType(d.name, c.name, f.dataType, c.dataType))
      }
      val drops = s.schema.fields.toSeq.filterNot(f => desiredNames(f.name))
        .map(f => DropColumn(d.name, f.name))
      val nullability = d.columns.flatMap { c =>
        have.get(c.name).filter(_.nullable != c.nullable)
          .map(_ => NullabilityChange(d.name, c.name, makeNullable = c.nullable))
      }
      val commentDiff = d.columns.flatMap { c =>
        have.get(c.name).filter(f => f.getComment().getOrElse("") != c.comment)
          .map(_ => c.name -> c.comment)
      }.toMap
      val comments = if (commentDiff.nonEmpty) Seq(SetColumnComments(d.name, commentDiff)) else Nil
      val tblComment = if (d.comment != s.tableComment) Seq(SetTableComment(d.name, d.comment)) else Nil
      val propDiff = d.properties.filter { case (k, v) => !s.properties.get(k).contains(v) }
      val props = if (propDiff.nonEmpty) Seq(SetProperties(d.name, propDiff)) else Nil
      val (pkDrop, pkAdd) =
        if (d.primaryKey == s.primaryKey) (Nil, Nil)
        else (
          if (s.primaryKey.nonEmpty)
            Seq(PrimaryKeyDrop(d.name, naming.primaryKeyName(d.name, s.primaryKey))) else Nil,
          if (d.primaryKey.nonEmpty)
            Seq(PrimaryKeyAdd(d.name, naming.primaryKeyName(d.name, d.primaryKey), d.primaryKey)) else Nil)

      pkDrop ++ adds ++ widens ++ drops ++ nullability ++ pkAdd ++ comments ++ tblComment ++ props
    }
  }

  object Validator {
    /** Model rules (reference: rules.py "model" family). */
    def validateModels(desired: Seq[TableDef]): Unit = {
      desired.foreach { d =>
        if (d.columns.isEmpty) throw new InvalidModelError(s"table ${d.name}: no columns")
        if (d.primaryKey.nonEmpty && d.columns.exists(c => c.isPrimaryKey && c.nullable))
          throw new InvalidModelError(s"table ${d.name}: primary-key columns must be NOT NULL")
      }
      val dups = desired.groupBy(_.name).collect { case (n, ts) if ts.size > 1 => n }
      if (dups.nonEmpty) throw new InvalidModelError(s"duplicate table models: ${dups.mkString(",")}")
    }

    /** Plan-safety rules (reference: rules.py "plan" family — NoAddNotNull at
      * rules.py:90-107; drops/tightening/PK-changes are REFUSED here rather
      * than silently unplanned, mirroring the reference's refuse-not-rewrite
      * philosophy; widening-only is our addition for the north rule). */
    def validatePlan(p: TablePlan, observed: Seq[TableState]): Unit = {
      p.aligns.foreach { a =>
        a.actions.foreach {
          case AddColumn(t, c) if !c.nullable =>
            throw new UnsafePlanError(
              s"[NoAddNotNullColumns] $t: adding NOT NULL column '${c.name}' to an existing table")
          case WidenType(t, c, from, to) if !SchemaRegistry.isWidening(from, to) =>
            throw new UnsafePlanError(
              s"[WideningOnly] $t: '$c' ${from.simpleString} -> ${to.simpleString} is a narrowing/incompatible change")
          case DropColumn(t, c) =>
            throw new UnsafePlanError(
              s"[NoDropColumns] $t: dropping column '$c' is not additive (remove it from the model or rebuild)")
          case NullabilityChange(t, c, makeNullable) if !makeNullable =>
            throw new UnsafePlanError(
              s"[NoTightenNullability] $t: setting '$c' NOT NULL on an existing table is unsafe")
          case PrimaryKeyAdd(t, name, _) =>
            throw new UnsafePlanError(
              s"[NoPrimaryKeyChange] $t: adding primary key '$name' requires a bucket rebuild — not additive")
          case PrimaryKeyDrop(t, name) =>
            throw new UnsafePlanError(
              s"[NoPrimaryKeyChange] $t: dropping primary key '$name' requires a bucket rebuild — not additive")
          case _ => ()
        }
      }
    }
  }

  object Executor {
    import graft.cdc.lake._

    /** Apply a validated plan to lake tables rooted under `warehouseDir`.
      * Creates are idempotent; adds/widens become metadata-only schema-
      * evolution commits (no data rewrite — old files conform on read);
      * nullability-loosening and comments amend the current schema version in
      * place; table comment and properties are metadata-property commits. */
    def apply(spark: org.apache.spark.sql.SparkSession, warehouseDir: String, p: TablePlan): Unit = {
      p.creates.foreach { c =>
        val props = c.definition.properties ++
          (if (c.definition.comment.nonEmpty) Map("comment" -> c.definition.comment) else Map.empty)
        LakeTable.createIfNotExists(spark, s"$warehouseDir/${c.table}", c.table,
          c.definition.schema, c.definition.primaryKey, c.definition.numBuckets, props)
      }
      p.aligns.foreach { a =>
        val t = LakeTable.load(spark, s"$warehouseDir/${a.table}", a.table)

        // 1. additive column changes -> one new schema version
        val cur = t.snapshot
        var fields = cur.schema.fields.toVector
        a.actions.foreach {
          case AddColumn(_, c) => fields = fields :+ c.structField
          case WidenType(_, name, _, to) =>
            fields = fields.map(f => if (f.name == name) f.copy(dataType = to) else f)
          case _ => ()
        }
        if (fields != cur.schema.fields.toVector) t.evolveSchema(StructType(fields))

        // 2. metadata-only amendments of the (possibly new) current version
        val snap2 = t.snapshot
        var amended = snap2.schema.fields.toVector
        a.actions.foreach {
          case NullabilityChange(_, name, makeNullable) if makeNullable =>
            amended = amended.map(f => if (f.name == name) f.copy(nullable = true) else f)
          case SetColumnComments(_, comments) =>
            amended = amended.map(f =>
              comments.get(f.name).map(c => f.withComment(c)).getOrElse(f))
          case _ => ()
        }
        if (amended != snap2.schema.fields.toVector) t.amendSchema(StructType(amended))

        // 3. table comment + properties
        val props = a.actions.collect {
          case SetProperties(_, ps) => ps
          case SetTableComment(_, c) => Map("comment" -> c)
        }.foldLeft(Map.empty[String, String])(_ ++ _)
        if (props.nonEmpty) t.setProperties(props)
      }
    }
  }

  /** Observed state of a lake table for the planner (reference CatalogReader,
    * /root/reference/src/delta_engine/state/catalog_reader.py:34-72). The
    * table comment round-trips through the reserved 'comment' property. */
  object StateReader {
    import graft.cdc.lake._
    def read(spark: org.apache.spark.sql.SparkSession, warehouseDir: String, name: String): TableState = {
      val root = s"$warehouseDir/$name"
      if (!LakeTable.exists(root)) TableState(name, exists = false, StructType(Nil), Nil, Map.empty)
      else {
        val s = LakeTable.load(spark, root, name).snapshot
        TableState(name, exists = true, s.schema, s.keyColumns,
          s.properties - "comment", s.properties.getOrElse("comment", ""))
      }
    }
  }

  /** Fail-fast composition of the four stages (reference Orchestrator,
    * orchestrator.py:51-66). Stage functions are injectable for call-order
    * testing, like the reference's constructor-injected fakes. */
  final class Orchestrator(
      spark: org.apache.spark.sql.SparkSession,
      warehouseDir: String,
      reader: (org.apache.spark.sql.SparkSession, String, String) => TableState = StateReader.read,
      planner: (Seq[TableDef], Seq[TableState]) => TablePlan = Planner.plan,
      modelValidator: Seq[TableDef] => Unit = Validator.validateModels,
      planValidator: (TablePlan, Seq[TableState]) => Unit = Validator.validatePlan,
      executor: (org.apache.spark.sql.SparkSession, String, TablePlan) => Unit = Executor.apply) {

    /** snapshot -> plan -> validate -> execute; validation errors bubble up
      * BEFORE any execution side effect. Returns the executed plan. */
    def syncTables(desired: Seq[TableDef]): TablePlan = {
      modelValidator(desired)
      val observed = desired.map(d => reader(spark, warehouseDir, d.name))
      val p = planner(desired, observed)
      planValidator(p, observed)
      executor(spark, warehouseDir, p)
      p
    }
  }

  /** DDL discovery runner analog (reference: src/ddl/run_ddl.py:14-17 —
    * reflection over the package; here an explicit registry, the idiomatic
    * Scala equivalent): `ensure` every registered model pre-pipeline. */
  object DdlRunner {
    def ensureAll(spark: org.apache.spark.sql.SparkSession, warehouseDir: String,
        models: Seq[TableDef]): TablePlan =
      new Orchestrator(spark, warehouseDir).syncTables(models)

    /** FK lineage edges of a model set, as rows for an edges metadata table. */
    def lineageEdges(models: Seq[TableDef]): Seq[FkEdge] =
      models.flatMap(_.foreignKeyEdges)
  }
}
