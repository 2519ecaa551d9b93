package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen => SGen, Prop, Test => SCTest}

import graft.cdc.model._
import graft.cdc.plan._

/** Planner/validator unit + property tests (reference analog:
  * tests/delta_engine/compile/test_planner.py, validation/test_rules.py).
  * The ScalaCheck upgrade the reference lacks: planner idempotency —
  * re-planning after applying a plan yields an empty plan. */
class PlannerSpec extends SparkSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def tdef(name: String, cols: (String, DataType)*): TableDef =
    TableDef(name, cols.map { case (n, dt) => ColumnDef(n, dt) })

  private def stateOf(d: TableDef): TableState =
    TableState(d.name, exists = true, d.schema, d.primaryKey, d.properties)

  test("missing table plans a create; matching table plans nothing") {
    val d = tdef("t1", "id" -> LongType, "name" -> StringType)
    val p1 = Planner.plan(Seq(d), Seq(TableState("t1", exists = false, StructType(Nil), Nil, Map.empty)))
    assert(p1.creates.map(_.table) == Seq("t1") && p1.aligns.isEmpty)
    val p2 = Planner.plan(Seq(d), Seq(stateOf(d)))
    assert(p2.isEmpty)
  }

  test("diff plans adds and widenings only") {
    val observed = stateOf(tdef("t1", "id" -> IntegerType, "name" -> StringType))
    val desired = tdef("t1", "id" -> LongType, "name" -> StringType, "added" -> DoubleType)
    val p = Planner.plan(Seq(desired), Seq(observed))
    assert(p.creates.isEmpty)
    val actions = p.aligns.head.actions
    assert(actions.contains(WidenType("t1", "id", IntegerType, LongType)))
    assert(actions.collect { case AddColumn(_, c) => c.name } == Seq("added"))
  }

  test("validator refuses NOT NULL adds and narrowing") {
    val observed = stateOf(tdef("t1", "id" -> LongType))
    val badAdd = TablePlan(Nil, Seq(AlignTable("t1",
      Seq(AddColumn("t1", ColumnDef("x", StringType, nullable = false))))))
    intercept[UnsafePlanError] { Validator.validatePlan(badAdd, Seq(observed)) }
    val badWiden = TablePlan(Nil, Seq(AlignTable("t1",
      Seq(WidenType("t1", "id", LongType, IntegerType)))))
    intercept[UnsafePlanError] { Validator.validatePlan(badWiden, Seq(observed)) }
  }

  test("model validation: PK columns must be NOT NULL; duplicate models refused") {
    val bad = TableDef("t", Seq(ColumnDef("id", LongType, nullable = true, isPrimaryKey = true)))
    intercept[InvalidModelError] { Validator.validateModels(Seq(bad)) }
    val ok = TableDef("t", Seq(ColumnDef("id", LongType, nullable = false, isPrimaryKey = true)))
    intercept[InvalidModelError] { Validator.validateModels(Seq(ok, ok)) }
  }

  test("diff represents non-additive changes (drop / tighten / PK change); validator refuses them") {
    // reference analog: tests/delta_engine/validation/test_rules.py:81-388 —
    // the planner must REPRESENT unsafe changes so validation can refuse them
    val observed = stateOf(TableDef("t1", Seq(
      ColumnDef("id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("legacy", StringType),
      ColumnDef("opt", StringType, nullable = true))))
    // drop: 'legacy' missing from the desired model
    val dropDesired = TableDef("t1", Seq(
      ColumnDef("id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("opt", StringType, nullable = true)))
    val dropPlan = Planner.plan(Seq(dropDesired), Seq(observed))
    assert(dropPlan.aligns.head.actions.contains(DropColumn("t1", "legacy")))
    val eDrop = intercept[UnsafePlanError] { Validator.validatePlan(dropPlan, Seq(observed)) }
    assert(eDrop.getMessage.contains("NoDropColumns") && eDrop.getMessage.contains("legacy"))
    // tighten: opt becomes NOT NULL
    val tightenDesired = TableDef("t1", Seq(
      ColumnDef("id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("legacy", StringType),
      ColumnDef("opt", StringType, nullable = false)))
    val tightenPlan = Planner.plan(Seq(tightenDesired), Seq(observed))
    assert(tightenPlan.aligns.head.actions.contains(NullabilityChange("t1", "opt", makeNullable = false)))
    val eT = intercept[UnsafePlanError] { Validator.validatePlan(tightenPlan, Seq(observed)) }
    assert(eT.getMessage.contains("NoTightenNullability"))
    // PK change: drop+add pair planned, both refused
    val pkDesired = TableDef("t1", Seq(
      ColumnDef("id", LongType, nullable = false),
      ColumnDef("legacy", StringType, nullable = false, isPrimaryKey = true),
      ColumnDef("opt", StringType, nullable = true)))
    val pkPlan = Planner.plan(Seq(pkDesired), Seq(observed))
    val acts = pkPlan.aligns.head.actions
    assert(acts.exists { case PrimaryKeyDrop("t1", n) => n.startsWith("pk_t1__id"); case _ => false })
    assert(acts.exists { case PrimaryKeyAdd("t1", n, cols) => cols == Seq("legacy"); case _ => false })
    val ePk = intercept[UnsafePlanError] { Validator.validatePlan(pkPlan, Seq(observed)) }
    assert(ePk.getMessage.contains("NoPrimaryKeyChange"))
  }

  test("metadata-only actions plan AND execute: comments, nullability loosen, properties") {
    val wh = tmpDir("planner-meta")
    val v1 = TableDef("meta_t", Seq(
      ColumnDef("id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("v", StringType, nullable = false)),
      comment = "first", properties = Map("team" -> "core"))
    new Orchestrator(spark, wh).syncTables(Seq(v1))
    // desired drifts: loosen v, comment both columns, new table comment + prop
    val v2 = TableDef("meta_t", Seq(
      ColumnDef("id", LongType, nullable = false, isPrimaryKey = true, comment = "pk"),
      ColumnDef("v", StringType, nullable = true, comment = "payload")),
      comment = "second", properties = Map("team" -> "core", "tier" -> "gold"))
    val p = new Orchestrator(spark, wh).syncTables(Seq(v2))
    val acts = p.aligns.head.actions
    assert(acts.contains(NullabilityChange("meta_t", "v", makeNullable = true)))
    assert(acts.contains(SetColumnComments("meta_t", Map("id" -> "pk", "v" -> "payload"))))
    assert(acts.contains(SetTableComment("meta_t", "second")))
    assert(acts.contains(SetProperties("meta_t", Map("tier" -> "gold"))))
    // applied: re-planning is empty (idempotency incl. metadata)
    assert(new Orchestrator(spark, wh).syncTables(Seq(v2)).isEmpty)
    val st = StateReader.read(spark, wh, "meta_t")
    assert(st.tableComment == "second" && st.properties("tier") == "gold")
    assert(st.schema("v").nullable && st.schema("v").getComment().contains("payload"))
    // amendments did NOT cut a new schema version (metadata-only)
    import graft.cdc.lake._
    assert(LakeTable.load(spark, s"$wh/meta_t", "meta_t").snapshot.schemaVersion == 1)
  }

  test("constraint naming is deterministic, order-sensitive, and length-bounded") {
    val a = naming.primaryKeyName("orders", Seq("region", "id"))
    assert(a == naming.primaryKeyName("orders", Seq("region", "id")))
    assert(a != naming.primaryKeyName("orders", Seq("id", "region")), "column order is significant")
    assert(a == "pk_orders__region_id")
    val fk = naming.foreignKeyName("orders", "cust_id", "customer", "id")
    assert(fk == "fk_orders_cust_id_to_customer_id")
    val long = naming.primaryKeyName("t" * 200, Seq("c" * 50))
    assert(long.length <= naming.maxIdentifierLen)
    assert(long == naming.primaryKeyName("t" * 200, Seq("c" * 50)))
    // distinct long inputs stay distinct through truncation (hash suffix)
    assert(long != naming.primaryKeyName("t" * 200, Seq("c" * 49 + "x")))
  }

  test("orchestrator: stage order snapshot -> plan -> validate -> execute, fail-fast") {
    // reference analog: tests/delta_engine/orchestrate/test_orchestrator.py
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val d = tdef("t9", "id" -> LongType)
    val okPlan = TablePlan(Seq(CreateTable("t9", d)), Nil)
    val orch = new Orchestrator(spark, "/none",
      reader = (_, _, n) => { calls += s"read:$n"; TableState(n, exists = false, StructType(Nil), Nil, Map.empty) },
      planner = (_, _) => { calls += "plan"; okPlan },
      modelValidator = _ => calls += "validateModels",
      planValidator = (_, _) => calls += "validatePlan",
      executor = (_, _, _) => calls += "execute")
    assert(orch.syncTables(Seq(d)) eq okPlan)
    assert(calls.toSeq == Seq("validateModels", "read:t9", "plan", "validatePlan", "execute"))
    // fail-fast: a refusing validator must prevent execution
    calls.clear()
    val failing = new Orchestrator(spark, "/none",
      reader = (_, _, n) => TableState(n, exists = false, StructType(Nil), Nil, Map.empty),
      planner = (_, _) => okPlan,
      modelValidator = _ => (),
      planValidator = (_, _) => throw new UnsafePlanError("nope"),
      executor = (_, _, _) => calls += "execute")
    intercept[UnsafePlanError] { failing.syncTables(Seq(d)) }
    assert(!calls.contains("execute"), "validation failure must prevent execution")
  }

  test("FK metadata: deterministic edges from column defs") {
    val t = TableDef("order_fact", Seq(
      ColumnDef("order_id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("product_id", LongType, foreignKey = Some(ForeignKey("product_dim", "product_id"))),
      ColumnDef("aisle_id", LongType, foreignKey = Some(ForeignKey("aisle_dim", "aisle_id")))))
    val edges = t.foreignKeyEdges
    assert(edges.map(_.constraint_name) == Seq(
      "fk_order_fact_product_id_to_product_dim_product_id",
      "fk_order_fact_aisle_id_to_aisle_dim_aisle_id"))
    assert(DdlRunner.lineageEdges(Seq(t)) == edges)
  }

  test("property: planner is idempotent (plan after apply is empty)") {
    val dtGen = SGen.oneOf[DataType](IntegerType, LongType, DoubleType, StringType, BooleanType)
    val colGen = for {
      n <- SGen.choose(1, 8)
      names = (0 until n).map(i => s"c$i")
      dts <- SGen.listOfN(n, dtGen)
    } yield names.zip(dts)
    check(Prop.forAll(colGen, colGen) { (observedCols, desiredExtra) =>
      val observed = stateOf(tdef("t", observedCols: _*))
      // desired = observed plus widenings plus extra columns (always additive)
      val widened = observedCols.map {
        case (n, IntegerType) => (n, LongType)
        case (n, dt) => (n, dt)
      }
      val extras = desiredExtra.zipWithIndex.map { case ((_, dt), i) => (s"x$i", dt) }
      val desired = tdef("t", (widened ++ extras): _*)
      val p = Planner.plan(Seq(desired), Seq(observed))
      // "apply" the plan to the observed state
      val appliedSchema = StructType(desired.columns.map(_.structField))
      val after = TableState("t", exists = true, appliedSchema, Nil, Map.empty)
      Planner.plan(Seq(desired), Seq(after)).isEmpty
    })
  }

  test("property: widening lattice is reflexive and antisymmetric on the core types") {
    val types: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    types.foreach(t => assert(graft.cdc.SchemaRegistry.isWidening(t, t)))
    for (a <- types; b <- types if a != b) {
      assert(!(graft.cdc.SchemaRegistry.isWidening(a, b) && graft.cdc.SchemaRegistry.isWidening(b, a)),
        s"$a <-> $b must not widen both ways")
    }
  }
}
