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
