package graft

import org.apache.spark.sql.types._

import graft.cdc.model._
import graft.cdc.quality._

/** Quality gate (reference analog: tests for data_quality_evaluator/table). */
class QualityGateSpec extends SparkSuite {
  import spark.implicits._

  private val columns = Seq(
    ColumnDef("id", LongType, nullable = false, isPrimaryKey = true),
    ColumnDef("lang", StringType, qualityRule =
      Some(QualityRule(Criticality.Error, allowedValues = Some(Seq("scala", "py", "java"))))),
    ColumnDef("score", DoubleType, qualityRule =
      Some(QualityRule(Criticality.Warn, minValue = Some(0.0), maxValue = Some(1.0)))))

  test("clean batch passes; warn failures are reported but do not abort") {
    val gate = new QualityGate(Check.fromColumns(columns))
    val clean = Seq((1L, "scala", 0.5), (2L, "py", 0.9)).toDF("id", "lang", "score")
    assert(gate.check(clean).isEmpty)
    val warny = Seq((1L, "scala", -0.5), (2L, "py", 1.7)).toDF("id", "lang", "score")
    val failures = gate.check(warny)
    assert(failures.map(f => (f.check_name, f.criticality, f.failed_rows)).toSet ==
      Set(("min_value", "warn", 1L), ("max_value", "warn", 1L)))
  }

  test("error-level failures abort (null PK, disallowed value)") {
    val gate = new QualityGate(Check.fromColumns(columns))
    val bad = Seq((Some(1L), "rust", 0.5), (None, "scala", 0.5))
      .toDF("id", "lang", "score")
    val e = intercept[QualityGateError] { gate.check(bad) }
    assert(e.failures.map(_.check_name).toSet == Set("is_not_null", "is_in_list"))
  }

  test("duplicate-PK detector finds dups") {
    val gate = new QualityGate(Nil)
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val dups = gate.duplicateKeys(df, Seq("id")).collect()
    assert(dups.length == 1 && dups(0).getLong(0) == 1L && dups(0).getLong(1) == 2L)
  }

  test("quarantine split: error rows blocked, warn rows pass annotated, clean rows clean") {
    val gate = new QualityGate(Check.fromColumns(columns))
    val df = Seq(
      (1L, "scala", 0.5),  // clean
      (2L, "py", -0.3),    // warn (min_value)
      (3L, "rust", 0.5))   // error (is_in_list)
      .toDF("id", "lang", "score")
    val res = gate.split(df)
    // pass = no error-level failure; the warn-only row proceeds (reference
    // semantics: the write continues, warnings are audited)
    assert(res.pass.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val q = res.quarantine.collect().map(r => r.getLong(0) -> r).toMap
    assert(q.keySet == Set(2L, 3L))
    val warnNames = q(2L).getSeq[org.apache.spark.sql.Row](3).map(_.getString(0))
    assert(warnNames == Seq("min_value") && q(2L).getSeq[Any](4).isEmpty)
    val errNames = q(3L).getSeq[org.apache.spark.sql.Row](4).map(_.getString(0))
    assert(errNames == Seq("is_in_list") && q(3L).getSeq[Any](3).isEmpty)
  }

  test("auto-derived PK uniqueness: gated overwrite refuses duplicates, audits them first") {
    import graft.cdc.lake._
    val td = TableDef("users", Seq(
      ColumnDef("id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("v", StringType)), numBuckets = 4)
    // forTable auto-attaches is_unique (error) + is_not_null(id) for the PK
    val gate = QualityGate.forTable(td)
    assert(gate.keyedChecks == Seq(KeyedCheck("is_unique", Seq("id"), Criticality.Error)))
    val root = tmpDir("dq-uniq")
    val t = LakeTable.createIfNotExists(spark, s"$root/t", td.name, td.schema, td.primaryKey, 4)
    val audit = LakeTable.createIfNotExists(spark, s"$root/dq", DataQualityChecks.tableName,
      DataQualityChecks.schema, Seq("table_name", "check_name"), 4)

    // duplicates: is_unique fires with failed_rows = rows in duplicated groups
    val dup = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("id", "v")
    intercept[QualityGateError] { GatedWriter.overwrite(t, dup, gate, Some(audit), jobId = 7) }
    assert(t.read().isEmpty, "refused overwrite must not write")
    val a = audit.read().collect()
    assert(a.length == 1)
    assert(a(0).getAs[String]("check_name") == "is_unique" &&
      a(0).getAs[String]("criticality") == "error" &&
      a(0).getAs[Long]("failed_rows") == 3L &&
      a(0).getAs[Long]("job_id") == 7L &&
      a(0).getSeq[String](a(0).fieldIndex("columns")).toSeq == Seq("id"))

    // unique batch: gate passes, the overwrite lands
    val ok = Seq((1L, "a"), (2L, "d")).toDF("id", "v")
    assert(GatedWriter.overwrite(t, ok, gate, Some(audit), jobId = 8).committed)
    assert(t.read().count() == 2)
    assert(audit.read().count() == 1, "clean write adds no audit rows")

    // append path shares the gate (duplicate WITHIN the appended batch fires)
    intercept[QualityGateError] {
      GatedWriter.append(t, Seq((9L, "x"), (9L, "y")).toDF("id", "v"), gate, Some(audit), jobId = 9)
    }
    assert(t.read().count() == 2, "refused append must not write")
  }

  test("audit + quarantine lake tables: failures persisted per epoch, errors persisted before abort") {
    import graft.cdc._, graft.cdc.lake._, graft.cdc.ingest._
    import org.apache.spark.sql.functions._
    val root = tmpDir("dq-audit")
    val schema = StructType(Seq(
      StructField("repo", StringType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("lang", StringType),
      StructField("content", StringType)))
    val cols = Seq(
      ColumnDef("repo", StringType, nullable = false, isPrimaryKey = true),
      ColumnDef("path", StringType, nullable = false, isPrimaryKey = true),
      ColumnDef("lang", StringType, qualityRule =
        Some(QualityRule(Criticality.Warn, allowedValues = Some(Seq("scala", "py"))))),
      ColumnDef("content", StringType, qualityRule =
        Some(QualityRule(Criticality.Error, allowedValues = Some(Seq("ok"))))))
    val t = LakeTable.createIfNotExists(spark, s"$root/t", "t", schema, Seq("repo", "path"), 4)
    val audit = LakeTable.createIfNotExists(spark, s"$root/dq", DataQualityChecks.tableName,
      DataQualityChecks.schema, Seq("table_name", "check_name"), 4)
    val qSchema = StructType(schema.fields ++ Seq(
      StructField("epoch", LongType, nullable = false),
      StructField("_warnings", StringType), StructField("_errors", StringType)))
    val quar = LakeTable.createIfNotExists(spark, s"$root/quar", "quarantine",
      qSchema, Seq("repo", "path"), 4)
    val eng = new ReplayEngine(t, SchemaRegistry.single(schema),
      gate = Some(new QualityGate(Check.fromColumns(cols))),
      auditTable = Some(audit), quarantineTable = Some(quar))

    def batch(rows: Seq[(Long, String, String, String, String)]) =
      rows.toDF("lsn", "repo", "path", "lang", "content")
        .select(col("lsn"), lit("U").as("op"), col("repo"), col("path"), col("lang"), col("content"))

    // epoch 0: one warn (lang=go), no errors -> commits, audit row appended
    val r0 = eng.applyEpoch(batch(Seq((1L, "r1", "a", "go", "ok"), (2L, "r1", "b", "scala", "ok"))), 0)
    assert(r0.committed)
    val a0 = audit.read().collect()
    assert(a0.length == 1)
    assert(a0(0).getAs[String]("check_name") == "is_in_list" &&
      a0(0).getAs[String]("criticality") == "warn" &&
      a0(0).getAs[Long]("failed_rows") == 1L && a0(0).getAs[Long]("job_id") == 0L)
    // quarantined row = the warn row, with its annotation
    val qr0 = quar.read().collect()
    assert(qr0.length == 1 && qr0(0).getAs[String]("path") == "a" &&
      qr0(0).getAs[String]("_warnings").contains("is_in_list"))

    // epoch 1: an error-level violation -> abort, but audit row persisted first
    intercept[QualityGateError] {
      eng.applyEpoch(batch(Seq((3L, "r1", "c", "scala", "CORRUPT"))), 1)
    }
    assert(t.snapshot.epochId == 0L, "aborted epoch must not commit")
    val rows = audit.read().collect().map(r =>
      (r.getAs[Long]("job_id"), r.getAs[String]("criticality"), r.getAs[String]("check_name")))
    assert(rows.toSet == Set((0L, "warn", "is_in_list"), (1L, "error", "is_in_list")))
    assert(quar.read().filter(col("_errors").contains("is_in_list")).count() == 1)
  }
}
