package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc._
import graft.cdc.lake._
import graft.cdc.model._
import graft.cdc.plan._
import graft.cdc.quality._

/** The reference's end-to-end medallion chain (bronze CSV ingest -> silver
  * clean -> gold star join, /root/reference/src/{bronze,silver,gold}) run on
  * OUR engine: DDL pre-pass via the schema-sync planner, CSV scan with
  * inferSchema (reference: src/bronze/ingest.py:41-43), conform + cleanse,
  * quality-gated gold write into lake tables. */
class MedallionSpec extends SparkSuite {

  test("bronze csv -> silver conform -> gold join, quality-gated, through lake tables") {
    val wh = tmpDir("medallion-wh")

    // --- bronze: land documents as CSV, read back with schema inference
    val csvDir = tmpDir("medallion-csv")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(csvDir)
    val bronzeDf = spark.read.option("header", "true").option("inferSchema", "true").csv(csvDir)
    assert(bronzeDf.schema("doc_id").dataType == IntegerType ||
      bronzeDf.schema("doc_id").dataType == LongType) // inference kicked in

    // --- DDL pre-pass: declare tables, plan, validate, execute (reference
    //     run_ddl analog via the schema-sync engine)
    val bronzeDef = TableDef("bronze_documents", Seq(
      ColumnDef("doc_id", LongType, nullable = false, isPrimaryKey = true),
      ColumnDef("lang", StringType), ColumnDef("source", StringType),
      ColumnDef("n_chars", LongType)))
    val silverDef = TableDef("silver_documents", Seq(
      ColumnDef("doc_id", LongType, nullable = false, isPrimaryKey = true,
        foreignKey = Some(ForeignKey("bronze_documents", "doc_id"))),
      ColumnDef("lang", StringType, qualityRule =
        Some(QualityRule(Criticality.Error, allowedValues = Some(Seq("en", "de", "fr", "es", "zh"))))),
      ColumnDef("source", StringType),
      ColumnDef("n_chars", LongType, qualityRule =
        Some(QualityRule(Criticality.Warn, minValue = Some(0))))))
    val goldDef = TableDef("gold_lang_summary", Seq(
      ColumnDef("lang", StringType, nullable = false, isPrimaryKey = true),
      ColumnDef("n_docs", LongType), ColumnDef("total_chars", LongType)))
    val desired = Seq(bronzeDef, silverDef, goldDef)
    val p = DdlRunner.ensureAll(spark, wh, desired) // snapshot->plan->validate->execute
    assert(p.creates.size == 3)
    // idempotency: re-sync after execute plans nothing
    assert(DdlRunner.ensureAll(spark, wh, desired).isEmpty)

    // --- FK lineage edges surfaced as a metadata lake table
    val edgesSchema = StructType(Seq(
      StructField("constraint_name", StringType, nullable = false),
      StructField("source_table", StringType, nullable = false),
      StructField("source_column", StringType, nullable = false),
      StructField("reference_table", StringType, nullable = false),
      StructField("reference_column", StringType, nullable = false)))
    val edgesTable = LakeTable.createIfNotExists(spark, s"$wh/lineage_edges", "lineage_edges",
      edgesSchema, Seq("constraint_name"), numBuckets = 4)
    import spark.implicits._
    edgesTable.overwrite(DdlRunner.lineageEdges(desired).toDF())
    val edges = edgesTable.read().collect()
    assert(edges.length == 1)
    assert(edges(0).getAs[String]("constraint_name") ==
      "fk_silver_documents_doc_id_to_bronze_documents_doc_id")
    assert(edges(0).getAs[String]("reference_table") == "bronze_documents")

    // --- bronze load (overwrite, schema conformance by cast)
    val bronze = LakeTable.load(spark, s"$wh/bronze_documents", "bronze_documents")
    bronze.overwrite(bronzeDf.select(
      col("doc_id").cast(LongType), col("lang"), col("source"), col("n_chars").cast(LongType)))
    assert(bronze.read().count() == 500)

    // --- silver: cleanse (rlike filter) + conform + quality gate
    val gate = new QualityGate(Check.fromColumns(silverDef.columns))
    val silverDf = bronze.read()
      .filter(col("lang").rlike("^[a-z]{2}$"))
    gate.check(silverDf) // error rules must pass
    val silver = LakeTable.load(spark, s"$wh/silver_documents", "silver_documents")
    silver.overwrite(silverDf)

    // --- gold: aggregate into the summary table
    val goldDf = silver.read().groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    val gold = LakeTable.load(spark, s"$wh/gold_lang_summary", "gold_lang_summary")
    gold.overwrite(goldDf)
    val out = gold.read().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 500)
    assert(out.keySet == Set("en", "de", "fr", "es", "zh"))

    // --- gate actually blocks bad data (reference: errors abort the write)
    val poisoned = silverDf.withColumn("lang",
      when(col("doc_id") === 3, "xx").otherwise(col("lang")))
    intercept[QualityGateError] { gate.check(poisoned) }
  }
}
