package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc._
import graft.cdc.lake._
import graft.cdc.ingest._
import graft.cdc.model._

class SchemaEvolutionSpec extends SparkSuite {

  private val v2Schema = StructType(RepoRow.schemaV1.fields ++ Seq(
    StructField("size_bytes", LongType, nullable = true),
    StructField("stars", LongType, nullable = true)))

  test("mid-stream additive evolution: v1 files + v2 files conform on read (regression: fence vs metadata commit)") {
    val root = tmpDir("lake-ev")
    val cfg = gen.GenConfig(n = 6000, nKeys = 1000, numPartitions = 4, evolveAtLsn = 3000)
    val events = gen.changeEvents(spark, cfg).cache()

    val table = LakeTable.createIfNotExists(spark, root, "repo_files",
      RepoRow.schemaV1, RepoRow.keyColumns, numBuckets = 8)
    // epoch 0 under schema v1 (this is the exact path that broke before:
    // evolveSchema AFTER a committed data epoch)
    new ReplayEngine(table, SchemaRegistry.single(RepoRow.schemaV1))
      .applyEpoch(events.filter(col("lsn") < 3000).drop("size_bytes", "stars"), 0)
    table.evolveSchema(v2Schema)
    assert(table.snapshot.schemaVersion == 2)
    // epoch 1 under schema v2
    new ReplayEngine(table, table.snapshot.registry)
      .applyEpoch(events.filter(col("lsn") >= 3000), 1)
    events.unpersist()

    val result = table.read().cache()
    val expected = gen.oracleFinalState(cfg)
    assert(result.count() == expected.size)
    // rows whose winning event predates the evolution have null new columns;
    // v2-written rows carry the generated values
    val got = result.collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)), if (r.isNullAt(6)) None else Some(r.getLong(6)))
    }.toMap
    result.unpersist()
    expected.foreach { case (k, e) =>
      assert(got(k) == ((e.sizeBytes, e.stars)), s"v2 column mismatch for $k (winning lsn ${e.lsn})")
    }
  }

  test("type widening: int -> long column widens and old files read back") {
    val root = tmpDir("lake-w")
    import spark.implicits._
    val s1 = StructType(Seq(
      StructField("repo", StringType, false), StructField("path", StringType, false),
      StructField("stars", IntegerType, true)))
    val t = LakeTable.createIfNotExists(spark, root, "t", s1, Seq("repo", "path"), numBuckets = 4)
    val batch1 = Seq((1L, "U", "r1", "p1", 7), (2L, "U", "r1", "p2", 9))
      .toDF("lsn", "op", "repo", "path", "stars")
    new ReplayEngine(t, SchemaRegistry.single(s1)).applyEpoch(batch1, 0)

    val s2 = StructType(s1.fields.map(f => if (f.name == "stars") f.copy(dataType = LongType) else f))
    t.evolveSchema(s2)
    val batch2 = Seq((3L, "U", "r1", "p3", 5000000000L)).toDF("lsn", "op", "repo", "path", "stars")
    new ReplayEngine(t, t.snapshot.registry).applyEpoch(batch2, 1)

    val rows = t.read().orderBy("path").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(7L, 9L, 5000000000L))
    assert(t.read().schema("stars").dataType == LongType)
  }

  test("registry refuses narrowing and non-nullable additions") {
    val r = SchemaRegistry.single(RepoRow.schemaV1)
    intercept[IllegalArgumentException] {
      r.evolve(StructType(RepoRow.schemaV1.fields.filterNot(_.name == "lang")))
    }
    intercept[IllegalArgumentException] {
      r.evolve(StructType(RepoRow.schemaV1.fields :+ StructField("x", StringType, nullable = false)))
    }
    intercept[IllegalArgumentException] {
      val widened = RepoRow.schemaV1.fields.map(f =>
        if (f.name == "content") f.copy(dataType = IntegerType) else f)
      r.evolve(StructType(widened))
    }
    // legal: add nullable + widen via the lattice
    val r2 = r.evolve(StructType(RepoRow.schemaV1.fields :+ StructField("stars", IntegerType, true)))
    val r3 = r2.evolve(StructType(r2.latest.fields.map(f =>
      if (f.name == "stars") f.copy(dataType = LongType) else f)))
    assert(r3.latestVersion == 3)
  }
}
