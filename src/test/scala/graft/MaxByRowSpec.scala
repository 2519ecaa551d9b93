package graft

import org.apache.spark.sql.functions._

import graft.functions.MaxByRow

/** The custom hash-based max_by-over-struct aggregate: plan shape (must be
  * ObjectHashAggregate, not SortAggregate), correctness vs the built-in, and
  * partial-merge behavior across partitions (exercises serialize/deserialize). */
class MaxByRowSpec extends SparkSuite {
  import spark.implicits._

  test("matches built-in max_by on a string payload, across many partitions") {
    val df = spark.range(0, 100000, 1, 17)
      .select(col("id").as("lsn"),
        pmod(col("id"), lit(997)).as("k"),
        concat(lit("v"), col("id")).as("payload"),
        (col("id") % 7).cast("int").as("n"))
    val ours = df.groupBy("k")
      .agg(MaxByRow.maxByRow(struct(col("payload"), col("n")), col("lsn")).as("e"))
      .select(col("k"), col("e.payload"), col("e.n"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    val builtin = df.groupBy("k")
      .agg(max_by(struct(col("payload"), col("n")), col("lsn")).as("e"))
      .select(col("k"), col("e.payload"), col("e.n"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    assert(ours == builtin)
  }

  test("plans as a hash aggregate (no sort of the payload)") {
    val df = spark.range(0, 1000)
      .select(col("id").as("lsn"), pmod(col("id"), lit(10)).as("k"),
        concat(lit("v"), col("id")).as("payload"))
    val plan = df.groupBy("k")
      .agg(MaxByRow.maxByRow(struct(col("payload")), col("lsn")).as("e"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(600))
    assert(!plan.contains("SortAggregate"), plan.take(600))
  }

  test("null ordering keys are ignored; empty groups yield null") {
    val df = Seq((Some(1L), "a", "x"), (None, "a", "IGNORED"), (None, "b", "only-null"))
      .toDF("lsn", "k", "payload")
    val rows = df.groupBy("k")
      .agg(MaxByRow.maxByRow(struct(col("payload")), col("lsn")).as("e"))
      .select(col("k"), col("e.payload"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows("a").contains("x"))
    assert(rows("b").isEmpty)
  }

  test("type errors are analysis-time failures") {
    val df = Seq((1, "a")).toDF("i", "k")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("k").agg(MaxByRow.maxByRow(struct(col("k")), col("i")).as("e")).collect()
    }
  }
}
