package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator suite — one entry per operator family from SURVEY.md §2,
  * exercised on the driver corpus (TESTDATA.md). Each function pairs with ANSI
  * oracle SQL in [[graft.SparkEntry.oracleSql]].
  *
  * Scale notes are inline: every query is a declarative plan (pushdown +
  * pruning from Catalyst), joins broadcast small sides explicitly, and all
  * aggregations get map-side partial aggregation.
  */
object relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A1-style grouped pricing summary (cast/filter pushed to the parquet scan;
    * partial aggregation map-side; reference silver/gold agg patterns). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** P1/P2/F2/F3: silver conform — select + cast + alias to a declared schema
    * (reference: src/silver/product.py:70-84). Pure projection, zero shuffle. */
  def silverConform(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey").cast("int").as("part_id"),
        upper(col("p_brand")).as("brand"),
        col("p_type").as("part_type"),
        col("p_size").cast("long").as("size"),
        round(col("p_retailprice"), 2).as("price"))
      .orderBy(col("part_id"))

  /** P3/F1: regex-predicate cleansing filter (reference: src/silver/product.py:19). */
  def rlikeFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("text").rlike("\\bmerge\\b") && col("lang").rlike("^(en|fr)$"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** J1: chained inner equi-joins into a star aggregate
    * (reference: src/gold/product_dimension.py:62-74). Shuffle join on the
    * fact keys; dims small enough for AQE/broadcast at this scale. */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("c_mktsegment"))
  }

  /** J1 with explicit broadcast of the small dimensions — at 100 TB the fact
    * side streams and the dims ship once per executor (no shuffle). */
  def dimsBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"), round(sum(col("s_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("r_name"))
  }

  /** J3: EXISTS as a left-semi join (reference: src/models/table_builder.py:64-85). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** J5: NOT EXISTS as a left-anti join (the whenNotMatchedInsertAll leg):
    * customers who never hit an 'error' event. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val ev = t(spark, dir, "events").filter(col("event_type") === "error")
    c.join(ev, c("c_custkey") === ev("user_id"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** J4: MERGE-as-relational-legs — full-outer join of a "target" and a
    * "source" snapshot with update/insert/delete resolution; the exact
    * semantics of the reference's Delta merge (src/models/writer.py:42-67)
    * expressed as a plan. Target = latest even-LSN event per key, source =
    * latest odd-LSN event per key, 'error' acts as the delete op. */
  def fullOuterMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def latest(df: DataFrame): DataFrame = df
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("event_id"), col("event_type"), col("value")), col("event_id")).as("e"))
      .select(col("user_id"), col("e.event_id").as("event_id"),
        col("e.event_type").as("event_type"), col("e.value").as("value"))
    val target = latest(ev.filter(pmod(col("event_id"), lit(2)) === 0)).alias("t")
    val source = latest(ev.filter(pmod(col("event_id"), lit(2)) === 1)).alias("s")
    target.join(source, Seq("user_id"), "full_outer")
      .filter(!(col("s.event_type") <=> lit("error")))
      .select(
        col("user_id"),
        when(col("s.event_id").isNull, col("t.event_id")).otherwise(col("s.event_id")).as("last_event_id"),
        when(col("s.event_id").isNull, col("t.value")).otherwise(col("s.value")).as("value"))
      .orderBy(col("user_id"))
  }

  /** A1/P5: global multi-aggregate with conditional indicators (reference
    * SLO quality job, src/metadata/slo/quality.py:43-59 — implemented with
    * sum(when(...)) rather than the reference's count(indicator) bug). */
  def globalAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").agg(
      sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("error_count"),
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_count"),
      count(lit(1)).as("n_events"),
      round(sum(col("value")), 2).as("total_value"),
      round(avg(col("value")), 4).as("avg_value"))

  /** A2: per-group "any before cutoff" boolean max (reference timeliness SLO,
    * src/metadata/slo/timeliness.py:81-89). */
  def readyByHour(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        max(when(hour(col("ts")) < 12, 1).otherwise(0)).as("any_before_noon"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** A4: duplicate-PK detector (reference DQX is_unique,
    * src/models/data_quality_table.py:51-58). */
  def dupKeys(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy(col("user_id"))

  /** A5/W3: per-key max-LSN dedup window — the north rule's dedup kernel on
    * the stand-in change stream (events: key=user_id, lsn=event_id). */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** W1/W2: order-by + limit (top-K by price). */
  def topK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .limit(10)

  /** F2-F11: scalar-function battery incl. the sha2(content,256) verification
    * primitive of the north rule. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        sha2(col("text"), 256).as("text_sha"),
        length(col("text")).as("len"),
        upper(col("lang")).as("lang_u"),
        substring(sha2(col("text"), 256), 1, 8).as("fp8"))
      .orderBy(col("doc_id"))

  /** F8: generator op — explode tokens, top-20 token frequencies. */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** Set ops: INTERSECT of user populations from two event partitions. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    ev.filter(pmod(col("event_id"), lit(2)) === 0).select(col("user_id")).distinct()
      .intersect(ev.filter(pmod(col("event_id"), lit(2)) === 1).select(col("user_id")).distinct())
      .orderBy(col("user_id"))
  }

  /** Set ops: EXCEPT — big spenders who never had a pricey error. */
  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    ev.filter(col("value") > 99).select(col("user_id")).distinct()
      .except(ev.filter(col("event_type") === "error" && col("value") > 95)
        .select(col("user_id")).distinct())
      .orderBy(col("user_id"))
  }

  /** F5-F7: date/time function battery — year/month/quarter buckets with
    * interval arithmetic in the predicate (reference: timeliness SLO date
    * windows, src/metadata/slo/timeliness.py:55). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderdate") < expr("timestamp'1995-01-01 00:00:00' + interval 900 day"))
      .groupBy(year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("y"), col("q"))

  /** Beyond the reference: ROLLUP subtotal hierarchy (returnflag -> linestatus
    * -> grand total). Null ordering pinned explicitly for oracle parity. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** JSON functions (engine side uses to_json/from_json for ledgers; here the
    * scalar extraction path): parse events.props and aggregate on the
    * extracted field. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  /** Exact linear-interpolation percentiles per group. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("q25"),
        round(expr("percentile(value, 0.5)"), 6).as("q50"),
        round(expr("percentile(value, 0.75)"), 6).as("q75"))
      .orderBy(col("event_type"))

  /** Window analytics: running sum + lag (deterministic accumulation order). */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    t(spark, dir, "events")
      .filter(col("user_id") < 20)
      .withColumn("running_value",
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("running_value"), col("prev_type"))
      .orderBy(col("user_id"), col("event_id"))
  }
}
