package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Sanity/semantic tests for the analytics operators beyond the DuckDB oracle
  * (which the driver runs): near-dup recall relationships, ANN vs brute force,
  * multimodal plumbing, and plan-shape assertions (pushdown/broadcast). */
class OpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("exact dedup groups sum back to the corpus size") {
    val d = dedup.exact(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(d.agg(sum("dup_count")).collect()(0).getLong(0) == docs)
  }

  test("minhash-LSH candidates include every high-Jaccard pair (recall at 0.8)") {
    val truth = dedup.ngramJaccard(spark, sf, 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = dedup.minhashLsh(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dups")
    assert(truth.subsetOf(cand), s"missed: ${truth -- cand}")
  }

  test("simhash near-dup pairs overlap trigram near-dups") {
    val sh = dedup.simhash(spark, sf).collect()
    assert(sh.nonEmpty)
    sh.foreach(r => assert(r.getInt(2) <= 8))
  }

  test("ANN-LSH results are a subset of correct cosine scores (vs brute force)") {
    val bf = similarity.bruteForceTopK(spark, sf, maxQueryId = 5, k = 50)
      .select("q_id", "c_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = similarity.annLsh(spark, sf, maxQueryId = 5, k = 3).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      // every ANN hit must carry the same cosine the exact scorer computes
      bf.get(key).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
  }

  test("multimodal decode plumbing: batched partition decode is deterministic and schema-stable") {
    val media = multimodal.mediaTable(spark, sf)
    val feats = multimodal.extractFeatures(spark, media)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "kind", "n_bytes", "width", "height", "mean_luma"))
    val a = feats.collect().sortBy(_.doc_id)
    val b = multimodal.extractFeatures(spark, media.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq, "decode must not depend on partitioning")
    assert(a.forall(f => f.n_bytes > 0 && f.width >= 64 && f.height >= 64))
  }

  test("plan shape: filter+projection push down to the parquet scan") {
    val plan = relational.silverConform(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan.take(500))
    // only the referenced columns are read
    assert(!plan.contains("p_name"), "unused column must be pruned from the scan")
  }

  test("plan shape: dims join broadcasts the small sides") {
    val plan = relational.dimsBroadcast(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan.take(800))
  }

  test("lang-id covers all five classes on the sf0.01 corpus") {
    val preds = text.langId(spark, "/root/testdata/sf0.01")
      .groupBy("predicted_lang").count().collect().map(_.getString(0)).toSet
    assert(preds == Set("en", "de", "fr", "es", "zh"))
  }
}
