package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Deterministic, distributed change-event generator + an independent
  * driver-side oracle.
  *
  * Every column is a pure Catalyst expression of the event's LSN (= range id),
  * so generation is embarrassingly parallel, identical at ANY parallelism, and
  * scales to the 10^10-event design envelope without a driver bottleneck.
  * The oracle mirrors the same arithmetic in plain Scala (same xxhash64 /
  * Math.pow semantics), giving an independent expected final state for
  * correctness tests at small n.
  *
  * Key distribution is Zipf-ish (u^zipf inverse-CDF), concentrating traffic on
  * low key indices, and repo sizes grow quadratically — together they exercise
  * the hot-repo skew path the north rule calls out.
  */
object gen {

  final case class GenConfig(
      n: Long,
      nKeys: Long,
      zipf: Double = 3.0,
      deletePct: Int = 10, // % of events that are deletes
      contentReps: Int = 6, // content size knob
      numPartitions: Int = 32,
      evolveAtLsn: Long = Long.MaxValue) // events >= this carry schema v2 payloads

  /** Change-event DataFrame: lsn, op, schema_version, repo, path, commit,
    * lang, content [, size_bytes, stars for v2]. */
  def changeEvents(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val base = spark.range(0L, cfg.n, 1L, cfg.numPartitions).toDF("lsn")
    val h1 = xxhash64(col("lsn"))
    val h2 = xxhash64(col("lsn"), lit(1L))
    val h3 = xxhash64(col("lsn"), lit(2L))
    val u = shiftrightunsigned(h1, 11).cast("double") / lit(9007199254740992.0) // 2^53
    val keyIdx = floor(lit(cfg.nKeys.toDouble) * pow(u, lit(cfg.zipf)))
    val repoIdx = floor(sqrt(keyIdx.cast("double")))
    val opMod = pmod(h2, lit(100L))
    // lang is a property of the FILE (key), not of the event: derive from the
    // key index so updates to a key keep a stable (repo, path, lang) identity
    val langIdx = pmod(keyIdx.cast("long"), lit(5L)).cast("int")
    val langs = array(lit("scala"), lit("py"), lit("java"), lit("go"), lit("md"))
    val df = base
      .withColumn("op",
        when(opMod < lit(cfg.deletePct.toLong), lit("D"))
          .when(opMod < lit(55L), lit("U"))
          .otherwise(lit("I")))
      .withColumn("schema_version",
        when(col("lsn") >= lit(cfg.evolveAtLsn), lit(2)).otherwise(lit(1)))
      .withColumn("repo", concat(lit("org"), pmod(repoIdx, lit(1000L)), lit("/repo"), repoIdx))
      .withColumn("path", concat(lit("src/d"), pmod(keyIdx, lit(20L)), lit("/f_"), keyIdx,
        lit("."), element_at(langs, langIdx + lit(1))))
      .withColumn("commit", lower(concat(
        lpad(hex(h3), 16, "0"), lpad(hex(h2), 16, "0"), substring(lpad(hex(h1), 16, "0"), 1, 8))))
      .withColumn("lang", element_at(langs, langIdx + lit(1)))
      .withColumn("content", concat(
        lit("// "), col("repo"), lit("/"), col("path"), lit(" @"), col("lsn"), lit("\n"),
        repeat(concat(lit("val x"), pmod(h2, lit(97L)), lit(" = "), pmod(h3, lit(9973L)), lit("; ")),
          cfg.contentReps)))
    if (cfg.evolveAtLsn < cfg.n) {
      df.withColumn("size_bytes",
          when(col("schema_version") >= 2, pmod(h2, lit(100000L))).otherwise(lit(null).cast("long")))
        .withColumn("stars",
          when(col("schema_version") >= 2, pmod(h3, lit(5000L))).otherwise(lit(null).cast("long")))
    } else df
  }

  // ---- driver-side oracle (mirrors the expressions above exactly) ----------

  final case class OracleEvent(lsn: Long, op: String, schemaVersion: Int,
      repo: String, path: String, commit: String, lang: String, content: String,
      sizeBytes: Option[Long], stars: Option[Long])

  private def pmodL(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }
  private val langsArr = Array("scala", "py", "java", "go", "md")

  def eventAt(lsn: Long, cfg: GenConfig): OracleEvent = {
    val h1 = XXH64.hashLong(lsn, 42L)
    val h2 = XXH64.hashLong(1L, h1)
    val h3 = XXH64.hashLong(2L, h1)
    val u = (h1 >>> 11).toDouble / 9007199254740992.0
    val keyIdx = math.floor(cfg.nKeys.toDouble * math.pow(u, cfg.zipf)).toLong
    val repoIdx = math.floor(math.sqrt(keyIdx.toDouble)).toLong
    val opMod = pmodL(h2, 100L)
    val op = if (opMod < cfg.deletePct) "D" else if (opMod < 55) "U" else "I"
    val sv = if (lsn >= cfg.evolveAtLsn) 2 else 1
    val lang = langsArr(pmodL(keyIdx, 5L).toInt)
    val repo = s"org${pmodL(repoIdx, 1000L)}/repo$repoIdx"
    val path = s"src/d${pmodL(keyIdx, 20L)}/f_$keyIdx.$lang"
    val commit = f"$h3%016x$h2%016x" + f"$h1%016x".take(8)
    val content = s"// $repo/$path @$lsn\n" +
      (s"val x${pmodL(h2, 97L)} = ${pmodL(h3, 9973L)}; " * cfg.contentReps)
    OracleEvent(lsn, op, sv, repo, path, commit, lang, content,
      if (sv >= 2) Some(pmodL(h2, 100000L)) else None,
      if (sv >= 2) Some(pmodL(h3, 5000L)) else None)
  }

  /** Expected final table state after replaying events [0, n): per-key max-LSN
    * wins, deletes drop the key. Independent of the Spark path. */
  def oracleFinalState(cfg: GenConfig): Map[(String, String), OracleEvent] = {
    require(cfg.n <= 2000000, "oracle is driver-side; keep n small in tests")
    val m = scala.collection.mutable.HashMap.empty[(String, String), OracleEvent]
    var i = 0L
    while (i < cfg.n) {
      val e = eventAt(i, cfg)
      val k = (e.repo, e.path)
      // lsn strictly increases, so the last write wins as we scan forward
      if (e.op == "D") m.remove(k) else m.update(k, e)
      i += 1
    }
    m.toMap
  }

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
