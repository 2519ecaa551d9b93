package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float], 64-dim in the
  * corpus): brute-force cosine top-k as the exact baseline, and an LSH
  * (random-hyperplane) bucketed variant as the scale path.
  *
  * The dot products are pure higher-order-function expressions
  * (zip_with + aggregate) — no UDF, stays in codegen. Brute force is
  * O(queries x corpus); the LSH variant buckets the corpus once (a narrow
  * projection) and joins query->bucket, so at 10^9 vectors the candidate set
  * per query is corpus/2^bits on average.
  */
object similarity {

  // spread: one small parquet file = 1-2 scan splits; the per-vector dot
  // products / signatures would otherwise run near-single-threaded
  // (guide §2.5). No-op at scale — see opsutil.
  private def emb(spark: SparkSession, dir: String): DataFrame =
    opsutil.spread(spark.read.parquet(s"$dir/embeddings.parquet"))

  /** Dot product over two array<double> columns (zip_with + left fold from
    * 0.0). Kept in the compact HOF form deliberately: unrolling to 64
    * element_at terms was A/B-measured SLOWER end to end — the plan grows by
    * ~200 nodes per use (analysis/optimizer cost on every run) and the giant
    * generated methods fall out of JIT/whole-stage budgets, while the
    * per-element lambda cost only matters at pair counts this corpus never
    * reaches. What DOES matter is calling it once per pair instead of three
    * times — see [[norm]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm: sqrt of the self-dot, same accumulation order as the
    * historical inline form. A per-VECTOR quantity — every rescore below
    * precomputes it once per side and pays only [[dot]] per pair (the former
    * cosine-per-pair recomputed both norms for every candidate, tripling the
    * dominant arithmetic). */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** cosine(a, b) as a Column over two array<double> columns. Prefer the
    * precomputed-norm form (dot / (normA * normB)) in per-pair rescores —
    * the division tree here matches it bit-for-bit. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** All pairs (query in [0, maxQueryId) x corpus) with cosine >= threshold.
    * Broadcast the tiny query side; the corpus streams. */
  def cosinePairs(spark: SparkSession, dir: String, maxQueryId: Int, threshold: Double): DataFrame = {
    val e = emb(spark, dir)
    // norms are per-vector: compute once on each side, pay only the dot per pair
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
      .withColumn("q_n", norm(col("q_emb")))
    val c = e.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
      .withColumn("c_n", norm(col("c_emb")))
    broadcast(q).join(c, col("q_id") < col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("q_id"), col("c_id"))
  }

  /** Brute-force exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(spark: SparkSession, dir: String, maxQueryId: Int = 5, k: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
      .withColumn("q_n", norm(col("q_emb")))
    val c = e.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
      .withColumn("c_n", norm(col("c_emb")))
    val scored = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Deterministic random hyperplanes: nPlanes x dim, seeded. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH signature (one bit per plane) as a Column.
    *
    * Deliberately the zip_with/aggregate HOF form, NOT an unrolled inline
    * sum: the signature is computed once per VECTOR (cheap — the corpus
    * pass, not the pair loop), and unrolling 32 planes x 64 literal
    * coefficients was measured to blow the plan up to ~12k expression nodes,
    * costing ~17 s of analysis/optimization per query at zero runtime
    * benefit. The plane array constant-folds to a single literal here. */
  def lshSignature(embCol: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val d = aggregate(zip_with(embCol, planeLit, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      when(d > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ bitwiseOR _)

  /** IVF (inverted-file) ANN: k-means coarse quantizer (deterministic seed
    * centroids + optional Lloyd iterations), corpus assigned to its nearest
    * centroid's cell, queries probe the `nprobe` nearest cells and rescore
    * exactly.
    *
    * Scale design: the centroids are DATA (a tiny broadcast DataFrame), never
    * expression-tree literals — assignment is `corpus crossJoin broadcast(
    * centroids)` followed by a `max_by` per vector, so the physical plan is
    * CONSTANT-SIZE no matter how many cells (1k–64k at production scale; the
    * round-1 literal-inlining variant grew codegen linearly with nCells and
    * was 40% of the whole bench). Search touches corpus/k * nprobe vectors
    * per query. */
  def annIvf(spark: SparkSession, dir: String, maxQueryId: Int = 5, k: Int = 3,
      nCells: Int = 8, nprobe: Int = 2, lloydIters: Int = 0): DataFrame = {
    // vector norms computed ONCE per vector/centroid and carried alongside —
    // every cosine below is then a single inline dot + division (the norms
    // are per-vector quantities; recomputing them per compared pair tripled
    // the dominant per-pair arithmetic)
    val e = emb(spark, dir).select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("n", norm(col("emb")))

    // nearest-centroid assignment as a broadcast join + argmax aggregation;
    // ties break to the lowest cell id (deterministic, oracle-matched)
    def assign(v: DataFrame, cents: DataFrame): DataFrame =
      v.crossJoin(broadcast(cents))
        .groupBy(col("vec_id"))
        .agg(
          first(col("emb")).as("emb"), first(col("n")).as("n"),
          max_by(col("cell"),
            struct((dot(col("emb"), col("centroid")) / (col("n") * col("cn"))).as("c"),
              (-col("cell")).as("t"))).as("cell"))

    // deterministic init: the first nCells vectors seed the centroids
    var centroids: DataFrame = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cell"), col("emb").as("centroid"),
        col("n").as("cn"))

    // Lloyd step: elementwise mean per cell, also pure DataFrame ops —
    // centroid count stays data, not code. A cell that loses every member
    // keeps its previous centroid (same semantics as the classic
    // keep-empty-cells Lloyd variant), so the quantizer never shrinks.
    (0 until lloydIters).foreach { _ =>
      val means = assign(e, centroids)
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cell"), transform(col("ps"), p => p.getField("m")).as("centroid"))
        .withColumn("cn", norm(col("centroid")))
      centroids = means.unionByName(
        centroids.join(means.select("cell"), Seq("cell"), "left_anti"))
    }
    // tiny (nCells rows) but derived from full-corpus scans when Lloyd ran;
    // cached because it feeds both the corpus assignment and the query probes
    centroids = centroids.cache()

    val corpus = assign(e, centroids)
    // queries probe the nprobe nearest cells (rank over the tiny q x cells set)
    val pw = Window.partitionBy(col("q_id")).orderBy(col("pcos").desc, col("cell"))
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("n").as("q_n"))
      .crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("q_n"), col("cell"),
        (dot(col("q_emb"), col("centroid")) / (col("q_n") * col("cn"))).as("pcos"))
      .withColumn("prn", row_number().over(pw)).filter(col("prn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_n"), col("cell"))
    // each corpus vector lives in exactly one cell and probe cells are
    // distinct per query, so (q_id, c_id) pairs are already unique
    val scored = broadcast(q).join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        round(dot(col("q_emb"), col("emb")) / (col("q_n") * col("n")), 4).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Embedding near-duplicate PAIR generation at scale: candidate pairs come
    * only from LSH band-bucket collisions (never an all-pairs product), each
    * surviving candidate is exact-rescored ONCE, and pairs at or above
    * `threshold` survive. The pair-generation analog of [[annLsh]]'s top-k —
    * the scale path for embedding-level corpus dedup, where
    * [[cosinePairs]]'s broadcast-query shape doesn't apply because BOTH
    * sides are the full corpus. Expected bucket size is corpus/2^nPlanes per
    * band; candidate volume is quadratic per bucket — the standard LSH dedup
    * trade, dialed by nPlanes (precision) and nBands (recall). */
  def nearDupPairsLsh(spark: SparkSession, dir: String, threshold: Double = 0.35,
      nPlanes: Int = 8, nBands: Int = 4): DataFrame = {
    val planes = hyperplanes(nPlanes * nBands, 64)
    val bandSigs = (0 until nBands).map { b =>
      lshSignature(col("emb"), planes.slice(b * nPlanes, (b + 1) * nPlanes))
    }
    val e = emb(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("n", norm(col("emb")))
      .withColumn("sigs", array(bandSigs: _*))
    val bands = e.select(col("vec_id"), col("emb"), col("n"),
      posexplode(col("sigs")).as(Seq("band", "sig")))
    val right = bands.select(col("vec_id").as("b_id"), col("emb").as("b_emb"),
      col("n").as("b_n"), col("band"), col("sig"))
    // bucket-local self-join on (band, sig); a<b halves the pairs, distinct
    // collapses multi-band collisions to one rescore
    val cand = bands.join(right, Seq("band", "sig"))
      .filter(col("vec_id") < col("b_id"))
      .dropDuplicates("vec_id", "b_id")
    cand.select(col("vec_id").as("a_id"), col("b_id"),
        round(dot(col("emb"), col("b_emb")) / (col("n") * col("b_n")), 4).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Multi-band LSH ANN: `nBands` independent 8-bit hyperplane signatures
    * per vector; a corpus vector is a candidate for a query if they collide
    * in ANY band (the standard OR-amplification — recall 1-(1-p^b)^L instead
    * of a single band's p^b). At scale the bucketing is ONE narrow pass over
    * the corpus (bands as data via posexplode, one join on (band, sig));
    * candidates are exact-rescored and ranked. Recall/cost dial: more bands
    * = higher recall, proportionally more candidates. */
  def annLsh(spark: SparkSession, dir: String, maxQueryId: Int = 5, k: Int = 3,
      nPlanes: Int = 8, nBands: Int = 4): DataFrame = {
    val planes = hyperplanes(nPlanes * nBands, 64)
    val bandSigs = (0 until nBands).map { b =>
      lshSignature(col("emb"), planes.slice(b * nPlanes, (b + 1) * nPlanes))
    }
    val e = emb(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("n", norm(col("emb")))
      .withColumn("sigs", array(bandSigs: _*))
    val bands = e.select(col("vec_id"), col("emb"), col("n"),
      posexplode(col("sigs")).as(Seq("band", "sig")))
    val q = bands.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("n").as("q_n"),
        col("band"), col("sig"))
    // distinct (q, candidate) pairs across bands, then ONE exact rescore each
    val cand = broadcast(q).join(bands, Seq("band", "sig"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("q_emb"), col("q_n"), col("vec_id").as("c_id"),
        col("emb"), col("n"))
      .dropDuplicates("q_id", "c_id")
    val scored = cand.select(col("q_id"), col("c_id"),
      round(dot(col("q_emb"), col("emb")) / (col("q_n") * col("n")), 4).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }
}
