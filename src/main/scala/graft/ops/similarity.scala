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

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** cosine(a, b) as a Column over two array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** All pairs (query in [0, maxQueryId) x corpus) with cosine >= threshold.
    * Broadcast the tiny query side; the corpus streams. */
  def cosinePairs(spark: SparkSession, dir: String, maxQueryId: Int, threshold: Double): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
    broadcast(q).join(c, col("q_id") < col("c_id"))
      .select(col("q_id"), col("c_id"), round(cosine(col("q_emb"), col("c_emb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("q_id"), col("c_id"))
  }

  /** Brute-force exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(spark: SparkSession, dir: String, maxQueryId: Int = 5, k: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_emb"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), round(cosine(col("q_emb"), col("c_emb")), 4).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Deterministic random hyperplanes: nPlanes x dim, seeded. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH signature (one bit per plane) as a Column. */
  def lshSignature(embCol: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(zip_with(embCol, planeLit, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ bitwiseOR _)

  /** IVF (inverted-file) ANN: k-means coarse quantizer (deterministic seed
    * centroids + Lloyd iterations, all as DataFrame aggregations), corpus
    * assigned to its nearest centroid's cell, queries probe the `nprobe`
    * nearest cells and rescore exactly. The scale path: assignment is one
    * narrow pass; search touches corpus/k * nprobe vectors per query. */
  def annIvf(spark: SparkSession, dir: String, maxQueryId: Int = 5, k: Int = 3,
      nCells: Int = 8, nprobe: Int = 2, lloydIters: Int = 2): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), asDouble(col("embedding")).as("emb")).cache()

    // deterministic init: the first nCells vectors seed the centroids
    var centroids: Array[Array[Double]] = e.filter(col("vec_id") < nCells)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)

    def nearestCell(embCol: Column, cs: Array[Array[Double]]): Column =
      cs.zipWithIndex.map { case (c, i) =>
        struct(cosine(embCol, array(c.map(lit): _*)).as("cos"), lit(i).as("cell"))
      }.reduce((a, b) => when(a.getField("cos") >= b.getField("cos"), a).otherwise(b))
        .getField("cell")

    // Lloyd: assign -> elementwise mean per cell (posexplode + groupBy)
    (0 until lloydIters).foreach { _ =>
      val assigned = e.withColumn("cell", nearestCell(col("emb"), centroids))
      val means = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cell"), transform(col("ps"), p => p.getField("m")).as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }

    val corpus = e.withColumn("cell", nearestCell(col("emb"), centroids))
    // queries probe the nprobe nearest cells
    val cellScores = (0 until centroids.length).map(i =>
      struct(cosine(col("q_emb"), array(centroids(i).map(lit): _*)).as("cos"), lit(i).as("cell")))
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      .withColumn("probe_cells", slice(reverse(array_sort(array(cellScores: _*))), 1, nprobe))
      .select(col("q_id"), col("q_emb"), explode(col("probe_cells")).as("pc"))
      .select(col("q_id"), col("q_emb"), col("pc.cell").as("cell"))
    val scored = broadcast(q).join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        round(cosine(col("q_emb"), col("emb")), 4).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    val out = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
    e.unpersist()
    out
  }

  /** LSH-bucketed ANN: bucket corpus by 8-bit hyperplane signature, search
    * each query only within its bucket (plus exact rescoring). At scale the
    * bucketing is ONE narrow pass over the corpus; queries never see vectors
    * outside their bucket. Approximate by construction — recall depends on
    * bucket width. */
  def annLsh(spark: SparkSession, dir: String, maxQueryId: Int = 5, k: Int = 3,
      nPlanes: Int = 8): DataFrame = {
    val planes = hyperplanes(nPlanes, 64)
    val e = emb(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("bucket", lshSignature(col("emb"), planes))
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("bucket"))
    val scored = broadcast(q).join(e, Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        round(cosine(col("q_emb"), col("emb")), 4).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }
}
