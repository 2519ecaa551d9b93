package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract stages.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is real:
  * binary columns, a typed metadata struct, per-partition batched processing
  * (`mapPartitions` over a typed Dataset — the Scala analog of mapInPandas
  * batch shape), and stable output schema. Swap [[decodeStub]] for a real
  * codec and nothing else changes.
  *
  * Scale: decode is per-row CPU work with no shuffle — it scales linearly
  * with executors; the binary payloads stay columnar (parquet byte arrays)
  * end to end.
  */
object multimodal {

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      // STUB decode outputs — deterministic fakes derived from the bytes;
      // a real codec would fill these from the actual image/audio frames
      width: Int,
      height: Int,
      mean_luma: Double)

  /** Build a binary media table from the documents corpus (text bytes stand
    * in for encoded media; the column TYPE and flow are what matters). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("media"))

  /** STUB decoder: deterministic pseudo-decode of a media byte payload.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings) —
    * signature and batching stay identical. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    var h = 1125899906842597L // deterministic fold over the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val luma = math.floorMod(h >> 20, 256).toDouble / 255.0
    (w, ht, luma)
  }

  /** Batched per-partition decode + feature extraction (typed Dataset
    * transform; one task per input partition, no shuffle). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, luma) = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.kind, r.media.length, w, h,
          math.rint(luma * 1e6) / 1e6)
      }
    }
  }

  /** SQL-checkable slice of the plumbing: binary length + sha over the binary
    * payload + kind routing (the decode stub itself is non-SQL; see
    * [[extractFeatures]] for the full path, covered by ScalaTest). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        col("kind"),
        length(col("media")).as("n_bytes"),
        sha2(col("media"), 256).as("media_sha"))
      .orderBy(col("doc_id"))
}
