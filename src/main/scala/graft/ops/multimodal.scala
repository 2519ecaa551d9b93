package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract stages.
  *
  * The IMAGE path decodes for real through the JDK's `javax.imageio`
  * (BMP/PNG/JPEG readers ship with the JVM — no external codecs needed);
  * payloads ImageIO cannot parse (and the audio/video kinds, whose codecs
  * the container lacks) fall back to the clearly-marked deterministic
  * [[decodeStub]]. Either way the Spark-side plumbing is identical and
  * real: binary columns, a typed metadata struct, per-partition batched
  * processing (`mapPartitions` over a typed Dataset — the Scala analog of
  * mapInPandas batch shape), and a stable output schema.
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
    opsutil.spread(spark.read.parquet(s"$dir/documents.parquet"))
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

  /** REAL image decode via the JDK's ImageIO: width/height from the decoded
    * raster and mean luma = avg((r+g+b)/3)/255 over all pixels. None when
    * the payload isn't a decodable image (ImageIO returns null / throws). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, sum.toDouble / (3.0 * w * h * 255.0)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batched per-partition decode + feature extraction (typed Dataset
    * transform; one task per input partition, no shuffle). Image kinds try
    * the real ImageIO decode first; undecodable payloads and codec-less
    * kinds fall back to the stub. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, luma) =
          (if (r.kind == "image") decodeImage(r.media) else None)
            .getOrElse(decodeStub(r.media))
        MediaFeatures(r.doc_id, r.kind, r.media.length, w, h,
          math.rint(luma * 1e6) / 1e6)
      }
    }
  }

  /** Deterministic synthetic BMP corpus: each image doc (doc_id % 3 == 0)
    * becomes a solid-gray BMP whose dimensions and shade are pure functions
    * of doc_id — generated per partition (no shuffle, no driver work), so
    * the ImageIO round-trip is oracle-checkable: the decoder must recover
    * exactly the generated geometry and luma. */
  def syntheticImages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread BEFORE the per-row BMP encode/decode: the doc_id scan is 1-2
    // splits, and ImageIO work in one task serializes the whole corpus
    opsutil.spread(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")).filter(pmod(col("doc_id"), lit(3)) === 0))
      .as[Long].mapPartitions { it =>
        it.map { id =>
          val w = 8 + (id % 16).toInt
          val h = 8 + ((id / 3) % 16).toInt
          val v = (id % 256).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (v << 16) | (v << 8) | v
          var y = 0
          while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "bmp", out)
          MediaRow(id, "image", out.toByteArray)
        }
      }.toDF("doc_id", "kind", "media")
  }

  /** The ImageIO round-trip as an oracle query: decode the synthetic BMPs
    * and report geometry + the 0-255 luma level — DuckDB re-derives all
    * three from doc_id arithmetic, so a decoder that misreads any header
    * field or pixel fails the hash compare. */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, syntheticImages(spark, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_luma") * 255).cast("long").as("luma_level"))
      .orderBy(col("doc_id"))

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
