package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.ingest.ReplayEngine

/** Structured Streaming driver: the binlog/WAL tail as a file stream, each
  * micro-batch applied as one CDC epoch through the same [[ReplayEngine]] the
  * batch path uses (SURVEY.md §2.8 mapping).
  *
  * Exactly-once composition: Structured Streaming's checkpoint guarantees each
  * micro-batch is re-delivered with the SAME batchId after a crash, and the
  * lake table's epoch fence makes re-application of a committed batchId a
  * no-op — together: exactly-once sink semantics over an at-least-once
  * delivery, the standard foreachBatch idempotent-sink pattern.
  *
  * At scale: the file source is a stand-in for a real WAL tail (Kafka jars
  * absent in this sandbox); `maxFilesPerTrigger` bounds epoch size, and all
  * heavy work (dedup shuffle + merge join + bucket rewrite) happens inside
  * applyEpoch on the cluster.
  */
object streaming {

  /** Tail a directory of change-event parquet files as a stream. */
  def changeStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Streaming analytics over the change feed itself: watermarked, windowed
    * per-op counts + key cardinality estimate (the SLO-metrics analog of the
    * reference, src/metadata/slo/quality.py, in streaming form). `tsCol` must
    * be an event-time timestamp column on the stream. */
  def changeFeedMetrics(events: DataFrame, tsCol: String,
      windowLen: String = "1 minute", watermark: String = "5 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("op"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(concat_ws("|", col("repo"), col("path"))).as("approx_keys"),
        min("lsn").as("lsn_min"), max("lsn").as("lsn_max"))
  }

  /** Run the CDC apply loop over a streaming source; one micro-batch = one
    * epoch. `Trigger.AvailableNow` drains everything currently in the source
    * then stops (deterministic for tests/bench); pass ProcessingTime for a
    * long-lived tail. */
  def replayStream(events: DataFrame, engine: ReplayEngine, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        engine.applyEpoch(batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
