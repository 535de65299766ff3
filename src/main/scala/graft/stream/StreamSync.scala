package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cdc.Envelope
import graft.schema.Schemas

/** Structured Streaming replacement for the reference's cron-plus-offset-
  * file model (SURVEY.md §2.5): the checkpoint's offset log subsumes
  * OffsetStore, `Trigger.AvailableNow` subsumes the 5-minute Airflow cron,
  * and the sink's commit log upgrades the reference's at-least-once
  * write-then-commit to exactly-once file output.
  */
object StreamSync {

  /** Streaming CDC sync of one table: file-stream of wire-contract
    * JSON-lines → decode → parquet append, checkpointed. Each invocation
    * with AvailableNow drains what's new and stops — the exact semantics
    * the reference approximates with its 5-minute cron + offset file.
    * `topicDir` is a directory of JSON-lines files for ONE topic (Spark's
    * file streaming source tracks files, the moral equivalent of offsets).
    */
  def syncOnce(spark: SparkSession, topicDir: String, table: String,
               warehouseDir: String, checkpointDir: String): Unit = {
    val wire = spark.readStream
      .schema(Schemas.wireJson)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(topicDir)
      .select(
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"), col("timestamp"))
    val q = Envelope.decode(wire, table)
      .writeStream
      .format("parquet")
      .option("path", s"$warehouseDir/${table}_parquet")
      .option("checkpointLocation", s"$checkpointDir/$table")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the streaming form of [[graft.ops.Events.tumbling]]. Late data beyond
    * the watermark is dropped; state is bounded by watermark horizon. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Streaming dedup by key within the watermark horizon — the
    * exactly-once guard the reference's append-only sink lacks. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
}
