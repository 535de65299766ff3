package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import graft.cdc.Envelope
import graft.schema.Schemas

/** Typed event row for the custom-state operators. */
final case class Ev(event_id: Long, user_id: Long, event_type: String,
                    value: Double, ts: java.sql.Timestamp)

/** Per-user running aggregate held in the state store. */
final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

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

  /** Gap-based sessionization with the native `session_window` grouping —
    * the streaming form of [[graft.ops.Events.sessionize]]'s lag+cumsum.
    * Session state merges windows within the 30-min gap and is evicted
    * once the watermark passes, so memory is bounded by open sessions. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("n_events"))

  /** Custom per-key state via mapGroupsWithState: running per-user totals
    * that survive across micro-batches and restarts (state store is
    * checkpointed). This is the escape hatch for stateful logic the
    * built-in window/dedup operators can't express; state is partitioned
    * by key, so it scales with the cluster like any keyed shuffle. */
  import org.apache.spark.sql.{Encoder, Encoders}
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val totalsEnc: Encoder[UserTotals] = Encoders.product[UserTotals]

  def userRunningTotals(events: Dataset[Ev]): Dataset[UserTotals] =
    events.groupByKey(_.user_id).mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotals]) =>
        val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
        val next = evs.foldLeft(prev) { (acc, e) =>
          UserTotals(uid, acc.n_events + 1, acc.total_value + e.value)
        }
        state.update(next)
        next
    }
}
