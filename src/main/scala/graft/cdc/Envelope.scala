package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Decode of the Debezium-unwrapped Kafka envelope into typed rows.
  *
  * Reproduces the reference's transform chain
  * (/root/reference/glue-jobs/kafka_to_s3_enhanced.py:157-190):
  * cast key/value binary→string, from_json(value) against the per-table
  * consumer schema (PERMISSIVE: malformed → null-filled struct; tombstone
  * null value → all-null struct), flatten the struct, and append the
  * sync-provenance columns kafka_timestamp / topic / kafka_offset.
  *
  * All of it is built-in Catalyst expressions (Cast, JsonToStructs,
  * GetStructField) — whole-stage-codegen'd, no UDFs — so the plan is a
  * single narrow Project over the source scan at any scale.
  */
object Envelope {

  /** value-side decode: wire frame → typed output columns for `table`.
    * `keepPartition` additionally carries the Kafka partition id through
    * as `kafka_partition` — [[SyncJob]] uses it to observe per-partition
    * high-water marks on the write pass, then drops it before the sink
    * (the warehouse schema is partition-agnostic, like the reference's). */
  def decode(wire: DataFrame, table: String,
             keepPartition: Boolean = false): DataFrame = {
    val schema = Schemas.forTable(table)
    val parsed = wire.select(
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), schema).as("data"),
      col("timestamp").as("kafka_timestamp"),
      col("topic"),
      col("offset").as("kafka_offset"),
      col("partition").as("kafka_partition")
    )
    val valueCols = schema.fieldNames.toSeq.map(f => col(s"data.$f").as(f))
    val tail = Seq(col("kafka_timestamp"), col("topic"), col("kafka_offset")) ++
      (if (keepPartition) Seq(col("kafka_partition")) else Nil)
    parsed.select(valueCols ++ tail: _*)
  }

  /** Like [[decode]], but keeps the Kafka record KEY and a tombstone flag.
    * Debezium ships DELETEs as key-only tombstones (the reference keeps
    * them: `transforms.unwrap.drop.tombstones=false`,
    * `config/debezium-config.json:22`) — so delete-aware consumers need
    * the key to know WHICH row died, and the value's nullity (checked on
    * the raw bytes, BEFORE parsing — a malformed non-null value is
    * corruption, not deletion) to know it died. */
  def decodeKeyed(wire: DataFrame, table: String): DataFrame = {
    val schema = Schemas.forTable(table)
    val parsed = wire.select(
      col("key").cast("string").as("kafka_key"),
      col("value").isNull.as("is_tombstone"),
      from_json(col("value").cast("string"), schema).as("data"),
      col("timestamp").as("kafka_timestamp"),
      col("topic"),
      col("offset").as("kafka_offset")
    )
    val valueCols = schema.fieldNames.toSeq.map(f => col(s"data.$f").as(f))
    parsed.select(Seq(col("kafka_key"), col("is_tombstone")) ++ valueCols ++
      Seq(col("kafka_timestamp"), col("topic"), col("kafka_offset")): _*)
  }

  /** Extension (off in parity mode): epoch-microsecond long → TimestampType.
    * The reference keeps order_date as a raw long (SURVEY.md §1.2). */
  def epochMicrosToTimestamp(c: Column): Column = timestamp_micros(c)

  /** Extension (off in parity mode): Debezium `decimal.handling.mode=precise`
    * payloads are base64-encoded unscaled big-endian bytes; the reference
    * stores them as opaque strings. unscaled = signed big-endian int of the
    * decoded bytes; value = unscaled / 10^scale. Built from unbase64 + a
    * native Catalyst expression ([[graft.functions.BigEndianDecimal]]).
    */
  def preciseDecimal(c: Column, precision: Int = 10, scale: Int = 2): Column =
    graft.functions.GraftFunctions.big_endian_decimal(unbase64(c), precision, scale)

  /** Tombstone predicate: Debezium delete markers are records with a null
    * value (drop.tombstones=false, config/debezium-config.json:22). */
  def isTombstone: Column = col("value").isNull
}
