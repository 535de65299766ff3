package graft.schema

import org.apache.spark.sql.types._

/** Layer-C consumer schemas of the reference engine — the per-table
  * StructTypes the CDC decode parses Debezium-unwrapped JSON against,
  * including the reference's type-fidelity quirks (TIMESTAMP → epoch
  * micros as LongType; DECIMAL(10,2) → opaque StringType) and the
  * orders fallback for unknown tables.
  *
  * Reference: /root/reference/glue-jobs/kafka_to_s3_enhanced.py:107-141
  * (get_table_schema), orders copy kafka_to_s3_batch.py:79-88.
  */
object Schemas {

  /** Kafka wire schema the CDC source exposes — the exact six columns
    * Spark's Kafka batch source produces and the reference consumes
    * (kafka_to_s3_enhanced.py:158-164). key/value are binary; a null
    * value is a Debezium tombstone (kept: config/debezium-config.json:22).
    */
  val wire: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true)
  ))

  /** JSON-lines encoding of the wire contract used by the file-backed
    * source (FIXTURES.md §A.1): key/value as embedded JSON strings.
    */
  val wireJson: StructType = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true)
  ))

  // Per-table value-payload schemas. All fields nullable (the reference
  // declares nullable=True throughout, kafka_to_s3_enhanced.py:110-139);
  // audit columns created_at/updated_at are intentionally not consumed.
  val orders: StructType = StructType(Seq(
    StructField("order_id", IntegerType),
    StructField("customer_id", IntegerType),
    StructField("order_date", LongType),      // epoch micros, kept as long
    StructField("status", StringType),
    StructField("total_amount", StringType),  // Debezium precise decimal, opaque
    StructField("shipping_address", StringType)
  ))

  val customers: StructType = StructType(Seq(
    StructField("customer_id", IntegerType),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("phone", StringType)
  ))

  val products: StructType = StructType(Seq(
    StructField("product_id", IntegerType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("price", StringType),
    StructField("stock_quantity", IntegerType)
  ))

  val orderItems: StructType = StructType(Seq(
    StructField("order_item_id", IntegerType),
    StructField("order_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("quantity", IntegerType),
    StructField("unit_price", StringType),
    StructField("subtotal", StringType)
  ))

  private val byTable: Map[String, StructType] = Map(
    "orders" -> orders,
    "customers" -> customers,
    "products" -> products,
    "order_items" -> orderItems
  )

  /** Schema dispatch with the reference's silent orders fallback for
    * unknown tables (kafka_to_s3_enhanced.py:141).
    */
  def forTable(table: String): StructType = byTable.getOrElse(table, orders)

  /** Output column order per table: value fields in projection order plus
    * the sync-provenance columns (kafka_to_s3_enhanced.py:167-190).
    */
  def outputColumns(table: String): Seq[String] =
    forTable(table).fieldNames.toSeq ++ Seq("kafka_timestamp", "topic", "kafka_offset")

  /** topic name convention: dbserver1.ecommerce.<table>
    * (config/debezium-config.json:15 + table.include.list :11). */
  def topicFor(table: String): String = s"dbserver1.ecommerce.$table"
  def tableFor(topic: String): String = topic.substring(topic.lastIndexOf('.') + 1)
}
