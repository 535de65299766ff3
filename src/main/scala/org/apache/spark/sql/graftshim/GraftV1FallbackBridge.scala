package org.apache.spark.sql.graftshim

/** Public face of the `private[sql]` [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]]
  * marker — the engine contract by which a V2 catalog table names its V1
  * provider for the STREAMING paths (`RelationResolution`'s streaming
  * branch, `DataStreamWriter.writeToV1Table`). Delta's `DeltaTableV2`
  * rides the identical bridge from its own `org.apache.spark.sql.delta`
  * package. Contains no Spark-derived code; it only re-exports the type
  * so `GraftV2Table` (outside the sql package) can implement it. */
trait GraftV1FallbackBridge
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
