package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `SQLContext.internalCreateDataFrame(…, isStreaming = true)`
  * — the only way a DSv1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * can hand micro-batch DataFrames to the stream execution engine, and a
  * `private[sql]` method, hence this file's package placement (the same
  * bridge published streaming connectors use: Delta's DeltaSource lives
  * under `org.apache.spark.sql.delta` for exactly this call). Contains
  * no Spark-derived code; it only forwards.
  */
object GraftSqlShim {

  /** The batch's rows as a STREAMING-tagged DataFrame with exactly
    * `schema` (callers align names/types/order first); None = an empty
    * micro-batch. */
  def streamingDataFrame(sqlContext: org.apache.spark.sql.SQLContext,
                         batch: Option[org.apache.spark.sql.DataFrame],
                         schema: StructType): org.apache.spark.sql.DataFrame = {
    val classic = sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val rdd: RDD[InternalRow] = batch match {
      case Some(df) =>
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
          .queryExecution.toRdd
      case None => classic.sparkContext.emptyRDD[InternalRow]
    }
    classic.internalCreateDataFrame(rdd, schema, isStreaming = true)
  }

  /** The inverse bridge for SINKS: `addBatch` receives a STREAMING-tagged
    * plan that batch writers refuse; rebuild it as a batch DataFrame over
    * the same physical rows (the stock FileStreamSink does exactly this
    * before handing the batch to FileFormatWriter). */
  def batchDataFrame(sqlContext: org.apache.spark.sql.SQLContext,
                     data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val rdd: RDD[InternalRow] =
      data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.toRdd
    classic.internalCreateDataFrame(rdd, data.schema, isStreaming = false)
  }

  /** A resolved logical plan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]`; the graft INSERT command needs it to execute the
    * insert's source query. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column ↔ Expression bridges for the DML face: resolved Catalyst
    * expressions from analyzed DELETE/UPDATE/MERGE statements are
    * re-bound and re-issued as Columns over fresh scans.
    * `ExpressionUtils` is `private[sql]`, hence the forward. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** The analyzed logical plan of a DataFrame — what a table-valued
    * function builder must return. Classic `Dataset.queryExecution` is
    * public but the DataFrame alias is the abstract API type; this
    * forward keeps the cast in one place. */
  def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** An EXTENSION-FREE session on the shared context — what a stock
    * Spark distribution gives a user. Drives (and oracle-checks) the
    * engine-contract faces that only engage when the graft analyzer
    * rules are absent: the delta-based SupportsRowLevelOperations DML
    * path (with the extensions loaded, [[graft.connector.GraftDmlRule]]
    * rewrites DML first, so the V2 contract would otherwise run
    * untested). The constructor is `private[sql]`, hence this forward. */
  def vanillaSession(sc: org.apache.spark.SparkContext)
      : org.apache.spark.sql.SparkSession =
    new org.apache.spark.sql.classic.SparkSession(sc)

}
