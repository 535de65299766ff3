package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed warehouse layout: pre-hash-partition fact tables on their join
  * key at write time so repeated fact⋈fact joins and keyed aggregations
  * run with ZERO exchange — the bucket metadata lets Catalyst prove both
  * sides are already co-partitioned.
  *
  * This is the 100 TB answer to the shuffle in rel_q22 (orders ⋈ lineitem):
  * the shuffle is paid ONCE at ingest (or never, if the sink writes
  * bucketed), instead of on every join. The sync_date partitioning in
  * [[graft.cdc.SyncJob]] prunes scans by time; bucketing co-locates by key
  * — the two compose (partition dirs × buckets within each).
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered in the session catalog (bucket metadata lives in the
    * catalog; the files are ordinary parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Per-order revenue over two co-bucketed fact tables: join + keyed agg,
    * both reusing the bucket partitioning — the physical plan has no
    * Exchange at all (asserted in RelationalSpec). */
  def cocolocatedOrderRevenue(spark: SparkSession,
                              ordersTable: String, lineitemTable: String): DataFrame = {
    val o = spark.table(ordersTable)
    val li = spark.table(lineitemTable)
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
  }
}
