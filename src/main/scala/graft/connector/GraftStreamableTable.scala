package graft.connector

/** The face [[org.apache.spark.sql.graftshim.GraftStreamingTableRule]]
  * keys on: a V2 catalog table that can be streamed through the V1
  * `format("graft")` source by table DIRECTORY. Public (unlike
  * [[GraftV2Table]]) because the rule lives in the `org.apache.spark.sql`
  * shim package — the `private[sql]` streaming plan nodes it rewrites
  * aren't visible from here. */
trait GraftStreamableTable {
  /** The snapshot-log table directory the stream reads. */
  def streamTableDir: String
  /** The time-travel pin the relation was resolved with, if any —
    * streaming from a pinned snapshot refuses loudly. */
  def streamPinnedAsOf: Option[Long]
}
