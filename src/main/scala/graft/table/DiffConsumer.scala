package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental CONSUMPTION of a snapshot table — the reference's
  * per-table offset file (/root/reference/glue-jobs/
  * kafka_to_s3_enhanced.py:43,71-80,206-215) elevated from Kafka offsets
  * to snapshot ids: a downstream consumer (an aggregator, an index
  * builder, a training-data exporter) reads ONLY what was appended since
  * its last run, and persists its high-water mark with the same
  * write-then-commit at-least-once contract the CDC sync uses.
  *
  * Semantics inherited from [[SnapshotLog.diff]], all fail-loud:
  *  - compaction (`replace`) between runs is invisible — zero rows, the
  *    HWM still advances;
  *  - an `upsert` between runs throws (file-level feeds cannot express
  *    row-level change) — the consumer must re-read the full table and
  *    [[reset]] to the current snapshot;
  *  - a retention horizon that expired part of the un-consumed range
  *    throws instead of silently dropping the gap.
  *
  * State is one tiny JSON-ish file per (consumer, table) under
  * `stateDir`; the snapshot id is committed AFTER the caller's
  * processing succeeds (call [[commit]] yourself), so a crash mid-
  * process replays the delta — at-least-once, exactly like the
  * reference's offset protocol.
  */
final class DiffConsumer(stateDir: String) {

  private def stateFile(name: String) =
    java.nio.file.Paths.get(s"$stateDir/$name.snapshot")

  /** Last snapshot id this consumer committed; 0 = never ran (consume
    * everything). Corrupt/missing state reads as 0 — the conservative
    * replay-from-start default, mirroring OffsetStore's −1. */
  def lastConsumed(name: String): Long =
    try {
      val p = stateFile(name)
      if (!java.nio.file.Files.exists(p)) 0L
      else new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong
    } catch { case _: Exception => 0L }

  /** The un-consumed delta: (rows appended after the last committed
    * snapshot, the snapshot id to [[commit]] once processed). None rows
    * when nothing logical was appended (the id may still advance past
    * replace commits). */
  def consume(spark: SparkSession, tableDir: String,
              name: String): (Option[DataFrame], Long) = {
    val from = lastConsumed(name)
    val current = SnapshotLog.currentSnapshotId(spark, tableDir).getOrElse(0L)
    if (current <= from) (None, from)
    else (SnapshotLog.diff(spark, tableDir, from, Some(current)), current)
  }

  /** The un-consumed ROW-LEVEL change feed ([[SnapshotLog.changes]]):
    * tolerates `rowdelta` (merge-on-read) commits that [[consume]]'s
    * file-level diff must refuse — each row arrives tagged `_change_op`
    * (insert/upsert/delete) and `_change_snapshot`, so a downstream
    * materialization (an index, an aggregate, an export) can apply
    * keyed updates and deletes instead of re-reading the table.
    * Copy-on-write upserts flow through too when they were committed
    * with row lineage (`Merge.applyChanges(lineage = true)`, r10);
    * lineage-less COW upserts and rollbacks still throw.
    * Compaction/materialization/mask-consolidation `replace` commits
    * contribute nothing. Same at-least-once [[commit]] contract. */
  /** With `preImages = true` events arrive in the Delta-CDF vocabulary
    * (insert / update_preimage / update_postimage / full-payload delete
    * — [[SnapshotLog.changes]]'s preImages contract), which is what a
    * RETRACTION-based incremental materialization needs: subtract the
    * pre-image, add the post-image, never re-read the parent snapshot. */
  def consumeChanges(spark: SparkSession, tableDir: String,
                     name: String,
                     preImages: Boolean = false): (Option[DataFrame], Long) = {
    val from = lastConsumed(name)
    val current = SnapshotLog.currentSnapshotId(spark, tableDir).getOrElse(0L)
    if (current <= from) (None, from)
    else (SnapshotLog.changes(spark, tableDir, from, Some(current),
      preImages = preImages), current)
  }

  /** Persist the high-water mark — call strictly AFTER processing the
    * consumed delta (write-then-commit, at-least-once). */
  def commit(name: String, snapshotId: Long): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    java.nio.file.Files.write(stateFile(name),
      snapshotId.toString.getBytes("UTF-8"))
  }

  /** After a full re-read (the upsert / expired-horizon recovery path):
    * fast-forward to the table's current snapshot. */
  def reset(spark: SparkSession, tableDir: String, name: String): Long = {
    val current = SnapshotLog.currentSnapshotId(spark, tableDir).getOrElse(0L)
    commit(name, current)
    current
  }
}
