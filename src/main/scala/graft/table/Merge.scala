package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert) through the [[SnapshotLog]] commit
  * protocol — the storage-side completion of the warehouse pair: the
  * query-side latest-state/merge semantics exist (`cdc_latest_state`,
  * `cdc_merge_snapshot`), but the reference's append-only sink can never
  * APPLY them — every UPDATE lingers as a duplicate row forever. This is
  * the standard lakehouse answer (Delta/Iceberg copy-on-write MERGE,
  * both published designs):
  *
  *  1. **Prune by manifest stats.** The delta's key set is collected
  *     driver-side (a CDC micro-batch is KBs of keys; at larger scale
  *     this becomes a bloom filter per the manifest's zone-map role) and
  *     intersected with each live file's [stats_min, stats_max] key
  *     interval — only files that MAY hold a matched key are touched.
  *     Files outside every delta key's range are carried forward
  *     UNTOUCHED, by reference: their bytes are not read, not rewritten,
  *     and their paths survive the commit identically.
  *  2. **Rewrite only the touched files.** touched rows with matched
  *     keys are replaced by the delta rows; unmatched delta keys are
  *     inserts. One anti-join of the touched subset against the
  *     (broadcastable) delta — the corpus-sized untouched majority never
  *     participates in any join.
  *  3. **Commit atomically** as op=`upsert`: removed = touched paths,
  *     added = rewritten + inserted files (with fresh key stats, so the
  *     next merge prunes just as well). Readers pinned to pre-merge
  *     snapshots are untouched; time travel across the merge works.
  *
  * [[SnapshotLog.diff]] refuses ranges containing an `upsert` commit
  * (row-level change feeds need delete vectors / row lineage — exactly
  * Iceberg's incremental-read behavior over overwrite snapshots): an
  * incremental consumer must fail loudly rather than silently miss
  * updates.
  *
  * At 100 TB the cost is O(touched files + delta), not O(table): a
  * key-clustered layout (range-partitioned or Z-ordered writes — both in
  * this engine) keeps touched-file counts proportional to the delta, and
  * the untouched majority is metadata-only.
  */
object Merge {

  final case class MergeResult(snapshotId: Long, filesTouched: Int,
                               filesUntouched: Int, rowsWritten: Long)

  /** Upsert `delta` into the snapshot table at `tableDir` by equality on
    * `keyCol` (delta wins on match; unmatched delta rows insert). The
    * table must have been written with `statsCol = keyCol` for pruning
    * to engage; files without stats are conservatively treated as
    * touched. */
  def upsert(spark: SparkSession, tableDir: String, delta: DataFrame,
             keyCol: String): MergeResult =
    applyChanges(spark, tableDir, delta, keyCol, deleteCol = None)

  /** The full CDC form: rows of `delta` where `deleteCol` is true are
    * TOMBSTONES — their keys are removed instead of upserted (Debezium's
    * `drop.tombstones=false` wire semantics, applied at the storage
    * layer). Delete keys participate in pruning like any other key (a
    * delete must touch the file holding its row), but contribute no
    * output row. The caller resolves the delta to latest-per-key first —
    * a re-insert after a delete therefore arrives as a plain upsert. */
  def applyChanges(spark: SparkSession, tableDir: String, delta: DataFrame,
                   keyCol: String, deleteCol: Option[String]): MergeResult = {
    val (pendingMasks, live) =
      SnapshotLog.filesAt(spark, tableDir).partition(_.kind == "eqdelete")
    // a COW rewrite reads touched files RAW and re-stamps their rows with
    // a fresh seq — pending equality-delete masks would stop applying to
    // the rewritten copies (deleted rows resurrect). Refuse the mix
    // loudly; the caller materializes first or stays on merge-on-read.
    require(pendingMasks.isEmpty,
      s"table $tableDir has ${pendingMasks.size} pending equality-delete file(s); " +
        "run materializeDeletes before a copy-on-write merge, or use mergeOnRead")
    require(live.nonEmpty, s"cannot merge into empty table $tableDir")
    // KB-scale driver fetch: a CDC delta's distinct keys (deletes included)
    val keys = delta.select(col(keyCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val (touched, untouched) = live.partition { f =>
      (f.statsMin, f.statsMax) match {
        case (Some(mn), Some(mx)) =>
          // any delta key inside [mn, mx]? (sorted array, binary search)
          val i = java.util.Arrays.binarySearch(keys, mn)
          val from = if (i >= 0) i else -i - 1
          from < keys.length && keys(from) <= mx
        case _ => true // no stats: cannot prove untouched
      }
    }
    // tombstones drop out of the written rows; their keys still anti-join
    val upserts = deleteCol.fold(delta)(dc => delta.filter(!col(dc)).drop(dc))
    val merged =
      if (touched.isEmpty) upserts
      else spark.read.parquet(touched.map(_.path): _*)
        .join(delta.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        .unionByName(upserts)
    val written = SnapshotLog.writeData(merged, tableDir, statsCol = Some(keyCol))
    val id = SnapshotLog.commit(spark, tableDir, "upsert", written,
      removed = touched.map(_.path),
      summary = Map("key" -> keyCol, "delta_keys" -> keys.length.toString,
        "files_touched" -> touched.size.toString,
        "files_untouched" -> untouched.size.toString))
    MergeResult(id, touched.size, untouched.size, written.map(_.rows).sum)
  }

  final case class MorResult(snapshotId: Long, dataFiles: Int,
                             deleteEntries: Long, rowsWritten: Long)

  /** MERGE-ON-READ upsert — the write-optimized twin of [[applyChanges]]
    * (Iceberg v2 equality deletes / Delta deletion-vector school, both
    * published designs). Where copy-on-write REWRITES every touched data
    * file, merge-on-read writes only:
    *
    *  1. the delta's surviving rows as new data files (op rows), and
    *  2. ONE equality-delete file listing the delta keys that might
    *     exist in current data — each masks all older-seq rows with
    *     that key at read time.
    *
    * The commit is op=`rowdelta`: write cost is O(delta) regardless of
    * table size — at 100 TB a 1000-row CDC batch costs 1000 rows + a
    * KB-scale key file, vs COW's rewrite of every key-intersecting data
    * file. The price moves to reads (a broadcast-hash mask join per
    * scan, see [[SnapshotLog.applyEqDeletes]]) until
    * [[materializeDeletes]] folds the masks back into clustered data —
    * the classic write-amplification/read-amplification trade, chosen
    * per table by update rate.
    *
    * Manifest key stats still engage, on the WRITE side: delta keys
    * provably outside every live data file's [stats_min, stats_max] are
    * pure inserts and get NO delete entry — steady-state append-mostly
    * tables accrue almost no mask debt. Tombstoned rows (`deleteCol`
    * true) contribute only their mask. The caller resolves the delta to
    * latest-per-key first, exactly as for [[applyChanges]]. */
  def mergeOnRead(spark: SparkSession, tableDir: String, delta: DataFrame,
                  keyCol: String, deleteCol: Option[String] = None,
                  summary: Map[String, String] = Map.empty): MorResult = {
    val live = SnapshotLog.filesAt(spark, tableDir).filter(_.kind == "data")
    require(live.nonEmpty, s"cannot merge into empty table $tableDir")
    val keys = delta.select(col(keyCol).cast("long")).distinct()
      .collect().map(_.getLong(0))
    val unstated = live.exists(f => f.statsMin.isEmpty || f.statsMax.isEmpty)
    val intervals = live.flatMap(f => f.statsMin.zip(f.statsMax))
    val maskKeys = keys.filter(k =>
      unstated || intervals.exists { case (mn, mx) => k >= mn && k <= mx })
    val upserts = deleteCol.fold(delta)(dc => delta.filter(!col(dc)).drop(dc))
      .localCheckpoint(true) // consumed twice: emptiness probe + write
    // an all-tombstone delta writes NO data files (parquet emits no part
    // files for an empty frame, and the stats read-back would fail);
    // the commit then carries only the mask file
    val dataFiles =
      if (upserts.isEmpty) Seq.empty[SnapshotLog.DataFile]
      else SnapshotLog.writeData(upserts, tableDir, statsCol = Some(keyCol))
    val delFiles =
      if (maskKeys.isEmpty) Seq.empty
      else SnapshotLog.writeData(
        delta.select(col(keyCol)).distinct()
          .filter(col(keyCol).cast("long").isin(maskKeys.toSeq: _*))
          .coalesce(1),
        tableDir, statsCol = Some(keyCol), kind = "eqdelete")
    val id = SnapshotLog.commit(spark, tableDir, "rowdelta", dataFiles ++ delFiles,
      summary = summary ++ Map("key" -> keyCol,
        "delta_keys" -> keys.length.toString,
        "delete_entries" -> maskKeys.length.toString,
        "insert_only_keys" -> (keys.length - maskKeys.length).toString))
    MorResult(id, dataFiles.size, maskKeys.length, dataFiles.map(_.rows).sum)
  }

  /** Fold pending equality deletes back into data: rewrite the masked
    * table key-range-clustered, drop every delete file, commit as
    * `replace` (same logical rows — invisible to [[SnapshotLog.diff]]
    * consumers, like any compaction). This is the maintenance job that
    * bounds read amplification: run it when the mask count or
    * masked-fraction crosses a threshold, and the read path returns to
    * a bare pruned scan. Returns None when the table has no pending
    * deletes (no commit made). */
  def materializeDeletes(spark: SparkSession, tableDir: String,
                         targetFiles: Int = 2): Option[Long] = {
    val live = SnapshotLog.filesAt(spark, tableDir)
    val (dels, data) = live.partition(_.kind == "eqdelete")
    if (dels.isEmpty) return None
    val keyCol = spark.read.parquet(dels.head.path).columns.head
    val cols = spark.read.parquet(data.head.path).columns
    val rewritten = SnapshotLog.read(spark, tableDir).get
      .select(cols.map(col): _*)
      .repartitionByRange(targetFiles, col(keyCol))
    val written = SnapshotLog.writeData(rewritten, tableDir, statsCol = Some(keyCol))
    Some(SnapshotLog.commit(spark, tableDir, "replace", written,
      removed = live.map(_.path),
      summary = Map("materialized_deletes" -> dels.map(_.rows).sum.toString)))
  }
}
