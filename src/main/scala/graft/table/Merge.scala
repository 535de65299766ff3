package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Copy-on-write MERGE (upsert) through the [[SnapshotLog]] commit
  * protocol — the storage-side completion of the warehouse pair: the
  * query-side latest-state/merge semantics exist (`cdc_latest_state`,
  * `cdc_merge_snapshot`), but the reference's append-only sink can never
  * APPLY them — every UPDATE lingers as a duplicate row forever. This is
  * the standard lakehouse answer (Delta/Iceberg copy-on-write MERGE,
  * both published designs):
  *
  *  1. **Prune by manifest stats.** Each live file's [stats_min,
  *     stats_max] key interval is intersected with the delta's key set —
  *     only files that MAY hold a matched key are touched. For CDC-scale
  *     deltas (≤ [[DefaultMaxDriverKeys]] distinct keys) the key set is
  *     a KB-scale sorted array on the driver; beyond that the decision
  *     DISTRIBUTES ([[touchedFiles]]) so a 100 M-key backfill degrades
  *     to one broadcast range join instead of OOMing the driver. Files
  *     outside every delta key's range are carried forward UNTOUCHED,
  *     by reference: their bytes are not read, not rewritten, and their
  *     paths survive the commit identically.
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
  * Schema DRIFT between the table and the delta routes through the
  * [[graft.schema.Evolution]] widening lattice: declared renames apply
  * to the table side, both sides cast to the LUB types, added columns
  * null-fill on carried-forward rows — and off-lattice drift (string vs
  * int, narrowing) throws at WRITE time instead of corrupting the table
  * or failing some later read.
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

  /** Distinct-key-count threshold above which the touched-file decision
    * and the merge-on-read mask-key selection stop collecting keys to
    * the driver and distribute instead. 100 k longs ≈ 800 KB — well
    * under any driver budget — while a backfill delta (millions of
    * keys) goes straight to the distributed path. */
  val DefaultMaxDriverKeys: Int = 100000

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

  /** The delta's distinct keys, split into a physical strategy by size:
    * Left(sorted driver array) when ≤ maxDriverKeys (probed with one
    * limit-bounded collect — no count job), Right(distinct-key frame,
    * eagerly checkpointed for its multiple consumers) beyond. */
  private def keySet(delta: DataFrame, keyCol: String,
                     maxDriverKeys: Int): Either[Array[Long], DataFrame] = {
    val keyDf = delta.select(col(keyCol).cast("long").as("k")).distinct()
    val probe = keyDf.limit(maxDriverKeys + 1).collect().map(_.getLong(0))
    if (probe.length <= maxDriverKeys) Left(probe.sorted)
    else Right(keyDf.localCheckpoint(true))
  }

  /** Does any key of the sorted array fall inside [mn, mx]? */
  private def hits(keys: Array[Long], mn: Long, mx: Long): Boolean = {
    val i = java.util.Arrays.binarySearch(keys, mn)
    val from = if (i >= 0) i else -i - 1
    from < keys.length && keys(from) <= mx
  }

  /** A file's manifest zone for the MERGE KEY, from the per-COLUMN stats
    * map — never the legacy first-stats-column pair, which may describe a
    * different column entirely (e.g. a Z-order compaction records its
    * cluster dimension first): pruning in the wrong domain would skip
    * files that DO hold delta keys and silently lose updates. A file
    * with no recorded zone for `keyCol` is conservatively unprunable. */
  private def keyZone(f: SnapshotLog.DataFile, keyCol: String): Option[(Long, Long)] =
    f.stats.get(keyCol)

  /** Broadcastable metadata frame of the stats-bearing live files:
    * (idx, mn, mx, bloom) — the file's manifest key-column zone plus its
    * manifest bloom when one was written. Thousands of rows at 100 TB:
    * metadata, not data. */
  private def fileStatsDf(spark: SparkSession, keyCol: String,
                          stated: Seq[SnapshotLog.DataFile]): DataFrame = {
    import spark.implicits._
    stated.zipWithIndex.map { case (f, i) =>
      val (mn, mx) = keyZone(f, keyCol).get
      (i, mn, mx,
        f.blooms.get(keyCol)
          .map(java.util.Base64.getDecoder.decode).orNull)
    }.toDF("idx", "mn", "mx", "bloom")
  }

  /** Partition `live` into (touched, untouched) by the delta key set.
    * Driver path: binary-search each file interval against the sorted
    * array. Distributed path (the large-delta escalation the COW
    * docstring promises): broadcast the file intervals against the key
    * frame as a range join, refine by each file's manifest BLOOM where
    * present (`bloom_might_contain` has no false negatives, so the
    * refinement can only skip, never lose), and collect just the
    * touched file INDICES — bounded by file count, never by delta size.
    * Files without stats are conservatively touched on both paths. */
  private def touchedFiles(spark: SparkSession, keyCol: String,
                           live: Seq[SnapshotLog.DataFile],
                           keys: Either[Array[Long], DataFrame])
      : (Seq[SnapshotLog.DataFile], Seq[SnapshotLog.DataFile]) = {
    val (stated, unstated) = live.partition(f => keyZone(f, keyCol).isDefined)
    keys match {
      case Left(arr) =>
        val (t, u) = stated.partition { f =>
          val (mn, mx) = keyZone(f, keyCol).get; hits(arr, mn, mx)
        }
        (unstated ++ t, u)
      case Right(keyDf) =>
        val hit = keyDf
          .join(broadcast(fileStatsDf(spark, keyCol, stated)),
            col("k") >= col("mn") && col("k") <= col("mx"))
          .filter(col("bloom").isNull || graft.functions.GraftFunctions
            .bloom_might_contain(col("bloom"), col("k"), SnapshotLog.BloomHashes))
          .select(col("idx")).distinct()
          .collect().map(_.getInt(0)).toSet
        val (t, u) = stated.zipWithIndex.partition { case (_, i) => hit(i) }
        (unstated ++ t.map(_._1), u.map(_._1))
    }
  }

  private def sameShape(a: StructType, b: StructType): Boolean =
    a.fields.length == b.fields.length &&
      a.fields.map(f => f.name -> f.dataType).toMap ==
        b.fields.map(f => f.name -> f.dataType).toMap

  /** The full CDC form: rows of `delta` where `deleteCol` is true are
    * TOMBSTONES — their keys are removed instead of upserted (Debezium's
    * `drop.tombstones=false` wire semantics, applied at the storage
    * layer). Delete keys participate in pruning like any other key (a
    * delete must touch the file holding its row), but contribute no
    * output row. The caller resolves the delta to latest-per-key first —
    * a re-insert after a delete therefore arrives as a plain upsert.
    * `renames` declares old→new column renames when the delta's schema
    * drifted from the table's (`keyCol` is the POST-rename name). */
  def applyChanges(spark: SparkSession, tableDir: String, delta: DataFrame,
                   keyCol: String, deleteCol: Option[String],
                   renames: Map[String, String] = Map.empty,
                   maxDriverKeys: Int = DefaultMaxDriverKeys): MergeResult = {
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
    val keys = keySet(delta, keyCol, maxDriverKeys)
    val nKeys = keys.fold(_.length.toLong, _.count())
    val (touched, untouched) = touchedFiles(spark, keyCol, live, keys)
    // tombstones drop out of the written rows; their keys still anti-join
    val upserts = deleteCol.fold(delta)(dc => delta.filter(!col(dc)).drop(dc))
    val merged =
      if (touched.isEmpty) upserts
      else {
        val survivors = graft.schema.Evolution
          .applyRenames(spark.read.parquet(touched.map(_.path): _*), renames)
          .join(delta.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        if (sameShape(survivors.schema, upserts.schema))
          survivors.unionByName(upserts)
        // drifted delta: LUB-cast both sides, null-fill additions on the
        // carried rows; off-lattice drift throws HERE, before any write
        else graft.schema.Evolution.mergeEpochs(Seq(survivors, upserts))
      }
    val written = SnapshotLog.writeData(merged, tableDir, statsCol = Some(keyCol))
    val id = SnapshotLog.commit(spark, tableDir, "upsert", written,
      removed = touched.map(_.path),
      summary = Map("key" -> keyCol, "delta_keys" -> nKeys.toString,
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
    * tables accrue almost no mask debt. Past [[DefaultMaxDriverKeys]]
    * distinct keys that selection runs as a distributed semi-join
    * against the broadcast file intervals (+ manifest blooms) instead
    * of a driver array. Tombstoned rows (`deleteCol` true) contribute
    * only their mask. The caller resolves the delta to latest-per-key
    * first, exactly as for [[applyChanges]].
    *
    * A drifted delta schema simply becomes the new epoch's file schema —
    * the read path merges epochs through the Evolution lattice — but
    * off-lattice drift is validated HERE (one footer read per distinct
    * epoch, driver-side) so the pipeline stops at write time, not at
    * some later reader. */
  def mergeOnRead(spark: SparkSession, tableDir: String, delta: DataFrame,
                  keyCol: String, deleteCol: Option[String] = None,
                  summary: Map[String, String] = Map.empty,
                  renames: Map[String, String] = Map.empty,
                  maxDriverKeys: Int = DefaultMaxDriverKeys): MorResult = {
    val live = SnapshotLog.filesAt(spark, tableDir).filter(_.kind == "data")
    require(live.nonEmpty, s"cannot merge into empty table $tableDir")
    val upserts = deleteCol.fold(delta)(dc => delta.filter(!col(dc)).drop(dc))
      .localCheckpoint(true) // consumed twice: emptiness probe + write
    // off-lattice drift fails the WRITE: cheap fast path (one footer)
    // when nothing drifted, full per-epoch validation when it did
    val headSchema = spark.read.parquet(live.head.path).schema
    if (renames.nonEmpty || !sameShape(headSchema, upserts.schema)) {
      val epochSchemas = live.groupBy(_.seq).values
        .map(fs => spark.read.parquet(fs.head.path).schema).toSeq
      graft.schema.Evolution.mergedSchema(epochSchemas :+ upserts.schema, renames)
    }
    val keys = keySet(delta, keyCol, maxDriverKeys)
    val nKeys = keys.fold(_.length.toLong, _.count())
    val stated = live.filter(f => keyZone(f, keyCol).isDefined)
    val unstated = live.size > stated.size
    // the delta keys that MIGHT exist in live data (mask entries); pure
    // inserts — provably outside every file's key zone — get none
    val maskKeyDf: DataFrame = keys match {
      case Left(arr) =>
        import spark.implicits._
        val masks =
          if (unstated) arr.toSeq
          else arr.toSeq.filter(k => stated.exists { f =>
            val (mn, mx) = keyZone(f, keyCol).get; k >= mn && k <= mx
          })
        masks.toDF("k")
      case Right(keyDf) =>
        if (unstated) keyDf
        else keyDf.join(broadcast(fileStatsDf(spark, keyCol, stated)),
            col("k") >= col("mn") && col("k") <= col("mx"))
          .filter(col("bloom").isNull || graft.functions.GraftFunctions
            .bloom_might_contain(col("bloom"), col("k"), SnapshotLog.BloomHashes))
          .select(col("k")).distinct()
    }
    // an all-tombstone delta writes NO data files (parquet emits no part
    // files for an empty frame, and the stats read-back would fail);
    // the commit then carries only the mask file
    val dataFiles =
      if (upserts.isEmpty) Seq.empty[SnapshotLog.DataFile]
      else SnapshotLog.writeData(upserts, tableDir, statsCol = Some(keyCol))
    val delFiles =
      if (maskKeyDf.isEmpty) Seq.empty
      else SnapshotLog.writeData(
        delta.select(col(keyCol)).distinct()
          .join(maskKeyDf, col(keyCol).cast("long") === col("k"), "left_semi")
          .coalesce(1),
        tableDir, statsCol = Some(keyCol), kind = "eqdelete")
    val maskEntries = delFiles.map(_.rows).sum
    val id = SnapshotLog.commit(spark, tableDir, "rowdelta", dataFiles ++ delFiles,
      summary = summary ++ Map("key" -> keyCol,
        "delta_keys" -> nKeys.toString,
        "delete_entries" -> maskEntries.toString,
        "insert_only_keys" -> (nKeys - maskEntries).toString))
    MorResult(id, dataFiles.size, maskEntries, dataFiles.map(_.rows).sum)
  }

  /** Fold pending equality deletes back into data: rewrite the masked
    * table clustered, drop every delete file, commit as `replace` (same
    * logical rows — invisible to [[SnapshotLog.diff]] consumers, like
    * any compaction). This is the maintenance job that bounds read
    * amplification: run it when the mask count or masked-fraction
    * crosses a threshold, and the read path returns to a bare pruned
    * scan. The rewrite is key-range-clustered on the delete key by
    * default; `clusterZOrder = Seq(x, y)` instead restores a 2-D
    * Z-ORDER layout (near-square zone-map tiles on both dims, with the
    * key column's stats still recorded for merge pruning) — so MOR
    * maintenance on a Z-ordered table doesn't silently decay the layout
    * `readWhere` depends on. Returns None when the table has no pending
    * deletes (no commit made). */
  def materializeDeletes(spark: SparkSession, tableDir: String,
                         targetFiles: Int = 2,
                         clusterZOrder: Seq[String] = Nil,
                         renames: Map[String, String] = Map.empty): Option[Long] = {
    require(clusterZOrder.isEmpty || clusterZOrder.size == 2,
      s"clusterZOrder takes exactly two dimensions, got $clusterZOrder")
    val live = SnapshotLog.filesAt(spark, tableDir)
    val (dels, data) = live.partition(_.kind == "eqdelete")
    if (dels.isEmpty) return None
    val keyCol = spark.read.parquet(dels.head.path).columns.head
    val masked = SnapshotLog.read(spark, tableDir, renames = renames).get
    val rewritten = clusterZOrder match {
      case Seq(cx, cy) => graft.cdc.Compaction.zorderArrange(masked, cx, cy, targetFiles)
      case _ => masked.repartitionByRange(targetFiles, col(keyCol))
    }
    val written = SnapshotLog.writeData(rewritten, tableDir,
      statsCol = Some(keyCol), statsCols = clusterZOrder)
    Some(SnapshotLog.commit(spark, tableDir, "replace", written,
      removed = live.map(_.path),
      summary = Map("materialized_deletes" -> dels.map(_.rows).sum.toString)))
  }
}
