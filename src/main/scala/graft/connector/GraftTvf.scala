package graft.connector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftshim.GraftSqlShim

import graft.table.SnapshotLog

/** SQL table-valued functions over the snapshot log — the introspection
  * surface Delta exposes as `DESCRIBE HISTORY`/`table_changes(...)` and
  * Iceberg as metadata tables, phrased as TVFs so they compose with
  * ordinary SQL (`WHERE`, joins, aggregates) instead of needing bespoke
  * command grammar:
  *
  * {{{
  *   SELECT * FROM graft_history('/path/to/table')
  *   SELECT * FROM graft_files('/path/to/table')        -- live at HEAD
  *   SELECT * FROM graft_files('/path/to/table', 3)     -- live at snapshot 3
  *   SELECT * FROM graft_tags('/path/to/table')
  *   SELECT * FROM graft_changes('/path/to/table', 2)   -- feed (2, HEAD]
  *   SELECT * FROM graft_changes('/path/to/table', 2, 5)
  * }}}
  *
  * Builders run at ANALYSIS time on the active session: each resolves
  * the log (driver-side metadata, one read) and returns the analyzed
  * plan of the corresponding Scala-API frame, so the SQL face and the
  * Scala face cannot drift. All argument values must be literals — a
  * TVF has no row context to evaluate anything else against.
  */
object GraftTvf {

  private def spark: SparkSession = SparkSession.active

  /** Targets are a table DIRECTORY (contains '/') or a graft catalog
    * table NAME — the same dual addressing as the maintenance
    * statements, so `SELECT * FROM graft_history('my_table')` works
    * without the user knowing the storage path. */
  private def dirOf(target: String): String =
    if (target.contains("/")) target
    else GraftMaintenance.graftCatalogDir(spark, target.split('.').toSeq)
      .map(_._2)
      .orElse(GraftMaintenance.v2CatalogDir(spark, target.split('.').toSeq))
      .getOrElse(throw new IllegalArgumentException(
        s"$target is neither a graft catalog table (V1 or V2 cat.name) " +
          "nor a table directory"))

  def history(target: String): LogicalPlan =
    GraftSqlShim.planOf(SnapshotLog.history(spark, dirOf(target)))

  def files(target: String, asOf: Option[Long]): LogicalPlan = {
    val s = spark
    import s.implicits._
    GraftSqlShim.planOf(
      SnapshotLog.filesAt(s, dirOf(target), asOf)
        .map(f => (f.path, f.kind, f.seq, f.rows, f.bytes))
        .toDF("path", "kind", "seq", "rows", "bytes"))
  }

  def tags(target: String): LogicalPlan = {
    val s = spark
    import s.implicits._
    GraftSqlShim.planOf(
      SnapshotLog.tags(s, dirOf(target)).toSeq.sortBy(_._2)
        .toDF("tag", "snapshot_id"))
  }

  /** SCHEMA LOG: the column-mapping history as queryable table metadata —
    * one row per retained schema-bearing commit per field, showing each
    * field's id, physical (storage) name, logical name and liveness AT
    * that commit. A rename's old and new names, and a drop's tombstone,
    * are therefore first-class history (`WHERE field_id = 3 ORDER BY
    * snapshot_id` replays one column's biography). Tables that never
    * renamed/dropped return zero rows — they have no mapping to narrate. */
  def schemaLog(target: String): LogicalPlan = {
    val s = spark
    import s.implicits._
    val path = dirOf(target)
    val rows = SnapshotLog.commits(s, path).flatMap { c =>
      c.summary.get(graft.table.FieldRegistry.SummaryKey).toSeq.flatMap { js =>
        val change = c.summary.collectFirst {
          case ("rename_column", v) => s"rename $v"
          case ("drop_column", v) => s"drop $v"
          case ("add_columns", v) => s"add $v"
        }.getOrElse(if (c.op == "replace") "materialize (registry reset)"
          else "registry update")
        graft.table.FieldRegistry.fromJson(js).fields.map(f =>
          (c.snapshotId, change, f.id, f.physical, f.logical, !f.dropped))
      }
    }
    GraftSqlShim.planOf(rows.toDF("snapshot_id", "change", "field_id",
      "physical_name", "logical_name", "live"))
  }

  /** SYNC EPOCHS: every published cross-table epoch marker of a
    * warehouse, one row per (epoch, pinned table) — what an operator
    * joins against `graft_history` to see which snapshot of each table a
    * consumer pinned to an epoch actually reads. */
  def epochs(warehouseDir: String): LogicalPlan = {
    val s = spark
    import s.implicits._
    val rows = graft.table.SyncEpoch.epochs(s, warehouseDir).flatMap { e =>
      graft.table.SyncEpoch.pins(s, warehouseDir, Some(e)).toSeq.sortBy(_._1)
        .map { case (t, pin) => (e, t, pin.dir, pin.snapshot) }
    }
    GraftSqlShim.planOf(rows.toDF("epoch", "table", "dir", "snapshot_id"))
  }

  /** The row-level change feed (from, to] — same refusal semantics as
    * [[SnapshotLog.changes]] (expired snapshots, lineage-less rewrites
    * throw); an empty range yields an empty frame under the table's
    * current read schema + the change columns. */
  /** Live branch refs: name, fork-base snapshot, staged chain length. */
  def branches(target: String): LogicalPlan = {
    val s = spark
    import s.implicits._
    val path = dirOf(target)
    GraftSqlShim.planOf(
      graft.table.Branch.branches(s, path).map { n =>
        (n, graft.table.Branch.baseOf(s, path, n),
          graft.table.Branch.chainLength(s, path, n))
      }.toDF("branch", "base_snapshot", "staged_commits"))
  }

  /** A branch's HEAD state — the fork base folded through its staged
    * chain, masks applied; the SQL face of [[graft.table.Branch.read]]
    * (audit a whole staged pipeline with one query). */
  def branch(target: String, name: String): LogicalPlan = {
    val s = spark
    val path = dirOf(target)
    GraftSqlShim.planOf(graft.table.Branch.read(s, path, name).getOrElse(
      throw new IllegalArgumentException(
        s"branch '$name' of $path has no data files")))
  }

  /** Partition listing from MANIFESTS alone (the Iceberg `partitions`
    * metadata-table analog): per (partition column, value) — live file
    * count, row/byte sums, and whether the attribution is EXACT. Exact
    * requires: no pending delete masks (masked rows would overcount),
    * every row-bearing file RECORDS values for the column (an over-cap
    * or pre-partitioning file could hold any value — undercount), and
    * every contributing file records that single value (a multi-value
    * file's rows can't split between its values — overcount). Inexact
    * groups' sums are BOUNDS, and value lists may be incomplete when
    * value-blind files exist — exact=false is the signal.
    * Zero data files open at any table size — at 100 TB "what days do
    * we have and how big is each" is a driver-side manifest fold.
    * Values report under LOGICAL column names (registry-translated). */
  def partitions(target: String, column: Option[String]): LogicalPlan = {
    val s = spark
    import s.implicits._
    val path = dirOf(target)
    val all = SnapshotLog.filesAt(s, path)
    // pending delete masks hide rows the manifests still count — per-
    // value rows become upper bounds, so EVERY group reports exact=false
    // (the same honesty estimateStatistics applies to masked numRows)
    val masked = all.exists(SnapshotLog.isMask)
    val files0 = all.filter(_.kind == "data")
    val reg = SnapshotLog.registryAt(s, path).filterNot(_.isIdentity)
    val files = reg.map(r => files0.map(r.translateMeta)).getOrElse(files0)
    column.foreach { c =>
      val known = files.flatMap(_.parts.keys).distinct
      require(known.exists(_.equalsIgnoreCase(c)),
        s"graft_partitions: $path records no partition values for " +
          s"column '$c' (has: ${if (known.isEmpty) "none" else known.mkString(", ")})")
    }
    // a row-bearing file that recorded NO values for a column (over the
    // MaxPartValuesPerFile cap, or written before partitionCols named
    // it) may hold ANY value of it — its rows are attributable to no
    // group, so every group of that column is an undercount: flag the
    // whole column non-exact rather than silently drop the file
    val bearing = files.filter(_.rows > 0)
    def columnExact(c: String): Boolean =
      !masked && bearing.forall(_.parts.keys.exists(_.equalsIgnoreCase(c)))
    val rows = files
      .flatMap { f =>
        f.parts.toSeq
          .filter { case (c, _) => column.forall(_.equalsIgnoreCase(c)) }
          .flatMap { case (c, vs) => vs.map(v => (c, v, f, vs.size == 1)) }
      }
      .groupBy { case (c, v, _, _) => (c, v) }
      .toSeq
      .map { case ((c, v), grp) =>
        val fs = grp.map(_._3)
        (c, v, fs.size, fs.map(_.rows).sum, fs.map(_.bytes).sum,
          grp.forall(_._4) && columnExact(c))
      }
      .sortBy { case (c, v, _, _, _, _) => (c, v) }
    GraftSqlShim.planOf(rows
      .toDF("column", "value", "files", "rows", "bytes", "exact"))
  }

  def changes(target: String, from: Long, to: Option[Long]): LogicalPlan = {
    val s = spark
    val path = dirOf(target)
    val df = SnapshotLog.changes(s, path, from, to).getOrElse {
      import org.apache.spark.sql.functions.lit
      val base = SnapshotLog.read(s, path).getOrElse(
        throw new IllegalArgumentException(s"not a graft table: $path"))
      base.withColumn("_change_op", lit("")).withColumn("_change_snapshot", lit(0L))
        .limit(0)
    }
    GraftSqlShim.planOf(df)
  }
}
