package graft.connector

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.table.SnapshotLog

/** A snapshot id as a streaming offset — totally ordered, resumable from
  * the checkpoint's JSON form alone. */
final class GraftSourceOffset(val snapshotId: Long) extends Offset {
  override def json: String = snapshotId.toString
}

/** `spark.readStream.format("graft")` — the table's APPEND LOG as a
  * structured-streaming source (the Delta streaming-source shape): each
  * micro-batch is the data files added by the `append` commits in one
  * snapshot interval (from, to], resolved from manifests alone. The
  * interval rule inherits [[SnapshotLog.diff]]'s semantics:
  *
  *  - `append` commits emit their added data files — file-granular, so a
  *    batch never splits or re-reads a file;
  *  - `replace` commits (compaction / Z-order / mask consolidation)
  *    contribute NOTHING: maintenance stays invisible to a live stream
  *    exactly as it is to batch incremental consumers;
  *  - data-CHANGING commits (`upsert`, `rowdelta`, `rollback`) make an
  *    append-only read a lie, so the source THROWS, naming the snapshot
  *    — unless `skipChangeCommits=true` (the published Delta option
  *    semantics) says to stream past them, consuming only appends.
  *
  * Offsets are snapshot ids: replay-safe (a recomputed (from, to] is the
  * same file set — manifests are immutable), checkpoint-resumable (the
  * offset round-trips through JSON), and exactly-once END-TO-END when the
  * sink is idempotent per batch id. `startingVersion` picks the first
  * batch's exclusive lower bound: absent = 0 (the whole table-so-far is
  * batch one), `latest` = only commits after stream start, N = commits
  * after snapshot N; `startingTimestamp` resolves to the earliest
  * retained commit at/after the timestamp (mutually exclusive with
  * `startingVersion`). Expired snapshots inside a requested interval
  * fail loudly (retention must outlive consumer lag — the same contract
  * as the change feed).
  */
final class GraftStreamSource(
    sqlContext: SQLContext,
    tableDir: String,
    override val schema: StructType,
    options: Map[String, String],
    metadataPath: String) extends Source {

  private val spark = sqlContext.sparkSession

  private val skipChangeCommits =
    options.get("skipChangeCommits").exists(_.toBoolean)

  /** `readChangeFeed=true` (the Delta CDF-streaming shape): each batch is
    * the ROW-LEVEL change feed of its snapshot interval — inserts from
    * appends, upserts/deletes from merge-on-read and lineage-stamped
    * copy-on-write commits (SQL DML rides those), `_change_op` /
    * `_change_snapshot` columns appended — so downstream incremental
    * materializations consume O(delta) per trigger instead of re-reading
    * state. Same derivability contract as [[SnapshotLog.changes]]:
    * lineage-less rewrites fail loudly, maintenance `replace` commits
    * are invisible. Delete events are key-only (payload columns null). */
  private val readChangeFeed =
    options.get("readChangeFeed").exists(_.toBoolean)
  require(!(readChangeFeed && skipChangeCommits),
    "readChangeFeed consumes change commits as row-level events; " +
      "skipChangeCommits would contradict it — set only one")

  /** `cdfPreImages=true` (with readChangeFeed): events arrive in the
    * Delta-CDF vocabulary — update_preimage/update_postimage pairs for
    * keys that existed in the commit's parent, full-payload deletes —
    * so a retraction-based downstream materialization maintains itself
    * from the stream alone. Same schema, richer `_change_op` values. */
  private val cdfPreImages =
    options.get("cdfPreImages").exists(_.toBoolean)
  require(!cdfPreImages || readChangeFeed,
    "cdfPreImages=true needs readChangeFeed=true (it refines the change " +
      "feed's event vocabulary)")

  /** Exclusive lower bound of the first batch, fixed ONCE per checkpoint
    * and pinned under `metadataPath` — `startingVersion=latest` must
    * resolve to the snapshot at FIRST start, not at every restart: a
    * restart that re-resolved "latest" to the current head would silently
    * skip everything committed while the stream was down (and a WAL'd
    * first batch replayed after a crash would resolve empty). The pin
    * file is written create-no-overwrite, so a racing duplicate start
    * reads the winner's value.
    *
    * With `startingVersion` ABSENT on a retention-maintained table whose
    * early snapshots are already vacuumed, a literal 0 lower bound can
    * never resolve (the missing-id check refuses the interval) — a
    * brand-new default stream would be permanently unstartable. That
    * case pins INITIAL-SNAPSHOT semantics instead (the Delta "initial
    * snapshot then deltas" shape, pin form `init:<id>`): the first batch
    * seeds the oldest retained snapshot's resolved live state, and
    * deltas follow from there. The seed id is pinned, not re-resolved,
    * so a WAL'd first batch replays the same state. */
  private val (startFrom: Long, initialSnapshot: Option[Long]) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(metadataPath + "/"), spark.sparkContext.hadoopConfiguration)
    val pin = new org.apache.hadoop.fs.Path(metadataPath, "graft-start")
    def parsePin(s: String): (Long, Option[Long]) = {
      val t = s.trim
      if (t.startsWith("init:")) {
        val id = t.stripPrefix("init:").toLong
        (id, Some(id))
      } else (t.toLong, None)
    }
    def readPin(): Option[(Long, Option[Long])] =
      if (!fs.exists(pin)) None
      else {
        val in = fs.open(pin)
        try Some(parsePin(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")))
        finally in.close()
      }
    readPin().getOrElse {
      require(!(options.contains("startingVersion") &&
          options.contains("startingTimestamp")),
        "graft stream source: specify startingVersion OR startingTimestamp, " +
          "not both")
      val resolved: (Long, Option[Long]) = options.get("startingVersion") match {
        case Some("latest") =>
          (SnapshotLog.currentSnapshotId(spark, tableDir).getOrElse(0L), None)
        case Some(v) => (v.toLong, None)
        // startingTimestamp (the Delta option): the first batch begins
        // with the earliest retained commit AT OR AFTER the timestamp —
        // the exclusive lower bound is the last commit strictly before
        // it. A timestamp predating RETAINED history can't replay the
        // vacuumed commits, so it degrades to the same initial-snapshot
        // seeding as a default start (the oldest retained snapshot IS
        // the union of everything vacuumed before it); legacy manifests
        // without ts_ms sort as older than any real timestamp.
        case None if options.contains("startingTimestamp") =>
          val t = GraftDataSource.parseTimestampMs(options("startingTimestamp"))
          val cs = SnapshotLog.commits(spark, tableDir)
          val before = cs.takeWhile(_.tsMs < t)
          if (before.size == cs.size) // after every commit: only new ones
            (cs.lastOption.map(_.snapshotId).getOrElse(0L), None)
          else if (before.nonEmpty) (before.last.snapshotId, None)
          else cs.headOption match {
            case Some(c) if c.snapshotId > 1L => (c.snapshotId, Some(c.snapshotId))
            case _ => (0L, None)
          }
        case None =>
          val ids = SnapshotLog.snapshots(spark, tableDir)
          ids.headOption match {
            case Some(oldest) if oldest > 1L => (oldest, Some(oldest))
            case _ => (0L, None) // empty table, or full history retained
          }
      }
      fs.mkdirs(new org.apache.hadoop.fs.Path(metadataPath))
      val encoded = resolved._2.fold(resolved._1.toString)(id => s"init:$id")
      try {
        val out = fs.create(pin, false) // no-overwrite: first writer wins
        out.write(encoded.getBytes("UTF-8"))
        out.close()
        resolved
      } catch {
        case _: java.io.IOException => readPin().getOrElse(resolved)
      }
    }
  }

  /** Rate limit (the Delta option): cap each micro-batch at roughly this
    * many data FILES, advancing the offset commit-by-commit (a commit is
    * never split — offsets stay snapshot ids — so a single commit larger
    * than the cap still forms one batch rather than stalling). Without it
    * the first batch of a long-history table is the WHOLE table-so-far —
    * the difference between a drip-fed backfill and one monster batch at
    * warehouse scale. */
  private val maxFilesPerTrigger: Option[Int] =
    options.get("maxFilesPerTrigger").map(_.toInt)
      .map(n => { require(n > 0, "maxFilesPerTrigger must be positive"); n })

  /** Committed offset of the previous batch — getBatch(start, …) restores
    * it on recovery, so the limiter resumes correctly after a restart. */
  private var lastEnd: Long = startFrom

  override def getOffset: Option[Offset] = {
    val head = SnapshotLog.currentSnapshotId(spark, tableDir)
      .getOrElse(return None)
    val from = math.max(lastEnd, startFrom)
    if (head <= from) {
      // initial-snapshot mode with nothing committed after the seed:
      // the seed alone is batch one — offer the pinned start offset
      // itself (the engine ignores it once a batch at it is committed)
      return if (initialSnapshot.isDefined && head == startFrom && lastEnd == startFrom)
        Some(new GraftSourceOffset(startFrom))
      else None
    }
    val to = maxFilesPerTrigger match {
      case None => head
      case Some(cap) =>
        // walk commits oldest-first from the cursor, stop once the file
        // budget is spent (always taking at least one commit); the ranged
        // read keeps per-trigger manifest I/O O(backlog), not O(history)
        val upcoming = SnapshotLog.commitsInRange(spark, tableDir, from, head)
        var budget = cap
        var end = from
        for (c <- upcoming if end == from || budget > 0) {
          end = c.snapshotId
          // CDF mode also pays for upsert/rowdelta commits (their added
          // files are the batch's change events); plain mode only appends
          if (c.op == "append" ||
              (readChangeFeed && (c.op == "upsert" || c.op == "rowdelta")))
            budget -= c.added.count(_.kind == "data")
        }
        end
    }
    lastEnd = to
    Some(new GraftSourceOffset(to))
  }

  /** Fail LOUDLY when a column of the stream's fixed schema was renamed
    * or dropped at/before snapshot `at` — alignTo would otherwise
    * null-fill it forever (the table still HAS the values, under the new
    * name), silently corrupting every downstream row; the stream must
    * restart to adopt the new schema (the Delta non-additive-change
    * contract). ADDITIVE gaps still null-fill: a name the registry can
    * still resolve (or a registry-less table) is just an older epoch's
    * file lacking a later-declared column. */
  private def guardNonAdditive(df: DataFrame, at: Long): DataFrame = {
    val have = df.columns.toSet
    val missing = schema.fieldNames
      .filterNot(n => n == "_change_op" || n == "_change_snapshot")
      .filterNot(have)
    if (missing.nonEmpty)
      SnapshotLog.registryAt(spark, tableDir,
          if (at <= 0) None else Some(at))
        .filterNot(_.isIdentity).foreach { reg =>
          val gone = missing.filter(n => reg.physicalOf(n).isEmpty)
          if (gone.nonEmpty) throw new IllegalStateException(
            s"stream over $tableDir: column(s) ${gone.mkString(", ")} of " +
              s"the stream's fixed schema were renamed or dropped (registry " +
              s"at snapshot $at) — an in-flight stream cannot adopt a " +
              "non-additive schema change; restart it to pick up the new " +
              "schema")
        }
    df
  }

  /** Null-fill a frame to the stream's FIXED schema: delete events are
    * key-only, batches of files older than an ALTER TABLE ADD COLUMNS
    * lack the declared column (parquet's own null-fill semantics), and
    * internal lineage columns are projected away. */
  private def alignTo(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.map(f =>
      (if (have(f.name)) col(f.name)
       else org.apache.spark.sql.functions.lit(null))
        .cast(f.dataType).as(f.name)).toSeq: _*)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(_.json.toLong).getOrElse(startFrom)
    val to = end.json.toLong
    lastEnd = math.max(lastEnd, to) // restore the limiter cursor on recovery
    // initial-snapshot mode: the FIRST batch (start empty — includes its
    // WAL replay, which re-reads the same pinned id) seeds the oldest
    // retained snapshot's resolved state — masks applied, epochs merged —
    // before any deltas; in CDF mode the seed rows are `insert` events of
    // the seed snapshot (the Delta initial-snapshot CDF shape)
    val seed: Option[DataFrame] =
      initialSnapshot.filter(_ => start.isEmpty).flatMap { snap =>
        SnapshotLog.read(spark, tableDir, asOf = Some(snap)).map { df0 =>
          val df = guardNonAdditive(df0, snap)
          alignTo(
            if (readChangeFeed)
              df.withColumn("_change_op",
                  org.apache.spark.sql.functions.lit("insert"))
                .withColumn("_change_snapshot",
                  org.apache.spark.sql.functions.lit(snap))
            else df)
        }
      }
    val deltas =
      if (to <= from) None
      else if (readChangeFeed)
        // row-level events of (from, to]; the feed's own retention and
        // lineage-derivability refusals propagate (loud, named snapshots)
        SnapshotLog.changes(spark, tableDir, from, Some(to),
          preImages = cdfPreImages).map(f =>
          alignTo(guardNonAdditive(f, to)))
      else {
        val ids = SnapshotLog.snapshots(spark, tableDir)
        val missing = ((from + 1) to to).filterNot(ids.contains)
        require(missing.isEmpty,
          s"stream interval ($from, $to] of $tableDir lost snapshots " +
            s"${missing.mkString(",")} to retention; keep expiry horizon " +
            "beyond consumer lag")
        // ranged manifest reads: O(batch interval) per trigger, never a
        // full-history replay
        val commits = SnapshotLog.commitsInRange(spark, tableDir, from, to)
        val changing = commits
          .filter(c => c.op == "upsert" || c.op == "rowdelta" || c.op == "rollback")
        if (changing.nonEmpty && !skipChangeCommits)
          throw new IllegalStateException(
            s"snapshots ${changing.map(c => s"${c.snapshotId}(${c.op})").mkString(",")} " +
              s"of $tableDir changed existing rows; an append-only stream " +
              "cannot represent that — materialize + restart from a fresh " +
              "startingVersion, or set skipChangeCommits=true to consume " +
              "appends only")
        val files = commits.filter(_.op == "append")
          .flatMap(_.added).filter(_.kind == "data")
        if (files.isEmpty) None
        // batch files read raw (physical names) and project through the
        // CURRENT field registry — physical names never change, so the
        // current mapping is correct for ANY batch interval, and a
        // restarted stream (schema re-derived at start) replays
        // pre-rename batches under the new names instead of null-filling
        // them. A rename landing MID-query instead fails loudly in
        // guardNonAdditive — alignTo would null-fill the old name
        // forever otherwise.
        else Some(alignTo(guardNonAdditive(SnapshotLog.applyRegistry(
          SnapshotLog.readEpochSafe(spark, files),
          SnapshotLog.registryAt(spark, tableDir, None)), at = 0L)))
      }
    val batch = (seed, deltas) match {
      case (Some(s), Some(d)) => Some(s.unionByName(d))
      case (s, d) => s.orElse(d)
    }
    org.apache.spark.sql.graftshim.GraftSqlShim
      .streamingDataFrame(sqlContext, batch, schema)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
