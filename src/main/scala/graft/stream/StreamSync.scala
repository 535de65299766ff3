package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import graft.cdc.Envelope
import graft.schema.Schemas

/** Typed event row for the custom-state operators. */
final case class Ev(event_id: Long, user_id: Long, event_type: String,
                    value: Double, ts: java.sql.Timestamp)

/** Per-user running aggregate held in the state store. */
final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming replacement for the reference's cron-plus-offset-
  * file model (SURVEY.md §2.5): the checkpoint's offset log subsumes
  * OffsetStore, `Trigger.AvailableNow` subsumes the 5-minute Airflow cron,
  * and the sink's commit log upgrades the reference's at-least-once
  * write-then-commit to exactly-once file output.
  */
object StreamSync {

  /** Streaming CDC sync of one table: file-stream of wire-contract
    * JSON-lines → decode → parquet append, checkpointed. Each invocation
    * with AvailableNow drains what's new and stops — the exact semantics
    * the reference approximates with its 5-minute cron + offset file.
    * `topicDir` is a directory of JSON-lines files for ONE topic (Spark's
    * file streaming source tracks files, the moral equivalent of offsets).
    */
  def syncOnce(spark: SparkSession, topicDir: String, table: String,
               warehouseDir: String, checkpointDir: String): Unit = {
    val q = Envelope.decode(wireStream(spark, topicDir), table)
      .writeStream
      .format("parquet")
      .option("path", s"$warehouseDir/${table}_parquet")
      .option("checkpointLocation", s"$checkpointDir/$table")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming sink INTO the snapshot table format — [[syncOnce]]'s
    * production upgrade and the composition that closes the loop between
    * the streaming layer and [[graft.table.SnapshotLog]]: every
    * micro-batch stages immutable files and publishes them as ONE atomic
    * `append` snapshot tagged with its batch id. What that buys over the
    * plain parquet sink:
    *  - readers see whole batches or nothing (snapshot isolation instead
    *    of files trickling into a listing);
    *  - downstream consumers tail the table incrementally through
    *    [[graft.table.DiffConsumer]] — each drain's new snapshots ARE
    *    the change feed;
    *  - replay within the checkpoint lineage is exactly-once: a replayed
    *    batch finds its batch id already committed (a metadata scan of
    *    the manifests) and skips, and a crash between stage and commit
    *    leaves only invisible orphans for the expiry sweep. (After a
    *    checkpoint LOSS batch ids restart with different contents — the
    *    id guard must not be trusted across lineages, same as any
    *    foreachBatch idempotence keyed on batchId.)
    * Compaction and retention then run through the same protocol
    * ([[graft.cdc.Compaction.compactSnapshotted]] /
    * [[graft.table.SnapshotLog.expireSnapshots]]), invisible to the
    * stream and its consumers. */
  def snapshotSink(stream: DataFrame, tableDir: String, checkpointDir: String,
                   statsCol: Option[String] = None): Unit = {
    import graft.table.SnapshotLog
    val q = stream.writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = b.sparkSession
        val already = batchAlreadyCommitted(spark, tableDir, batchId, checkpointDir)
        if (!already) {
          val files = SnapshotLog.writeData(b, tableDir, statsCol)
          SnapshotLog.commit(spark, tableDir, "append", files,
            summary = Map("batch_id" -> batchId.toString,
              "stream_id" -> checkpointDir))
        }
        () // foreachBatch needs Unit, not the commit id
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming UPSERT sink — [[snapshotSink]]'s keyed upgrade, writing
    * each micro-batch through [[graft.table.Merge.mergeOnRead]] instead
    * of a bare append: the batch is resolved to latest-per-key (ordered
    * by `orderCol`; `deleteCol`-true rows are tombstones), then committed
    * as one `rowdelta` snapshot — new data files plus one equality-delete
    * key file, ZERO rewrites of the standing table. This is the streaming
    * CDC apply path at 100 TB: per batch the write cost is O(batch)
    * however large the table, the read side pays one broadcast mask join
    * until [[graft.table.Merge.materializeDeletes]] folds the masks in
    * (maintenance, invisible to readers and the change feed), and
    * downstream consumers tail ROW-LEVEL changes through
    * [[graft.table.DiffConsumer.consumeChanges]] — the face a COW sink
    * cannot offer.
    *
    * Exactly-once within a checkpoint lineage via the same manifest
    * batch-id guard as [[snapshotSink]]; the first batch bootstraps the
    * table as a key-clustered `append`. */
  def upsertSink(stream: DataFrame, tableDir: String, checkpointDir: String,
                 keyCol: String, orderCol: String,
                 deleteCol: Option[String] = None,
                 materializeAtMasks: Option[Int] = None,
                 consolidateAtMaskFiles: Option[Int] = None): Unit = {
    import org.apache.spark.sql.expressions.Window
    import graft.table.{Merge, SnapshotLog}
    val q = stream.writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = b.sparkSession
        val already = batchAlreadyCommitted(spark, tableDir, batchId, checkpointDir)
        if (!already) {
          val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).desc)
          val latest = b.withColumn("_rk", row_number().over(w))
            .filter(col("_rk") === 1).drop("_rk")
            .localCheckpoint(true) // consumed twice below (emptiness + write)
          if (SnapshotLog.currentSnapshotId(spark, tableDir).isEmpty) {
            val rows = deleteCol.fold(latest)(dc => latest.filter(!col(dc)).drop(dc))
            // an empty or all-tombstone batch against a not-yet-created
            // table is a no-op (deletes of nothing): skip the commit
            // entirely rather than writing a zero-file snapshot that
            // would wedge every later mergeOnRead. Replay is safe —
            // nothing was written, so re-processing writes nothing again.
            if (!rows.isEmpty)
              // partition count follows the batch's own parallelism — a
              // backfill-sized first drain must not serialize into the
              // fixture-scale constant 2 write tasks
              SnapshotLog.commit(spark, tableDir, "append",
                SnapshotLog.writeData(rows.repartitionByRange(
                    math.max(2, rows.rdd.getNumPartitions), col(keyCol)),
                  tableDir, statsCol = Some(keyCol),
                  // string/UUID keys record no long zone — the manifest
                  // bloom is their only merge-prune index, so the
                  // bootstrap must write it or the table starts life
                  // unprunable
                  bloomCol = Some(keyCol).filter(_ => rows.schema(keyCol)
                    .dataType == org.apache.spark.sql.types.StringType)),
                summary = Map("batch_id" -> batchId.toString,
                  "stream_id" -> checkpointDir))
          } else if (latest.isEmpty) {
            () // empty micro-batch: nothing to merge, nothing to commit
          } else {
            Merge.mergeOnRead(spark, tableDir, latest, keyCol, deleteCol,
              summary = Map("batch_id" -> batchId.toString,
                "stream_id" -> checkpointDir))
            // inline maintenance: once pending mask ENTRIES cross the
            // threshold, fold them back into clustered data — bounding
            // read amplification without an external job. The `replace`
            // commit is invisible to the change feed and carries no
            // batch id, so replay guards are unaffected.
            materializeAtMasks.foreach { threshold =>
              val pending = SnapshotLog.filesAt(spark, tableDir)
                .filter(SnapshotLog.isMask).map(_.rows).sum
              if (pending >= threshold) Merge.materializeDeletes(spark, tableDir)
            }
            // cheaper inline maintenance (r10): once mask FILE count
            // crosses the threshold, fold the masks to one (per-key max
            // seq, metadata-only — data files untouched), so a
            // high-frequency stream never accrues a per-mask-file open
            // on its readers between full materializations
            consolidateAtMaskFiles.foreach { threshold =>
              if (SnapshotLog.filesAt(spark, tableDir)
                    .count(_.kind == "eqdelete") >= threshold)
                Merge.consolidateMasks(spark, tableDir)
            }
          }
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Wire-contract file stream over a topic dir of JSON-lines files —
    * the reader [[syncOnce]] and [[maintainStatusView]] share. */
  def wireStream(spark: SparkSession, topicDir: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema(Schemas.wireJson)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    maxFilesPerTrigger.fold(reader)(k => reader.option("maxFilesPerTrigger", k.toString))
      .json(topicDir)
      .select(
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"), col("timestamp"))
  }

  /** Streaming CDC view maintenance (foreachBatch IVM) — the streaming
    * twin of `cdc_incremental_agg`. A native streaming aggregation counts
    * EVENTS, so an upsert stream double-counts every updated key; correct
    * per-status (n_orders, total_amount) maintenance needs retraction:
    * each micro-batch applies +new-version / −stored-version increments to
    * the view, alongside a keyed current-state table.
    *
    * Durability/replay: every batch writes a SELF-CONTAINED snapshot dir
    * `viewDir/batch=<id>/{state,view}` finished by a `_COMMIT` marker, and
    * readers take the newest committed dir. A replayed batch recomputes
    * against the newest snapshot STRICTLY OLDER than itself — never its
    * own surviving dir (a crash after `_COMMIT` but before the stream
    * checkpoint commits would otherwise make the batch read and overwrite
    * the same path) — so replay is a deterministic rebuild of the same
    * dir from the same pre-batch snapshot and the same inputs. The view
    * stays exactly right — no torn intermediate is ever visible. The same guard makes
    * out-of-order batch arrival safe (an older version never displaces a
    * newer one). Dirs older than the previous snapshot are pruned.
    *
    * Scale: per batch, the work is one window over the micro-batch, one
    * keyed join against the state table, and two ~|groups| aggregates —
    * the full fact history is never re-aggregated. The parquet state pair
    * is the fixture-scale stand-in for a table format / key-value store;
    * the dataflow is what carries to 100 TB. */
  /** Committed `batch=<id>` dirs under `root`, ascending — the ONE
    * definition of the _COMMIT listing every batch-dir store uses (six
    * hand-rolled copies had already let one store drop the marker). */
  private def committedBatchIds(fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("batch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMIT")))
      .map(_.getName.stripPrefix("batch=").toLong).sorted

  /** Was `batchId` already committed to this table BY THIS STREAM?
    * Batch ids are monotone only within one checkpoint lineage, so the
    * guard is scoped by `streamId` (the checkpoint location — the same
    * stable identity GraftStreamSink's txnAppId uses): two streams with
    * separate checkpoints appending to one table interleave their ids,
    * and an unscoped early-stop at the first `b < batchId` would miss
    * this stream's own older commit and re-commit duplicate rows. The
    * REVERSE manifest scan stops at the first SAME-LINEAGE data commit
    * whose batch id falls below the probe — O(1) typical, never
    * O(table history); foreign-lineage commits are walked past without
    * stopping. Legacy commits written before the stream_id field are
    * attributed to every lineage (conservative: a pre-upgrade
    * single-stream table keeps its early stop and its dedup). */
  private def batchAlreadyCommitted(spark: org.apache.spark.sql.SparkSession,
                                    tableDir: String, batchId: Long,
                                    streamId: String): Boolean = {
    import graft.table.SnapshotLog
    val it = SnapshotLog.commitsReverse(spark, tableDir)
    while (it.hasNext) {
      val s = it.next().summary
      val sameLineage = s.get("stream_id").forall(_ == streamId)
      s.get("batch_id").map(_.toLong) match {
        case Some(b) if sameLineage && b == batchId => return true
        case Some(b) if sameLineage && b < batchId => return false
        case _ => () // maintenance or foreign-stream commit: keep walking
      }
    }
    false
  }

  def maintainStatusView(wire: DataFrame, table: String, viewDir: String,
                         checkpointDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val decoded = Envelope.decode(wire, table)
    val q = decoded.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(viewDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def committed: Seq[Long] =
          committedBatchIds(fs, new org.apache.hadoop.fs.Path(viewDir))
        // Replay safety: a crash after this batch's _COMMIT but before the
        // stream checkpoint commit leaves batch=<batchId> committed; basing
        // on it would self-read-and-overwrite. Always base on the newest
        // snapshot strictly older than this batch.
        val prevId = committed.filter(_ < batchId).lastOption
        // fail LOUDLY on unreplayable state, like maintainDedupIndex: a
        // rewind past the retention horizon has no predecessor snapshot —
        // silently rebuilding from empty would drop every previously
        // aggregated group from the "committed" view
        if (batchId > 0 && prevId.isEmpty)
          throw new IllegalStateException(
            s"status view at $viewDir has no committed snapshot older than " +
              s"batch $batchId (committed: ${committed.mkString(",")}); " +
              "state was evicted past the replay horizon — rebuild the view")
        val amt = col("total_amount").cast("decimal(10,2)")
        val w = Window.partitionBy(col("order_id")).orderBy(col("kafka_offset").desc)
        val b = batch.filter(col("order_id").isNotNull)
          .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select(col("order_id"), col("status"), amt.as("amt"), col("kafka_offset"))
        val (prevState, prevView) = prevId match {
          case Some(id) =>
            (spark.read.parquet(s"$viewDir/batch=$id/state"),
             spark.read.parquet(s"$viewDir/batch=$id/view"))
          case None =>
            (spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
               b.schema),
             spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
               new org.apache.spark.sql.types.StructType()
                 .add("status", "string").add("n_orders", "long")
                 .add("total_amount", org.apache.spark.sql.types.DecimalType(20, 2))))
        }
        // offset guard: only strictly-newer versions apply (replay no-op +
        // out-of-order safety)
        val applied = b.as("b")
          .join(prevState.select(col("order_id"), col("kafka_offset").as("old_off")),
            Seq("order_id"), "left")
          .filter(col("old_off").isNull || col("kafka_offset") > col("old_off"))
          .select(col("order_id"), col("status"), col("amt"), col("kafka_offset"))
        val retracted = prevState.join(
          broadcast(applied.select(col("order_id"))), Seq("order_id"), "left_semi")
        val newState = prevState
          .join(applied.select(col("order_id")), Seq("order_id"), "left_anti")
          .unionByName(applied)
        val increments = applied.select(col("status"), col("amt").as("s_amt"), lit(1L).as("s_n"))
          .unionByName(retracted.select(col("status"), (-col("amt")).as("s_amt"), lit(-1L).as("s_n")))
        val inc = increments.groupBy(col("status"))
          .agg(sum(col("s_n")).as("dn"), sum(col("s_amt")).as("damt"))
        // NULL-SAFE join key: groupBy puts all null statuses in ONE
        // group, but a plain join never matches null==null — the stored
        // null-group row would survive unretracted forever while its
        // retraction increment fell out of the view (phantom rows)
        val newView = prevView.as("pv").join(inc.as("i"),
            col("pv.status") <=> col("i.status"), "full_outer")
          .select(coalesce(col("pv.status"), col("i.status")).as("status"),
            (coalesce(col("n_orders"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
            (coalesce(col("total_amount"), lit(0).cast("decimal(20,2)")) +
              coalesce(col("damt"), lit(0).cast("decimal(20,2)")))
              .cast("decimal(20,2)").as("total_amount"))
          .filter(col("n_orders") > 0)
        val dst = s"$viewDir/batch=$batchId"
        newState.write.mode("overwrite").parquet(s"$dst/state")
        newView.write.mode("overwrite").parquet(s"$dst/view")
        fs.create(new org.apache.hadoop.fs.Path(dst, "_COMMIT"), true).close()
        // prune everything older than the previous snapshot
        committed.dropRight(2).foreach(id =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$viewDir/batch=$id"), true))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Newest committed view maintained by [[maintainStatusView]]. */
  def readStatusView(spark: SparkSession, viewDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(viewDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = committedBatchIds(fs, root)
    require(ids.nonEmpty, s"no committed view under $viewDir")
    spark.read.parquet(s"$viewDir/batch=${ids.max}/view")
  }

  /** Streaming quantile maintenance: each micro-batch persists ONE
    * ~KB [[graft.functions.QuantileSketchAgg]] row (batch id, row count,
    * serialized sketch) — the streaming face of the epoch pattern in
    * `fn_quantile_sketch_epochs`. Any later reader answers "p95 of
    * everything drained so far" by merging the per-batch sketches
    * ([[readQuantileView]]) WITHOUT re-reading a single event: at 100 TB
    * the events are gone from cache minutes after ingest, the sketches
    * stay.
    *
    * Replay safety mirrors [[maintainStatusView]]'s dirs: a batch
    * (re)writes only its own `batch=<id>` dir — no cross-batch read, so
    * replay after any crash is a deterministic self-overwrite, and the
    * merged answer (a bound-checked estimate, not an exact value) is
    * unaffected by which compaction order a replayed build took.
    */
  def maintainQuantileSketches(events: DataFrame, sketchDir: String,
                               checkpointDir: String): Unit = {
    import graft.functions.GraftFunctions.quantile_sketch
    val q = events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(sketchDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dst = s"$sketchDir/batch=$batchId"
        batch.agg(quantile_sketch(col("value")).as("sk"),
            count(lit(1)).as("n_rows"))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dst/sketch")
        fs.create(new org.apache.hadoop.fs.Path(dst, "_COMMIT"), true).close()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Quantiles over every event drained so far, from the per-batch
    * sketches alone: reads the committed ~KB rows, `quantile_merge`s
    * them, probes the requested ranks. Events are never re-read. */
  def readQuantileView(spark: SparkSession, sketchDir: String,
                       qs: Seq[Double]): DataFrame = {
    import graft.functions.GraftFunctions.{quantile_merge, quantile_value}
    val root = new org.apache.hadoop.fs.Path(sketchDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = committedBatchIds(fs, root)
    require(ids.nonEmpty, s"no committed sketches under $sketchDir")
    val merged = spark.read
      .parquet(ids.map(id => s"$sketchDir/batch=$id/sketch"): _*)
      .agg(quantile_merge(col("sk")).as("msk"), sum(col("n_rows")).as("n_rows"))
    merged.select(col("n_rows") +: qs.map(q =>
      quantile_value(col("msk"), q).as(s"q${(q * 100).round}")): _*)
  }

  /** Streaming heavy hitters: each micro-batch persists ONE Misra–Gries
    * sketch row (≤k (token, weight) counters + the batch's token count)
    * over the batch's document tokens — trending-vocabulary maintenance
    * without any global token state. Same store layout and replay story
    * as [[maintainQuantileSketches]].
    */
  def maintainHeavyHitters(docs: DataFrame, sketchDir: String,
                           checkpointDir: String, k: Int = 32): Unit = {
    import graft.functions.GraftFunctions.heavy_hitters
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(sketchDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dst = s"$sketchDir/batch=$batchId"
        batch.select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .agg(heavy_hitters(col("token"), k).as("hh"),
            count(lit(1)).as("n_tokens"))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dst/sketch")
        fs.create(new org.apache.hadoop.fs.Path(dst, "_COMMIT"), true).close()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream-wide heavy-hitter candidates from the per-batch sketches
    * alone: the Agarwal-et-al mergeable-summaries merge (sum counters
    * pairwise, subtract the (k+1)-th largest, drop non-positives)
    * expressed as plain relational ops over the ≤k·B persisted counters.
    * The merged candidates keep the sketch guarantee over the TOTAL
    * drained token count N: every token with true frequency > N/(k+1)
    * survives, and each weight lower-bounds its true frequency within
    * N/(k+1). Tokens themselves are never re-read.
    */
  def readHeavyHitterView(spark: SparkSession, sketchDir: String,
                          k: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val root = new org.apache.hadoop.fs.Path(sketchDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = committedBatchIds(fs, root)
    require(ids.nonEmpty, s"no committed sketches under $sketchDir")
    val rows = spark.read
      .parquet(ids.map(id => s"$sketchDir/batch=$id/sketch"): _*)
    val summed = rows.select(explode(col("hh")).as("c"))
      .select(col("c.item").as("token"), col("c.est").as("w"))
      .groupBy(col("token")).agg(sum(col("w")).as("w"))
    // (k+1)-th largest summed weight (0 when ≤k survive the sum)
    val cut = summed
      .withColumn("rk", row_number().over(
        Window.orderBy(col("w").desc, col("token"))))
      .filter(col("rk") === k + 1)
      .select(col("w").as("cut"))
    val nTotal = rows.agg(sum(col("n_tokens")).as("n_tokens"))
    // no (k+1)-th row ⇒ cut = 0 (weights are positive, so max picks the
    // real cut when one exists)
    val cutOrZero = cut.unionByName(
        summed.sparkSession.range(1).select(lit(0L).as("cut")))
      .agg(max(col("cut")).as("cut"))
    summed.crossJoin(broadcast(cutOrZero))
      .select(col("token"), (col("w") - col("cut")).as("est"))
      .filter(col("est") > 0)
      .crossJoin(broadcast(nTotal))
      .orderBy(col("est").desc, col("token"))
  }

  /** Streaming near-dup ADMISSION INDEX — the continuous-ingestion form of
    * [[graft.llm.Dedup.incremental]]: each micro-batch of documents is
    * admitted or rejected against the index of previously ADMITTED docs
    * (LSH band keys + shingle sets), and the admitted docs then join the
    * index. Duplicates never become match targets across batches — the
    * index is the kept corpus, which also bounds state by the unique
    * fraction, not the ingest volume. Within one micro-batch, earlier
    * docs (by doc_id) are match targets regardless of their own verdict —
    * the one-relational-pass approximation of strictly-sequential
    * admission; across batches the sequential semantics are exact.
    *
    * Layout: the INDEX (keys + shingles of admitted docs) is a
    * snapshot-per-batch under `indexDir/state/batch=<id>/` finished by a
    * `_COMMIT` marker — the [[maintainStatusView]] pattern, rebuilt from
    * the newest snapshot STRICTLY older than a replayed batch, so replay
    * is deterministic and out-of-order arrival never corrupts it. The
    * full-rewrite-per-batch of that snapshot is the fixture-scale parquet
    * stand-in for the table-format / KV store a production pipeline
    * keeps (which would MERGE the admitted delta instead). DECISIONS are
    * different: each batch appends only its own delta under
    * `indexDir/decisions/batch=<id>/` (committed, kept, replay
    * overwrites its own dir), so the decision log costs O(|batch|) per
    * batch — accumulating it into each snapshot would write O(N²) rows
    * over N batches. The probe work itself is O(|batch| · bands) key
    * lookups plus exact verification on colliding pairs. */
  def maintainDedupIndex(docs: DataFrame, indexDir: String,
                         checkpointDir: String, threshold: Double = 0.8): Unit = {
    import org.apache.spark.sql.expressions.Window
    import graft.llm.Dedup
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(indexDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def committed: Seq[Long] =
          committedBatchIds(fs, new org.apache.hadoop.fs.Path(s"$indexDir/state"))
        val prevId = committed.filter(_ < batchId).lastOption
        // fail LOUDLY on unreplayable state: retention keeps only the last
        // two snapshots, so a rewind of more than one batch (or manual
        // state cleanup) has no predecessor to rebuild from — silently
        // starting from an empty index would re-admit everything and break
        // the determinism contract above
        if (batchId > 0 && prevId.isEmpty)
          throw new IllegalStateException(
            s"dedup index at $indexDir has no committed snapshot older than " +
              s"batch $batchId (committed: ${committed.mkString(",")}); " +
              "state was evicted past the replay horizon — rebuild the index")
        val b = batch.select(col("doc_id"), col("text"))
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
        val shNew = Dedup.shinglesOf(b).localCheckpoint(true)
        val keysNew = Dedup.lshKeysOf(b).localCheckpoint(true)
        def empty(schema: org.apache.spark.sql.types.StructType) =
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        val (prevKeys, prevSh) = prevId match {
          case Some(id) =>
            (spark.read.parquet(s"$indexDir/state/batch=$id/keys"),
             spark.read.parquet(s"$indexDir/state/batch=$id/sh"))
          case None => (empty(keysNew.schema), empty(shNew.schema))
        }
        // same MaxBucket crowded-bucket cap as the batch path
        // ([[graft.llm.Dedup.incremental]]): a degenerate boilerplate
        // bucket would otherwise fan out |bucket|² candidate pairs per
        // micro-batch
        val targets = prevKeys.withColumn("is_new", lit(false))
          .unionByName(keysNew.withColumn("is_new", lit(true)))
          .withColumn("bucket_n",
            count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
          .filter(col("bucket_n") <= Dedup.MaxBucket)
          .drop("bucket_n")
        val cands = targets.filter(col("is_new")).as("n")
          .join(targets.as("o"),
            col("n.band") === col("o.band") && col("n.bucket") === col("o.bucket") &&
              (!col("o.is_new") || col("o.doc_id") < col("n.doc_id")))
          .select(col("n.doc_id").as("doc_id"), col("o.doc_id").as("o_id"),
            col("o.is_new").as("o_new"))
          .distinct()
        val shAll = prevSh.unionByName(shNew)
        val verified = cands
          .join(shNew.select(col("doc_id"), col("sh").as("sh_n")), "doc_id")
          .join(shAll.select(col("doc_id").as("o_id"), col("sh").as("sh_o")), "o_id")
          .select(col("doc_id"), col("o_id"), col("o_new"),
            (size(array_intersect(col("sh_n"), col("sh_o"))).cast("double") /
              size(array_union(col("sh_n"), col("sh_o")))).as("jaccard"))
          .filter(col("jaccard") >= threshold)
        val pick = verified
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("o_new"), col("o_id"))))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("o_id"), col("jaccard"))
        val decisions = b.select(col("doc_id"))
          .join(pick, Seq("doc_id"), "left")
          .select(col("doc_id"), col("o_id").isNotNull.as("is_dup"),
            col("o_id").as("dup_of"), round(col("jaccard"), 6).as("jaccard"))
        val admitted = decisions.filter(!col("is_dup")).select(col("doc_id"))
        val newKeys = prevKeys.unionByName(
          keysNew.join(admitted, Seq("doc_id"), "left_semi"))
        val newSh = prevSh.unionByName(
          shNew.join(admitted, Seq("doc_id"), "left_semi"))
        // decision DELTA only — the cumulative log lives as the union of
        // these per-batch dirs, never rewritten
        val decDst = s"$indexDir/decisions/batch=$batchId"
        decisions.write.mode("overwrite").parquet(decDst)
        fs.create(new org.apache.hadoop.fs.Path(decDst, "_COMMIT"), true).close()
        val dst = s"$indexDir/state/batch=$batchId"
        newKeys.write.mode("overwrite").parquet(s"$dst/keys")
        newSh.write.mode("overwrite").parquet(s"$dst/sh")
        fs.create(new org.apache.hadoop.fs.Path(dst, "_COMMIT"), true).close()
        committed.dropRight(2).foreach(id =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/state/batch=$id"), true))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming IVF VECTOR INDEX — continuous embedding ingestion into an
    * ANN-queryable store: each micro-batch assigns its vectors to their
    * nearest coarse centroid entirely map-side (the centroid set is a
    * MODEL trained offline and inlined as literals — the
    * [[graft.llm.Similarity.assignClusters]] posture) and appends
    * cell-partitioned postings (`centroid_id=<c>/...`) to the index
    * directory. Nothing shuffles: assignment is a projection and the
    * partitioned parquet sink routes rows by cell. Queries then read
    * ONLY the probed cells via partition pruning
    * ([[queryVectorIndex]]) — at 100 TB the scan cost is
    * nprobe/nClusters of the corpus, which is the entire point of IVF.
    * The parquet file-stream + checkpoint gives exactly-once appends, so
    * a replayed batch never double-inserts a vector. */
  def maintainVectorIndex(vectors: DataFrame,
                          centroids: Array[(Int, Array[Float])],
                          indexDir: String, checkpointDir: String): Unit = {
    val scored = centroids.map { case (cid, vec) =>
      struct(
        graft.functions.GraftFunctions.vec_cosine(col("embedding"), typedLit(vec)).as("sim"),
        lit(-cid).as("ord"),
        lit(cid).as("centroid_id"))
    }
    val q = vectors
      .select(col("vec_id"), col("label"), col("embedding"),
        greatest(scored.toIndexedSeq: _*).getField("centroid_id").as("centroid_id"))
      .writeStream.format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("centroid_id")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** ANN top-k over the streamed index: score the query against the
    * centroid model driver-side, then scan ONLY the `nprobe` best cells —
    * the `centroid_id` partition filter prunes every other cell's files
    * at planning time. Exact cosine + TakeOrdered inside the probed
    * slice. */
  def queryVectorIndex(spark: SparkSession, indexDir: String,
                       centroids: Array[(Int, Array[Float])],
                       query: Array[Float], k: Int = 10,
                       nprobe: Int = 4): DataFrame = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probes = centroids.map { case (cid, vec) => (cos(query, vec), cid) }
      .sortBy { case (sim, cid) => (-sim, cid) }
      .take(nprobe).map(_._2)
    spark.read.parquet(indexDir)
      .filter(col("centroid_id").isin(probes.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("label"),
        graft.functions.GraftFunctions.vec_cosine(col("embedding"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Streaming DRIFT MONITOR: each micro-batch of documents is scored
    * against a REFERENCE unigram distribution (the offline corpus
    * snapshot — a model-scale (token, p_ref) table) with Jensen–Shannon
    * divergence, and one (batch_id, n_tokens, js_divergence) row lands
    * in the monitor store. JS rather than KL because a live batch's
    * vocabulary is not contained in the reference's (new tokens are the
    * drift being detected): JS mixes the distributions, is defined on
    * disjoint support, and is bounded by ln 2 — a stable alerting
    * signal. Per batch: one token count aggregate + a full-outer join
    * against the broadcast reference — the batch crosses one exchange,
    * the monitor row is O(1). The same `batch=<id>` one-row layout as
    * the sketch stores, so replays overwrite only their own row. */
  def maintainDriftMonitor(docs: DataFrame, reference: DataFrame,
                           monitorDir: String, checkpointDir: String): Unit = {
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs2 = new org.apache.hadoop.fs.Path(monitorDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cnt = batch.select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
        val total = cnt.agg(sum(col("n")).as("n_total"))
        val joined = cnt.crossJoin(broadcast(total))
          .select(col("token"), (col("n").cast("double") / col("n_total")).as("p"),
            col("n_total"))
          .join(broadcast(reference.select(col("token"), col("p_ref"))),
            Seq("token"), "full_outer")
          .select(coalesce(col("p"), lit(0.0)).as("p"),
            coalesce(col("p_ref"), lit(0.0)).as("q"),
            col("n_total"))
        val m = (col("p") + col("q")) / 2.0
        val term =
          when(col("p") > 0, col("p") * log(col("p") / m) / 2.0).otherwise(0.0) +
          when(col("q") > 0, col("q") * log(col("q") / m) / 2.0).otherwise(0.0)
        // a batch whose tokens all filter out has NO distribution: report
        // n_tokens = 0 with a NULL divergence instead of the misleading
        // ln(2)/2 the reference-only full-outer rows would otherwise sum to
        val row = joined.agg(max(col("n_total")).as("n_raw"),
            sum(term).as("js_raw"))
          .select(lit(batchId).as("batch_id"),
            coalesce(col("n_raw"), lit(0L)).as("n_tokens"),
            when(coalesce(col("n_raw"), lit(0L)) > 0, col("js_raw"))
              .as("js_divergence"))
        val dst = s"$monitorDir/batch=$batchId"
        row.coalesce(1).write.mode("overwrite").parquet(dst)
        // the _COMMIT marker the store's own docstring promises: without
        // it a torn batch dir was indistinguishable from a committed one
        fs2.create(new org.apache.hadoop.fs.Path(dst, "_COMMIT"), true).close()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** All per-batch drift rows written by [[maintainDriftMonitor]]. */
  def readDriftView(spark: SparkSession, monitorDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(monitorDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = committedBatchIds(fs, root)
    require(ids.nonEmpty, s"no committed drift rows under $monitorDir")
    spark.read.parquet(ids.map(id => s"$monitorDir/batch=$id"): _*)
      .select(col("batch_id"), col("n_tokens"), col("js_divergence"))
      .orderBy(col("batch_id"))
  }

  /** Cumulative admission decisions maintained by [[maintainDedupIndex]]:
    * the union of every committed per-batch decision delta. */
  def readDedupDecisions(spark: SparkSession, indexDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$indexDir/decisions")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = committedBatchIds(fs, root)
      .map(id => s"$indexDir/decisions/batch=$id")
    require(dirs.nonEmpty, s"no committed dedup decisions under $indexDir")
    spark.read.parquet(dirs: _*)
  }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the streaming form of [[graft.ops.Events.tumbling]]. Late data beyond
    * the watermark is dropped; state is bounded by watermark horizon. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Streaming dedup by key within the watermark horizon — the
    * exactly-once guard the reference's append-only sink lacks. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      // dropDuplicates WITHOUT the event-time column in the key list
      // never evicts: every event_id ever seen stays in the state store
      // for the stream's life. dropDuplicatesWithinWatermark is the
      // bounded-state form the docstring promises — state for an id is
      // dropped once the watermark passes it.
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming corpus curation — incremental ingestion of a document
    * stream through the batch pipeline's gates: a stateless quality
    * filter (same thresholds as [[graft.llm.TextOps.qualityFilter]])
    * followed by stateful exact dedup on the content hash, so a document
    * replayed in any later micro-batch is dropped. State is one 32-byte
    * hash per distinct kept document; at true corpus scale this moves to
    * the RocksDB state store or a watermarked horizon — the dataflow is
    * unchanged. Batch-equivalence (same kept-hash set as the one-shot
    * pipeline over identical input) is pinned in StreamSpec. */
  def curatedDocs(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs
      .withColumn("n_words", size(words))
      .withColumn("unique_ratio",
        size(array_distinct(words)).cast("double") / size(words))
      .filter(col("n_words") >= 20 && col("n_words") <= 5000 &&
        col("unique_ratio") >= 0.35)
      .withColumn("content_sha", sha2(col("text"), 256))
      .dropDuplicates("content_sha")
      .select(col("doc_id"), col("lang"), col("n_words"), col("content_sha"))
  }

  /** Gap-based sessionization with the native `session_window` grouping —
    * the streaming form of [[graft.ops.Events.sessionize]]'s lag+cumsum.
    * Session state merges windows within the 30-min gap and is evicted
    * once the watermark passes, so memory is bounded by open sessions. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("n_events"))

  /** Stream-static enrichment: every micro-batch of the event stream
    * joins a STATIC dimension (a feature / profile table) — the standard
    * serving-time enrichment shape. The static side is re-planned per
    * micro-batch (so a refreshed dim parquet is picked up on the next
    * trigger) and explicitly broadcast: the streaming fact never
    * shuffles, no join state accumulates (unlike stream-stream joins),
    * and watermarks aren't needed. At 100 TB-of-stream the per-batch
    * cost stays map-side as long as the dim fits a broadcast; a bigger
    * dim degrades to a shuffled join of just that micro-batch. */
  def enrichedEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** Custom per-key state via mapGroupsWithState: running per-user totals
    * that survive across micro-batches and restarts (state store is
    * checkpointed). This is the escape hatch for stateful logic the
    * built-in window/dedup operators can't express; state is partitioned
    * by key, so it scales with the cluster like any keyed shuffle. */
  import org.apache.spark.sql.{Encoder, Encoders}
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val totalsEnc: Encoder[UserTotals] = Encoders.product[UserTotals]

  def userRunningTotals(events: Dataset[Ev]): Dataset[UserTotals] =
    events.groupByKey(_.user_id).mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotals]) =>
        val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
        val next = evs.foldLeft(prev) { (acc, e) =>
          UserTotals(uid, acc.n_events + 1, acc.total_value + e.value)
        }
        state.update(next)
        next
    }

  /** Stream-stream interval join: click events joined to same-user
    * purchase events that land within `horizonMinutes` AFTER the click.
    * Both sides carry watermarks and the join condition bounds event time
    * in both directions, so Spark can size the join state and evict rows
    * once the watermark passes — unbounded-state stream joins never ship.
    * State is partitioned by user_id like any keyed shuffle. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        horizonMinutes: Int = 60): DataFrame = {
    val c = clicks
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
              col("value").as("purchase_value"), col("ts").as("purchase_ts"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
              col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Stream-stream LEFT OUTER interval join — [[clickPurchaseJoin]]'s
    * other mode, and the one with genuinely different state semantics: a
    * click with no in-window purchase must STILL emit (null-matched), but
    * only once the watermark proves no matching purchase can arrive —
    * i.e. null rows materialize on state eviction, watermark-driven, not
    * at first sight. Same bounded join state as the inner form; the
    * outer-ness costs nothing extra at scale because eviction already
    * happens. Clicks near the head of the stream (watermark never passes
    * them in a finite drain) stay unmatched-unemitted — exactly the
    * semantics a resumed production stream wants. */
  def clickPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame,
                            horizonMinutes: Int = 60): DataFrame = {
    val c = clicks
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
              col("value").as("purchase_value"), col("ts").as("purchase_ts"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
              col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** A closed (inactivity-terminated) per-user session. */
  final case class ClosedSession(user_id: Long, n_events: Long,
                                 last_ts: java.sql.Timestamp)
  private implicit val closedEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]

  /** Event-time-timeout sessionization via flatMapGroupsWithState: a
    * user's session stays open while events keep arriving; once the
    * WATERMARK (not wall clock — deterministic under replay) passes
    * last-event-time + gap, the timeout fires and the closed session is
    * emitted and its state dropped. This is the custom-state form of
    * [[sessionCounts]] for when the session payload outgrows what
    * session_window aggregates can hold. */
  def inactivitySessions(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[ClosedSession] =
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotals]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.n_events,
              new java.sql.Timestamp(s.total_value.toLong)))
          } else {
            val batch = evs.toSeq
            val lastTs = batch.map(_.ts.getTime).max
            val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
            // reuse UserTotals as state: total_value slot carries last-event
            // millis (the state payload, not a metric)
            val next = UserTotals(uid, prev.n_events + batch.size,
              math.max(prev.total_value, lastTs.toDouble))
            state.update(next)
            // a sufficiently LATE event (flatMapGroupsWithState does not
            // drop late rows for us) would compute a timeout below the
            // current watermark — setTimeoutTimestamp throws and kills
            // the whole query. Clamp to just past the watermark: the
            // session then closes at the next watermark advance, the
            // nearest legal approximation of "already timed out".
            val timeout = next.total_value.toLong + gapMinutes * 60000L
            state.setTimeoutTimestamp(
              math.max(timeout, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
}
