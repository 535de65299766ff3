package graft.connector

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{expressions => cexpr}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType

import graft.table.SnapshotLog

/** The WRITE half of the DataSourceV2 face ([[GraftCatalog]]).
  *
  * Both shapes ride the engine's V1-fallback write contract (the
  * published JDBC-connector pattern): the [[WriteBuilder]] returns a
  * [[V1Write]] whose `InsertableRelation` lowers onto the SAME
  * snapshot-log commit entry points every other face uses
  * ([[GraftDataSource.insertInto]] / [[SnapshotLog.writeData]] +
  * [[SnapshotLog.commitAt]]), so V1 writers, SQL DML, streaming sinks
  * and V2 writers interleave safely by construction — one optimistic
  * log arbitrates them all.
  *
  *  - [[GraftV2WriteBuilder]] — writes into an EXISTING table:
  *    `INSERT INTO cat.t`, `df.writeTo("cat.t").append()`, and
  *    `INSERT OVERWRITE` (the builder's `truncate()` flips the commit
  *    from an append to the atomic whole-live-set replacement).
  *  - [[GraftStagedTable]] — atomic CTAS / RTAS through
  *    [[StagingTableCatalog]]: the CTAS query's files are written
  *    (invisible — the log-structured format makes "staged" the
  *    natural state of any uncommitted file) and the MANIFEST commit
  *    happens only in `commitStagedChanges()`, so a failed or killed
  *    CTAS leaves no half-table behind and REPLACE swaps old for new
  *    in one snapshot readers either see entirely or not at all.
  *
  * 100 TB posture: identical to every other write face — data moves
  * once through a distributed parquet write, the commit is one tiny
  * manifest CAS, and a replace carries zero data bytes for untouched
  * history (time travel to the pre-replace snapshot still works).
  */
private[connector] final class GraftV2WriteBuilder(dir: String,
    visible: StructType) extends WriteBuilder
    with SupportsTruncate with SupportsOverwrite {

  private var overwrite = false
  private var overwriteFilters: Array[Filter] = Array.empty

  /** INSERT OVERWRITE / `writeTo(...).createOrReplace()`-style truncate:
    * the V1 exec always passes `overwrite = false` to the relation, so
    * the decision must be captured HERE, at the builder. */
  override def truncate(): WriteBuilder = {
    overwrite = true; overwriteFilters = Array.empty; this
  }

  /** `writeTo("cat.t").overwrite(condition)` — the V2-native
    * replaceWhere: the filters become the predicate of ONE atomic
    * delete-and-insert commit ([[GraftDml.replaceWhereCond]]). Accepts
    * exactly what `insert()` can execute — [[GraftDml.sourceFilterExpr]]
    * convertibility (the same gate canDeleteWhere uses) — so a filter
    * shape the conversion lacks is rejected at PLANNING (the engine
    * re-plans) instead of throwing at execution. */
  override def canOverwrite(filters: Array[Filter]): Boolean = {
    // convertibility needs only name resolution; synthesized attributes
    // over the visible schema answer it without loading the relation
    val out: Seq[cexpr.Attribute] = visible.fields.toSeq.map(f =>
      cexpr.AttributeReference(f.name, f.dataType, nullable = true)())
    filters.forall(f => GraftDml.sourceFilterExpr(f, out).isDefined)
  }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    overwrite = true; overwriteFilters = filters; this
  }

  override def build(): Write = new V1Write {
    private val ow = overwrite
    private val fs = overwriteFilters
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ignored: Boolean): Unit = {
          val spark = data.sparkSession
          val isTruncate = fs.isEmpty ||
            fs.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
          if (ow && !isTruncate) {
            // predicate-scoped atomic overwrite (V2 replaceWhere)
            val t = GraftDml.v1Target(spark, dir)
            val cond = fs.toSeq
              .map(f => GraftDml.sourceFilterExpr(f, t.output).getOrElse(
                throw new UnsupportedOperationException(
                  s"graft table $dir: cannot overwrite by filter $f")))
              .reduce[org.apache.spark.sql.catalyst.expressions.Expression](
                org.apache.spark.sql.catalyst.expressions.And)
            GraftDml.replaceWhereCond(spark, dir, data, cond, t,
              predLabel = fs.mkString(" AND "))
          } else
            GraftDataSource.insertInto(spark, dir, visible, data,
              overwrite = ow)
          // a V1 catalog table over the same dir must not keep serving
          // its cached pre-commit file list (no ident known here)
          spark.sessionState.catalog.invalidateAllCachedTables()
        }
      }
    override def toString: String =
      s"GraftV1Write($dir, ${if (ow) "overwrite" else "append"}" +
        (if (fs.nonEmpty) s", where=${fs.mkString(" AND ")}" else "") + ")"
  }
}

/** A table staged by CTAS / RTAS: collects the query's written files
  * and commits them — with the staged DDL — only in
  * `commitStagedChanges()`. Until then nothing references the files,
  * so abort (or a crash) costs only orphan bytes the grace-gated
  * sweep reclaims. `replace` commits through
  * [[GraftDataSource.replaceAll]]'s pinned-base protocol: a commit
  * interleaving with the replace throws instead of being silently
  * overwritten. */
private[connector] final class GraftStagedTable(spark: SparkSession,
    dir: String, declared: StructType, replace: Boolean, orCreate: Boolean,
    properties: util.Map[String, String])
    extends StagedTable with SupportsWrite {

  // the REPLACE transaction's base pins at STAGE time, not commit time:
  // a commit landing while the RTAS query runs must CONFLICT (throw),
  // never be silently swallowed by a replace derived from older state
  private val stagedBase: Option[Long] = SnapshotLog.currentSnapshotId(spark, dir)
  private def existedAtStage = stagedBase.isDefined

  // files the CTAS query wrote, recorded by the staged write below
  @volatile private var staged: Seq[SnapshotLog.DataFile] = Seq.empty
  @volatile private var wrote = false

  override def name(): String = s"$dir (staged)"
  override def schema(): StructType = declared

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def properties(): util.Map[String, String] =
    Map("provider" -> "graft", "location" -> dir).asJava

  private def prop(key: String): Option[String] =
    Option(properties).flatMap(p => p.asScala.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v })

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // RTAS arrives as OverwriteByExpression(true) → truncate(); the
      // replace decision already lives in the staged mode, so this is
      // a no-op acknowledgement, not state
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit = {
              // pruning metadata rides CTAS TBLPROPERTIES — the same
              // keys the writer options take (statsCols, bloomCol,
              // partitionCols), so a V2-created table is as indexable
              // as a V1-written one
              val stats = prop("statsCols").toSeq
                .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
              val parts = prop("partitionCols").toSeq
                .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
              // PARTITIONED BY (bucket(n, col)) CTAS: arrange the query
              // result so each staged file holds one residue, and record
              // the synthetic bucket key — the SPJ layout holds from the
              // table's very first commit
              val bucket = for {
                c <- prop("bucketCol")
                n <- prop("bucketCount").flatMap(_.toIntOption)
              } yield (c, n)
              val arranged = bucket match {
                case Some((c, n)) => SnapshotLog.bucketArrange(data, c, n)
                case None => data
              }
              staged = SnapshotLog.writeData(arranged, dir,
                statsCols = stats, bloomCol = prop("bloomCol"),
                partitionCols = parts ++ bucket.map { case (c, n) =>
                  SnapshotLog.bucketPartKey(n, c) })
              wrote = true
            }
          }
        override def toString: String = s"GraftStagedV1Write($dir)"
      }
    }

  override def commitStagedChanges(): Unit = {
    // a zero-row CTAS (or a staged CREATE that never wrote) still needs
    // the DECLARED schema durable: commit a zero-row schema carrier
    val files =
      if (staged.nonEmpty) staged
      else Seq(GraftMaintenance.writeSchemaCarrier(spark, dir, declared))
    // durable TBLPROPERTIES ride the creating/replacing commit itself
    val props = GraftCatalog.durableProps(properties)
    if (!replace) {
      // CTAS create: CAS at snapshot 1 — a racing creator makes this
      // throw (TableAlreadyExists semantics), never a silent merge
      try SnapshotLog.commitAt(spark, dir, 1L, "append", files, Seq.empty,
        Map("created_by" -> "v2-ctas") ++ props)
      catch {
        case e: SnapshotLog.ConcurrentCommitException =>
          abortStagedChanges()
          throw new IllegalStateException(
            s"graft table $dir: lost the CTAS creation race", e)
      }
    } else if (!existedAtStage &&
        SnapshotLog.currentSnapshotId(spark, dir).isEmpty) {
      require(orCreate, s"graft table $dir: REPLACE TABLE target does " +
        "not exist (use CREATE OR REPLACE)")
      SnapshotLog.commitAt(spark, dir, 1L, "append", files, Seq.empty,
        Map("created_by" -> "v2-rtas") ++ props)
    } else {
      // RTAS: one atomic whole-live-set swap committed at the STAGE-TIME
      // base's successor — any commit that landed while the RTAS query
      // ran makes this throw (the replace was derived from state that no
      // longer holds), readers see old or new, never a mixture, and
      // pre-replace snapshots stay travelable. REPLACE REDEFINES the
      // table, properties included: with none given, an explicit empty
      // map commits so stale behavior-bearing keys (posDeletes,
      // lineageKey) don't silently survive the swap
      val declaredProps =
        if (props.nonEmpty) props
        else Map(SnapshotLog.TablePropsKey -> SnapshotLog.propsJson(Map.empty))
      GraftDataSource.replaceAll(spark, dir, files,
        Map("mode" -> "replace-table") ++ declaredProps,
        pinnedBase = Some(stagedBase.getOrElse(0L)))
    }
    // V1 catalog tables over this dir must re-resolve (no ident known)
    spark.sessionState.catalog.invalidateAllCachedTables()
  }

  override def abortStagedChanges(): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    // delete OUR staged write's uuid dirs (writeData gives each write an
    // exclusive data/<uuid>/ directory, so recursing into those touches
    // nothing foreign), then peel the empty shell NON-recursively — a
    // racing creator's already-written-but-uncommitted files under
    // data/<other-uuid>/ make the rmdir fail harmlessly instead of
    // being destroyed by a recursive delete of the whole table dir
    staged.map(f => new org.apache.hadoop.fs.Path(f.path).getParent)
      .distinct.foreach { d =>
        try d.getFileSystem(conf).delete(d, true)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    if (!existedAtStage && wrote &&
        SnapshotLog.currentSnapshotId(spark, dir).isEmpty) {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(conf)
      try {
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/data"), false)
        fs.delete(root, false)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
