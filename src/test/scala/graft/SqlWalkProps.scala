package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Shrink}

import graft.table.SnapshotLog

/** Model-based RANDOMIZED SQL walks over the whole statement surface —
  * the fuzz coverage the scripted SqlLifecycleSpec journey samples once:
  * arbitrary interleavings of INSERT / UPDATE / DELETE / MERGE INTO /
  * OPTIMIZE / RESTORE / ALTER (ADD, and RENAME COLUMN through the field
  * registry) execute purely through SQL against a graft catalog table,
  * and after EVERY statement the table must agree with an in-memory
  * model (row count + score checksum); the walk ends with time-travel
  * spot checks against the model's recorded history and — when no
  * RESTORE rewound history — a change-feed fold whose surviving key set
  * must equal the model's.
  *
  * SHRINKABLE COUNTEREXAMPLES: every op interprets its parameters
  * MODULO the state at execution time (a Restore picks "the k-th
  * retained snapshot", never a hard id), so any sub-list of a failing
  * walk is itself a valid walk — ScalaCheck's list shrinking therefore
  * converges to a minimal op sequence, printed as plain case classes.
  */
object SqlWalkProps extends Properties("SqlWalk") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxDiscardRatio(10f)

  sealed trait Op
  // viaV2: the op executes against the DataSourceV2 catalog face
  // (`gwalk.walk_N`) instead of the V1 session-catalog name — BOTH faces
  // mutate one shared log, so a walk interleaving them must still agree
  // with the model (the dual-face contract; lineage bootstraps from the
  // log-persisted declaration either way)
  final case class Insert(n: Int, viaV2: Boolean = false) extends Op
  final case class Update(bucket: Int, delta: Int, viaV2: Boolean = false) extends Op
  final case class Delete(bucket: Int, viaV2: Boolean = false) extends Op
  final case class MergeUp(n: Int, viaV2: Boolean = false) extends Op // half existing keys, half new
  // replaceWhere: atomically swap one bucket's rows for n fresh ones
  // (the writer-option face — always targets the DIR, exercising the
  // ident-less cache-invalidation path)
  final case class ReplaceSlice(bucket: Int, n: Int) extends Op
  // layout%3: 0 = bin-pack, 1 = CLUSTER BY id, 2 = N-dim ZORDER BY
  // (id, bucket) — all rows-preserving full/partial rewrites
  final case class Optimize(layout: Int) extends Op
  case object RenameScore extends Op // score column cycles to a fresh name
  final case class Restore(pick: Int) extends Op // k-th retained snapshot
  final case class AddCol(tag: Int) extends Op
  case object WidenUnits extends Op // units INT -> BIGINT (no-op if wide)

  private val genFace: Gen[Boolean] = Gen.frequency(3 -> false, 1 -> true)

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> Gen.zip(Gen.choose(1, 30), genFace).map((Insert.apply _).tupled),
    4 -> Gen.zip(Gen.choose(0, 9), Gen.choose(1, 5), genFace)
      .map((Update.apply _).tupled),
    3 -> Gen.zip(Gen.choose(0, 9), genFace).map((Delete.apply _).tupled),
    3 -> Gen.zip(Gen.choose(2, 20), genFace).map((MergeUp.apply _).tupled),
    2 -> Gen.zip(Gen.choose(0, 9), Gen.choose(1, 6))
      .map((ReplaceSlice.apply _).tupled),
    2 -> Gen.choose(0, 2).map(Optimize),
    2 -> Gen.const(RenameScore),
    1 -> Gen.choose(0, 100).map(Restore),
    1 -> Gen.choose(0, 100).map(AddCol),
    2 -> Gen.const(WidenUnits))

  private lazy val spark: SparkSession = Sessions.local("4", "sql-walk-props")

  /** One shared V2 warehouse root for every walk table: registered once
    * as catalog `gwalk`, so each walk's log is addressable through BOTH
    * faces. */
  private lazy val v2Warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft-walk-v2").toString
    spark.conf.set("spark.sql.catalog.gwalk",
      classOf[graft.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwalk.warehouse", wh)
    wh
  }

  private val walkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The mutable walk state: the SQL table plus its in-memory twin. */
  private final class Walk {
    val id: Int = walkCounter.incrementAndGet()
    val table = s"walk_$id"
    // the table dir lives under the SHARED V2 warehouse root, so the
    // same log is addressable as `walk_N` (V1) and `gwalk.walk_N` (V2)
    val dir: String = s"${SqlWalkProps.v2Warehouse}/walk_$id"
    val v2Table = s"gwalk.walk_$id"
    var rows: Map[Long, (Long, Double)] = Map.empty // id -> (bucket, score)
    var units: Map[Long, Long] = Map.empty // id -> units (int epoch or wide)
    // per-snapshot twin STATE: rows + the schema bits RESTORE must revert
    // (score column's current name, extra columns, the widened flag) —
    // RESTORE restores the schema with the content, the Delta contract
    final case class ModelState(rows: Map[Long, (Long, Double)],
        units: Map[Long, Long], scoreCol: String, extraCols: Seq[String],
        widened: Boolean)
    var history: Map[Long, ModelState] = Map.empty
    var nextId: Long = 0L
    var scoreCol: String = "score"
    var renames: Int = 0
    var extraCols: Seq[String] = Nil
    var widened: Boolean = false
    var restored: Boolean = false
    var lastRollbackId: Option[Long] = None

    // post-widening inserts carry values no int can hold — proof the
    // declared widening is live, not cosmetic
    def unitsOf(i: Long): Long = i % 50 + (if (widened) 3000000000L else 0L)

    def selectFor(ids: Seq[Long]): String = {
      val extras = extraCols.map(c => s", CAST(NULL AS INT) AS $c").mkString
      val unitsTy = if (widened) "BIGINT" else "INT"
      ids.map(i =>
        s"SELECT CAST($i AS BIGINT) AS id, CAST(${i % 10} AS BIGINT) AS bucket, " +
          s"CAST(${i * 2}.5 AS DOUBLE) AS $scoreCol, " +
          s"CAST(${unitsOf(i)} AS $unitsTy) AS units$extras")
        .mkString(" UNION ALL ")
    }

    def create(): Unit = {
      val ids = 0L until 20L
      spark.sql(s"CREATE TABLE $table USING graft " +
        s"OPTIONS (path '$dir', lineageKey 'id') AS ${selectFor(ids)}")
      rows = ids.map(i => i -> ((i % 10, i * 2 + 0.5))).toMap
      units = ids.map(i => i -> unitsOf(i)).toMap
      nextId = 20L
      record()
    }

    def record(): Unit =
      SnapshotLog.currentSnapshotId(spark, dir)
        .foreach(id => history +=
          id -> ModelState(rows, units, scoreCol, extraCols, widened))

    def check(op: Op): Prop = {
      val r = spark.sql(
        s"SELECT count(*), coalesce(sum($scoreCol), 0.0), " +
          s"coalesce(sum(units), 0) FROM $table").head
      val (n, sum, usum) = (r.getLong(0), r.getDouble(1), r.getLong(2))
      val wantSum = rows.values.map(_._2).sum
      val wantUnits = units.values.sum
      val ok = n == rows.size && math.abs(sum - wantSum) < 1e-6 &&
        usum == wantUnits
      if (!ok) Prop.falsified :| s"after $op: table ($n, $sum, $usum) != " +
        s"model (${rows.size}, $wantSum, $wantUnits)"
      else Prop.passed
    }

    private def faceOf(viaV2: Boolean): String = if (viaV2) v2Table else table

    def apply(op: Op): Unit = op match {
      case Insert(n, v2) =>
        val ids = nextId until (nextId + n)
        spark.sql(s"INSERT INTO ${faceOf(v2)} ${selectFor(ids)}")
        rows ++= ids.map(i => i -> ((i % 10, i * 2 + 0.5)))
        units ++= ids.map(i => i -> unitsOf(i))
        nextId += n
      case Update(b, d, v2) =>
        spark.sql(s"UPDATE ${faceOf(v2)} SET $scoreCol = $scoreCol + $d WHERE bucket = $b")
        rows = rows.map { case (i, (bk, sc)) =>
          i -> ((bk, if (bk == b) sc + d else sc)) }
      case Delete(b, v2) =>
        spark.sql(s"DELETE FROM ${faceOf(v2)} WHERE bucket = $b")
        val gone = rows.collect { case (i, (bk, _)) if bk == b => i }.toSet
        rows = rows.filterNot { case (_, (bk, _)) => bk == b }
        units = units.filterNot { case (i, _) => gone(i) }
      case MergeUp(n, v2) =>
        val existing = rows.keys.toSeq.sorted.take(n / 2)
        val fresh = nextId until (nextId + (n - existing.size))
        val ids = existing ++ fresh
        spark.sql(
          s"""MERGE INTO ${faceOf(v2)} t USING (${selectFor(ids)}) s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET $scoreCol = s.$scoreCol + 100.0
             |WHEN NOT MATCHED THEN INSERT (id, bucket, $scoreCol, units)
             |  VALUES (s.id, s.bucket, s.$scoreCol, s.units)""".stripMargin)
        rows ++= existing.map(i => i -> ((i % 10, i * 2 + 100.5)))
        rows ++= fresh.map(i => i -> ((i % 10, i * 2 + 0.5)))
        units ++= fresh.map(i => i -> unitsOf(i)) // matched rows keep theirs
        nextId += (n - existing.size)
      case ReplaceSlice(b, n) =>
        // fresh DISTINCT ids for this bucket, all >= nextId and all
        // ≡ b (mod 10) so the bucket = id % 10 invariant the other ops
        // rely on holds for the replacements too
        val base = (nextId / 10 + 1) * 10
        val bids = (0 until n).map(k => base + k * 10 + b)
        val extras = extraCols.map(c => s", CAST(NULL AS INT) AS $c").mkString
        val unitsTy = if (widened) "BIGINT" else "INT"
        val sel = bids.map(i =>
          s"SELECT CAST($i AS BIGINT) AS id, CAST($b AS BIGINT) AS bucket, " +
            s"CAST(${i * 2}.5 AS DOUBLE) AS $scoreCol, " +
            s"CAST(${unitsOf(i)} AS $unitsTy) AS units$extras")
          .mkString(" UNION ALL ")
        spark.sql(sel).write.format("graft").mode("overwrite")
          .option("replaceWhere", s"bucket = $b").save(dir)
        val gone = rows.collect { case (i, (bk, _)) if bk == b => i }.toSet
        rows = rows.filterNot { case (_, (bk, _)) => bk == b } ++
          bids.map(i => i -> ((b.toLong, i * 2 + 0.5)))
        units = units.filterNot { case (i, _) => gone(i) } ++
          bids.map(i => i -> unitsOf(i))
        nextId = bids.max + 1
      case Optimize(layout) => // logical rows unchanged by any layout
        spark.sql(layout % 3 match {
          case 0 => s"OPTIMIZE $table"
          case 1 => s"OPTIMIZE $table CLUSTER BY id"
          case _ => s"OPTIMIZE $table ZORDER BY (id, bucket)"
        })
      case RenameScore =>
        renames += 1
        val to = s"score_$renames"
        spark.sql(s"ALTER TABLE $table RENAME COLUMN $scoreCol TO $to")
        scoreCol = to
      case Restore(pick) =>
        val retained = SnapshotLog.snapshots(spark, dir)
          .filter(history.contains).dropRight(1) // target must be < current
        if (retained.nonEmpty) {
          val target = retained(pick % retained.size)
          spark.sql(s"RESTORE $table TO VERSION AS OF $target")
          val st = history(target)
          rows = st.rows; units = st.units; scoreCol = st.scoreCol
          extraCols = st.extraCols; widened = st.widened // schema restores too
          restored = true
          lastRollbackId = SnapshotLog.currentSnapshotId(spark, dir)
        }
      case AddCol(tag) =>
        val c = s"extra_${extraCols.size}_$tag"
        spark.sql(s"ALTER TABLE $table ADD COLUMNS ($c INT)")
        extraCols :+= c
      case WidenUnits =>
        // modulo state: already-wide tables no-op (any sub-list of a
        // failing walk stays valid, preserving shrinkability)
        if (!widened) {
          spark.sql(s"ALTER TABLE $table ALTER COLUMN units TYPE bigint")
          widened = true
        }
    }

    /** Fold the change feed: the latest event per key decides survival —
      * the surviving set must be exactly the model's keys. A walk that
      * RESTOREd asserts BOTH halves of the rollback contract: the
      * full-range feed REFUSES (a rollback commit rewrote the history a
      * consumer derived from — silently skipping it would desync every
      * downstream view), and the feed FROM the rollback commit folds
      * cleanly over the model state recorded at that commit. */
    def feedProp(): Prop = {
      import org.apache.spark.sql.functions._
      def latestEvents(from: Long): Seq[(Long, String)] =
        spark.sql(s"SELECT id, _change_op, _change_snapshot " +
            s"FROM graft_changes('$dir', $from)")
          .withColumn("_rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
              .orderBy(col("_change_snapshot").desc)))
          .filter(col("_rn") === 1)
          .select(col("id"), col("_change_op")).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toSeq
      if (restored) {
        val refused = scala.util.Try(
          spark.sql(s"SELECT * FROM graft_changes('$dir', 0)").collect())
        val refusedOk =
          if (refused.isFailure) Prop.passed
          else Prop.falsified :| "a feed range crossing a rollback must refuse"
        val fromId = lastRollbackId.get
        val base = history(fromId).rows.keySet
        val events = latestEvents(fromId)
        val surviving = base --
          events.collect { case (i, "delete") => i } ++
          events.collect { case (i, op) if op != "delete" => i }
        val foldOk =
          if (surviving == rows.keySet) Prop.passed
          else Prop.falsified :| s"post-rollback feed fold " +
            s"${surviving.size} != model ${rows.keySet.size}: diff=" +
            s"${(surviving diff rows.keySet) ++ (rows.keySet diff surviving)}"
        refusedOk && foldOk
      } else {
        val surviving =
          latestEvents(0).collect { case (i, op) if op != "delete" => i }.toSet
        if (surviving == rows.keySet) Prop.passed
        else Prop.falsified :| s"feed fold keys ${surviving.size} != " +
          s"model ${rows.keySet.size}: diff=" +
          s"${(surviving diff rows.keySet) ++ (rows.keySet diff surviving)}"
      }
    }

    /** Time-travel spot checks: every retained recorded snapshot's count
      * equals the model's history at that snapshot. */
    def historyProp(): Prop = {
      val retained = SnapshotLog.snapshots(spark, dir).filter(history.contains)
      retained.map { sid =>
        val n = spark.sql(s"SELECT count(*) FROM $table VERSION AS OF $sid")
          .head.getLong(0)
        if (n == history(sid).rows.size) Prop.passed
        else Prop.falsified :| s"VERSION AS OF $sid: $n != ${history(sid).rows.size}"
      }.foldLeft(Prop.passed)(_ && _)
    }

    def close(): Unit = spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  // lists shrink structurally (drop ops); op parameters resolve modulo
  // execution-time state, so every shrunk prefix/sub-list stays valid
  private implicit val shrinkOp: Shrink[Op] = Shrink.shrinkAny

  property("any SQL statement walk agrees with the model at every step") =
    Prop.forAll(Gen.choose(4, 12).flatMap(Gen.listOfN(_, genOp))) { ops =>
      val w = new Walk
      try {
        w.create()
        val stepProps = ops.map { op =>
          w.apply(op)
          w.record()
          w.check(op)
        }
        (stepProps :+ w.historyProp() :+ w.feedProp())
          .foldLeft(Prop.passed)(_ && _)
      } finally w.close()
    }
}
