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
  final case class Insert(n: Int) extends Op
  final case class Update(bucket: Int, delta: Int) extends Op
  final case class Delete(bucket: Int) extends Op
  final case class MergeUp(n: Int) extends Op // half existing keys, half new
  case object Optimize extends Op
  case object RenameScore extends Op // score column cycles to a fresh name
  final case class Restore(pick: Int) extends Op // k-th retained snapshot
  final case class AddCol(tag: Int) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> Gen.choose(1, 30).map(Insert),
    4 -> Gen.zip(Gen.choose(0, 9), Gen.choose(1, 5)).map((Update.apply _).tupled),
    3 -> Gen.choose(0, 9).map(Delete),
    3 -> Gen.choose(2, 20).map(MergeUp),
    2 -> Gen.const(Optimize),
    2 -> Gen.const(RenameScore),
    1 -> Gen.choose(0, 100).map(Restore),
    1 -> Gen.choose(0, 100).map(AddCol))

  private lazy val spark: SparkSession = Sessions.local("4", "sql-walk-props")

  private val walkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The mutable walk state: the SQL table plus its in-memory twin. */
  private final class Walk {
    val id: Int = walkCounter.incrementAndGet()
    val table = s"walk_$id"
    val dir: String =
      java.nio.file.Files.createTempDirectory(s"graft-walk-$id").toString + "/t"
    var rows: Map[Long, (Long, Double)] = Map.empty // id -> (bucket, score)
    // per-snapshot twin STATE: rows + the schema bits RESTORE must revert
    // (score column's current name, extra columns) — RESTORE restores the
    // schema with the content, the Delta contract
    var history: Map[Long, (Map[Long, (Long, Double)], String, Seq[String])] =
      Map.empty
    var nextId: Long = 0L
    var scoreCol: String = "score"
    var renames: Int = 0
    var extraCols: Seq[String] = Nil
    var restored: Boolean = false

    def selectFor(ids: Seq[Long]): String = {
      val extras = extraCols.map(c => s", CAST(NULL AS INT) AS $c").mkString
      ids.map(i =>
        s"SELECT CAST($i AS BIGINT) AS id, CAST(${i % 10} AS BIGINT) AS bucket, " +
          s"CAST(${i * 2}.5 AS DOUBLE) AS $scoreCol$extras").mkString(" UNION ALL ")
    }

    def create(): Unit = {
      val ids = 0L until 20L
      spark.sql(s"CREATE TABLE $table USING graft " +
        s"OPTIONS (path '$dir', lineageKey 'id') AS ${selectFor(ids)}")
      rows = ids.map(i => i -> ((i % 10, i * 2 + 0.5))).toMap
      nextId = 20L
      record()
    }

    def record(): Unit =
      SnapshotLog.currentSnapshotId(spark, dir)
        .foreach(id => history += id -> ((rows, scoreCol, extraCols)))

    def check(op: Op): Prop = {
      val r = spark.sql(
        s"SELECT count(*), coalesce(sum($scoreCol), 0.0) FROM $table").head
      val (n, sum) = (r.getLong(0), r.getDouble(1))
      val wantSum = rows.values.map(_._2).sum
      val ok = n == rows.size && math.abs(sum - wantSum) < 1e-6
      if (!ok) Prop.falsified :| s"after $op: table ($n, $sum) != model " +
        s"(${rows.size}, $wantSum)"
      else Prop.passed
    }

    def apply(op: Op): Unit = op match {
      case Insert(n) =>
        val ids = nextId until (nextId + n)
        spark.sql(s"INSERT INTO $table ${selectFor(ids)}")
        rows ++= ids.map(i => i -> ((i % 10, i * 2 + 0.5)))
        nextId += n
      case Update(b, d) =>
        spark.sql(s"UPDATE $table SET $scoreCol = $scoreCol + $d WHERE bucket = $b")
        rows = rows.map { case (i, (bk, sc)) =>
          i -> ((bk, if (bk == b) sc + d else sc)) }
      case Delete(b) =>
        spark.sql(s"DELETE FROM $table WHERE bucket = $b")
        rows = rows.filterNot { case (_, (bk, _)) => bk == b }
      case MergeUp(n) =>
        val existing = rows.keys.toSeq.sorted.take(n / 2)
        val fresh = nextId until (nextId + (n - existing.size))
        val ids = existing ++ fresh
        spark.sql(
          s"""MERGE INTO $table t USING (${selectFor(ids)}) s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET $scoreCol = s.$scoreCol + 100.0
             |WHEN NOT MATCHED THEN INSERT (id, bucket, $scoreCol)
             |  VALUES (s.id, s.bucket, s.$scoreCol)""".stripMargin)
        rows ++= existing.map(i => i -> ((i % 10, i * 2 + 100.5)))
        rows ++= fresh.map(i => i -> ((i % 10, i * 2 + 0.5)))
        nextId += (n - existing.size)
      case Optimize =>
        spark.sql(s"OPTIMIZE $table") // logical rows unchanged
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
          val (r, sc, ec) = history(target)
          rows = r; scoreCol = sc; extraCols = ec // schema restores too
          restored = true
        }
      case AddCol(tag) =>
        val c = s"extra_${extraCols.size}_$tag"
        spark.sql(s"ALTER TABLE $table ADD COLUMNS ($c INT)")
        extraCols :+= c
    }

    /** Fold the whole change feed: the latest event per key decides
      * survival — the surviving set must be exactly the model's keys.
      * Only meaningful when no RESTORE rewound history (the feed refuses
      * rollback ranges by design). */
    def feedProp(): Prop =
      if (restored) Prop.passed
      else {
        import org.apache.spark.sql.functions._
        val feed = spark.sql(s"SELECT * FROM graft_changes('$dir', 0)")
        val surviving = feed
          .withColumn("_rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
              .orderBy(col("_change_snapshot").desc)))
          .filter(col("_rn") === 1 && col("_change_op") =!= "delete")
          .select(col("id")).collect().map(_.getLong(0)).toSet
        if (surviving == rows.keySet) Prop.passed
        else Prop.falsified :| s"feed fold keys ${surviving.size} != " +
          s"model ${rows.keySet.size}: diff=" +
          s"${(surviving diff rows.keySet) ++ (rows.keySet diff surviving)}"
      }

    /** Time-travel spot checks: every retained recorded snapshot's count
      * equals the model's history at that snapshot. */
    def historyProp(): Prop = {
      val retained = SnapshotLog.snapshots(spark, dir).filter(history.contains)
      retained.map { sid =>
        val n = spark.sql(s"SELECT count(*) FROM $table VERSION AS OF $sid")
          .head.getLong(0)
        if (n == history(sid)._1.size) Prop.passed
        else Prop.falsified :| s"VERSION AS OF $sid: $n != ${history(sid)._1.size}"
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
