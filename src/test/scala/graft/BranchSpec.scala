package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{Branch, Merge, SnapshotLog}

/** Named branch refs ([[graft.table.Branch]] — the Iceberg refs school,
  * generalizing single-commit WAP to a chain): fork at a pinned base,
  * stage N commits invisible to main, read the branch head the whole
  * time, fast-forward publish (zero data bytes moved), OCC-rebase over
  * interleaved main appends, abort on true conflicts, and retention
  * protection for branch-referenced files and fork bases. */
class BranchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "branch-spec")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-branch-$tag").toString + "/t"

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id"), (col("id") * 2).as("v"))

  private def seed(tag: String): String = {
    val dir = tmp(tag)
    rows(0, 100).coalesce(1).write.format("graft")
      .option("statsCols", "id").save(dir)
    dir
  }

  test("a branch chain is invisible to main, readable at head, and publishes fast-forward") {
    val dir = seed("ff")
    val base = Branch.create(spark, dir, "audit")
    assert(base === 1L)
    assert(Branch.commitTo(spark, dir, "audit", rows(100, 150),
      statsCol = Some("id")) === 1)
    assert(Branch.commitTo(spark, dir, "audit", rows(150, 180),
      statsCol = Some("id")) === 2)
    // main never sees the chain; the branch head sees all of it
    assert(spark.read.format("graft").load(dir).count() === 100)
    assert(SnapshotLog.currentSnapshotId(spark, dir).contains(1L))
    assert(Branch.read(spark, dir, "audit").get.count() === 180)
    assert(Branch.branches(spark, dir) === Seq("audit"))
    // fast-forward: two ordinary commits land, the branch is gone
    val head = Branch.publish(spark, dir, "audit")
    assert(head === 3L)
    assert(spark.read.format("graft").load(dir).count() === 180)
    assert(Branch.branches(spark, dir).isEmpty)
    val published = SnapshotLog.commits(spark, dir)
      .filter(_.summary.get("branch_published").contains("audit"))
    assert(published.map(_.summary("branch_k")).sorted === Seq("1", "2"))
    // double-create after drop works; duplicate create refuses
    Branch.create(spark, dir, "audit")
    val e = intercept[IllegalArgumentException] {
      Branch.create(spark, dir, "audit") }
    assert(e.getMessage.contains("already exists"))
    Branch.drop(spark, dir, "audit")
  }

  test("publish REBASES over interleaved main appends; a removal conflicts") {
    val dir = seed("rebase")
    Branch.create(spark, dir, "b")
    Branch.commitTo(spark, dir, "b", rows(100, 120), statsCol = Some("id"))
    // main moves on: two appends land while the branch is staged
    rows(200, 210).write.format("graft").mode("append")
      .option("statsCols", "id").save(dir)
    rows(210, 220).write.format("graft").mode("append")
      .option("statsCols", "id").save(dir)
    val head = Branch.publish(spark, dir, "b")
    assert(head === 4L, "publish must rebase past the interleaves")
    assert(spark.read.format("graft").load(dir).count() === 140)
    // a main-line REWRITE of a fork-base file aborts the publish: the
    // branch derived from a view that no longer exists
    val dir2 = seed("conflict")
    Branch.create(spark, dir2, "b")
    Branch.commitTo(spark, dir2, "b", rows(100, 110), statsCol = Some("id"))
    graft.cdc.Compaction.compactDir(spark, dir2,
      clusterBy = Some("id")) // interleave: every base file rewritten
    assert(SnapshotLog.filesAt(spark, dir2).nonEmpty)
    val ex = intercept[SnapshotLog.ConcurrentCommitException] {
      Branch.publish(spark, dir2, "b")
    }
    assert(ex.getMessage.contains("removed"))
    // the branch survives the abort; dropping it abandons cleanly
    assert(Branch.branches(spark, dir2) === Seq("b"))
    Branch.drop(spark, dir2, "b")
  }

  test("retention: branch files and the fork base survive expireSnapshots") {
    val dir = seed("retain")
    rows(100, 110).write.format("graft").mode("append")
      .option("statsCols", "id").save(dir)
    Branch.create(spark, dir, "keep") // base = 2
    Branch.commitTo(spark, dir, "keep", rows(300, 310), statsCol = Some("id"))
    // main churns far past the base
    for (i <- 0 until 4)
      rows(400 + i * 10, 410 + i * 10).write.format("graft").mode("append")
        .option("statsCols", "id").save(dir)
    SnapshotLog.expireSnapshots(spark, dir, retainLast = 1, orphanGraceMs = 0L)
    // the fork base stayed resolvable and the branch file survived the
    // zero-grace orphan sweep
    assert(Branch.read(spark, dir, "keep").get.count() === 120)
    val head = Branch.publish(spark, dir, "keep")
    assert(spark.read.format("graft").load(dir).count() === 160)
    assert(SnapshotLog.currentSnapshotId(spark, dir).contains(head))
  }

  test("SQL faces: CREATE/PUBLISH/DROP BRANCH and the branch TVFs") {
    val dir = seed("sql")
    spark.sql(s"CREATE TABLE branch_sql USING graft OPTIONS (path '$dir')")
    try {
      spark.sql("ALTER TABLE branch_sql CREATE BRANCH audit")
      Branch.commitTo(spark, dir, "audit", rows(100, 120),
        statsCol = Some("id"))
      val b = spark.sql(s"SELECT * FROM graft_branches('$dir')").collect()
      assert(b.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ===
        Seq(("audit", 1L, 1)))
      assert(spark.sql(s"SELECT count(*) FROM graft_branch('$dir', 'audit')")
        .head.getLong(0) === 120)
      assert(spark.sql("SELECT count(*) FROM branch_sql")
        .head.getLong(0) === 100, "main must not see the staged chain")
      val pub = spark.sql("ALTER TABLE branch_sql PUBLISH BRANCH audit").head
      assert(pub.getString(0) === "audit" && pub.getLong(1) === 2L)
      assert(spark.sql("SELECT count(*) FROM branch_sql")
        .head.getLong(0) === 120)
      spark.sql("ALTER TABLE branch_sql CREATE BRANCH tmp")
      spark.sql("ALTER TABLE branch_sql DROP BRANCH tmp")
      assert(spark.sql(s"SELECT count(*) FROM graft_branches('$dir')")
        .head.getLong(0) === 0)
    } finally spark.sql("DROP TABLE branch_sql")
  }

  test("re-creating a published branch NAME republishes cleanly (no marker collision)") {
    // the fixed-name WAP pattern: the same branch name forks, stages and
    // publishes every cycle — an old publish's idempotence markers must
    // never claim the NEW chain's k values (the token scoping)
    val dir = seed("republish")
    Branch.create(spark, dir, "wap")
    Branch.commitTo(spark, dir, "wap", rows(100, 110), statsCol = Some("id"))
    Branch.publish(spark, dir, "wap")
    assert(spark.read.format("graft").load(dir).count() === 110)
    Branch.create(spark, dir, "wap")
    Branch.commitTo(spark, dir, "wap", rows(200, 220), statsCol = Some("id"))
    Branch.publish(spark, dir, "wap")
    assert(spark.read.format("graft").load(dir).count() === 130,
      "the re-created chain's staged commits must land, not be skipped " +
        "as already-published")
  }

  test("branch read composes with merge-on-read masks staged on main") {
    val dir = seed("masks")
    Merge.mergeOnRead(spark, dir,
      spark.range(0, 5).select(col("id"), lit(true).as("del")),
      "id", deleteCol = Some("del")) // main: 5 keys masked
    Branch.create(spark, dir, "b")
    Branch.commitTo(spark, dir, "b", rows(100, 105), statsCol = Some("id"))
    val got = Branch.read(spark, dir, "b").get
    assert(got.count() === 100, "base masks apply under the branch read")
    assert(got.filter(col("id") < 5).count() === 0)
    assert(got.filter(col("id") >= 100).count() === 5)
    Branch.drop(spark, dir, "b")
  }
}
