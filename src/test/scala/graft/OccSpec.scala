package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{Merge, SnapshotLog}
import graft.table.SnapshotLog.ConflictGuard

/** Optimistic concurrency with LOGICAL conflict detection
  * ([[SnapshotLog.commitPinned]]) — the Delta ConflictChecker / Iceberg
  * validate-and-retry school. A pinned-base writer that loses its id
  * race no longer aborts outright: the interleaved commits are read
  * (metadata only) and classified against the writer's declared read
  * footprint; compatible interleaves REBASE (same staged files, new id),
  * true conflicts throw with the commit and reason named.
  *
  * Deterministic tests drive commitPinned directly (stage, interleave,
  * commit); the soaks race the REAL maintenance entry points
  * (compactDir, consolidateMasks, SQL DELETE) against live writers —
  * at 100 TB this is the difference between "hourly OPTIMIZE and the
  * streaming sink serialize by aborting each other" and "maintenance
  * composes with ingest".
  */
class OccSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "occ-spec")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-occspec-$tag").toString + "/t"

  /** One append of ids [lo, hi) with an exact id zone. */
  private def append(dir: String, lo: Long, hi: Long): Unit =
    spark.range(lo, hi).select(col("id"), (col("id") * 2).as("v")).coalesce(1)
      .write.format("graft").mode("append").option("statsCols", "id").save(dir)

  private def seed(tag: String, bands: Int = 2): String = {
    val dir = tmp(tag)
    for (b <- 0 until bands) append(dir, b * 1000L, (b + 1) * 1000L)
    dir
  }

  private def count(dir: String): Long =
    spark.read.format("graft").load(dir).count()

  /** Stage a full rewrite of the CURRENT live set (the shape of a
    * clustering compaction), without committing. */
  private def stageRewrite(dir: String): (Long, Seq[SnapshotLog.DataFile],
      Seq[SnapshotLog.DataFile]) = {
    val base = SnapshotLog.currentSnapshotId(spark, dir).get
    val files = SnapshotLog.filesAt(spark, dir, Some(base))
    val df = SnapshotLog.read(spark, dir, asOf = Some(base)).get
    val written = SnapshotLog.writeData(df.repartition(1), dir,
      statsCol = Some("id"))
    (base, files, written)
  }

  test("a lost replace race REBASES over an interleaved append") {
    val dir = seed("rebase")
    val (base, files, written) = stageRewrite(dir)
    append(dir, 5000, 5500) // interleave: takes id base+1
    val id = SnapshotLog.commitPinned(spark, dir, base, "replace",
      written, files.map(_.path), Map("table" -> "t"))
    assert(id === base + 2) // landed AFTER the interleave, not instead of it
    assert(count(dir) === 2500) // 2000 rewritten + 500 appended: nothing lost
    val c = SnapshotLog.commits(spark, dir).last
    assert(c.summary("rebased_from") === (base + 1).toString)
    assert(c.summary("rebased_over") === "1")
    // the appended file survived the rewrite's removed set
    val live = SnapshotLog.filesAt(spark, dir)
    assert(live.exists(_.statsMin.contains(5000L)))
  }

  test("chained rebases: two interleaved appends, then a foreign removal conflicts") {
    val dir = seed("chain")
    val (base, files, written) = stageRewrite(dir)
    append(dir, 5000, 5100)
    append(dir, 6000, 6100)
    val id = SnapshotLog.commitPinned(spark, dir, base, "replace",
      written, files.map(_.path), Map.empty)
    assert(id === base + 3 && count(dir) === 2200)
    assert(SnapshotLog.commits(spark, dir).last.summary("rebased_over") === "2")

    // second round: another staged rewrite, but the interleave REMOVES one
    // of its pinned files (a racing compaction) — rebase must refuse
    val (b2, f2, w2) = stageRewrite(dir)
    SnapshotLog.commit(spark, dir, "replace",
      added = SnapshotLog.writeData(
        SnapshotLog.read(spark, dir, asOf = Some(b2)).get.limit(0), dir,
        statsCol = Some("id")),
      removed = Seq(f2.head.path))
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, dir, b2, "replace", w2,
        f2.map(_.path), Map.empty)
    }
    assert(e.getMessage.contains("removed") &&
      e.getMessage.contains("cannot rebase"))
  }

  test("an interleaved equality-delete mask conflicts with a re-stamping rewrite") {
    val dir = seed("mask")
    val (base, files, written) = stageRewrite(dir)
    // interleave: a merge-on-read upsert commits a mask whose deletes
    // would silently stop applying to the rewrite's re-stamped rows
    Merge.mergeOnRead(spark, dir,
      spark.range(0, 10).select(col("id"), lit(-1L).as("v")), "id")
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, dir, base, "replace", written,
        files.map(_.path), Map.empty)
    }
    assert(e.getMessage.contains("delete mask"))
  }

  test("mayReadAdded: append inside the read footprint conflicts, outside rebases") {
    // the guard a DML/merge hands commitPinned: an appended file
    // conflicts only when its id zone may hold keys the derivation read
    def guardFor(lo: Long, hi: Long) = ConflictGuard(mayReadAdded = Some(fs =>
      fs.filter(f => (f.statsMin, f.statsMax) match {
        case (Some(mn), Some(mx)) => mx >= lo && mn < hi
        case _ => true // no zone: conservatively conflicting
      })))
    // outside: rebases
    val d1 = seed("foot1")
    val (b1, f1, w1) = stageRewrite(d1)
    append(d1, 9000, 9100)
    val id = SnapshotLog.commitPinned(spark, d1, b1, "replace", w1,
      f1.map(_.path), Map.empty, guard = guardFor(0, 2000))
    assert(id === b1 + 2 && count(d1) === 2100)
    // inside: conflicts, naming the file
    val d2 = seed("foot2")
    val (b2, f2, w2) = stageRewrite(d2)
    append(d2, 1500, 1600)
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, d2, b2, "replace", w2,
        f2.map(_.path), Map.empty, guard = guardFor(0, 2000))
    }
    assert(e.getMessage.contains("should have read"))
  }

  test("registrySensitive conflicts with an interleaved schema commit; plain rewrites don't") {
    val d1 = seed("reg1")
    val (b1, f1, w1) = stageRewrite(d1)
    SnapshotLog.commit(spark, d1, "schema", Seq.empty, Seq.empty,
      Map("add_columns" -> "note string"))
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, d1, b1, "replace", w1,
        f1.map(_.path), Map.empty,
        guard = ConflictGuard(registrySensitive = true))
    }
    assert(e.getMessage.contains("schema"))
    // a registry-indifferent rewrite composes with the same interleave
    val d2 = seed("reg2")
    val (b2, f2, w2) = stageRewrite(d2)
    SnapshotLog.commit(spark, d2, "schema", Seq.empty, Seq.empty,
      Map("add_columns" -> "note string"))
    val id = SnapshotLog.commitPinned(spark, d2, b2, "replace", w2,
      f2.map(_.path), Map.empty)
    assert(id === b2 + 2)
  }

  test("idStamped: a lineage rewrite refuses ANY other id") {
    val dir = seed("lin")
    val (base, files, written) = stageRewrite(dir)
    append(dir, 5000, 5100) // even a compatible interleave
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, dir, base, "upsert", written,
        files.map(_.path), Map.empty,
        guard = ConflictGuard(idStamped = true))
    }
    assert(e.getMessage.contains("lineage"))
  }

  test("a lost rollback race never rebases") {
    val dir = seed("rb", bands = 3)
    val (base, files, written) = stageRewrite(dir)
    SnapshotLog.rollback(spark, dir, 1L) // interleave: history rewound
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, dir, base, "replace", written,
        files.map(_.path), Map.empty)
    }
    assert(e.getMessage.contains("rolled back"))
  }

  test("a registry-materializing rewrite conflicts with an interleaved row-bearing append") {
    // the clustering compaction over a renamed table commits a RESET
    // identity registry that must describe every live file — but an
    // interleaved append's file was written in the OLD physical name
    // space (its writer read the registry before the reset). Rebasing
    // over it would leave that file's renamed column unmapped (null
    // under its logical name, phantom physical column). The guard
    // Compaction.compactSnapshotted:273 now passes (registrySensitive +
    // mayReadAdded = all row-bearing adds) must therefore ABORT.
    val dir = seed("regmat")
    val (base, files, written) = stageRewrite(dir)
    append(dir, 5000, 5100) // interleave: old-name-space rows
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, dir, base, "replace", written,
        removed = files.map(_.path), summary = Map("t" -> "x"),
        guard = ConflictGuard(registrySensitive = true,
          mayReadAdded = Some(fs => fs)))
    }
    assert(e.getMessage.contains("may hold rows"))
    assert(count(dir) === 2100) // nothing replaced; interleave intact
  }

  test("bin-pack chain: a foreign removal of a LATER class's file aborts the chain") {
    // binPack commits one replace PER schema class, ids chained from one
    // pinned base — only the FIRST commit to lose a race classifies an
    // interleave, so every class commit must guard the ENTIRE pinned
    // live set (minus its own removed files) as read paths: a foreign
    // rewrite that removed a later class's file would otherwise slip
    // past and that class would re-add its rows from the stale read
    // (duplication). Mirrors Compaction.binPack's guard.
    val dir = tmp("chain")
    for (b <- 0 until 3) append(dir, b * 1000L, (b + 1) * 1000L) // A, B, C
    val base = SnapshotLog.currentSnapshotId(spark, dir).get
    val all = SnapshotLog.filesAt(spark, dir, Some(base)).filter(_.kind == "data")
    assert(all.size === 3)
    val Seq(fa, _, fc) = all.sortBy(_.path)
    // class-1 stage: rewrite A only
    val w1 = SnapshotLog.writeData(
      spark.read.parquet(fa.path).repartition(1), dir, statsCol = Some("id"))
    // interleave: a foreign compaction replaces C
    val wc = SnapshotLog.writeData(
      spark.read.parquet(fc.path).repartition(1), dir, statsCol = Some("id"))
    SnapshotLog.commitAt(spark, dir, base + 1, "replace", wc, Seq(fc.path),
      Map("who" -> "foreign"))
    val chainGuard = ConflictGuard(
      readPaths = all.map(_.path).toSet - fa.path)
    val e = intercept[SnapshotLog.ConcurrentCommitException] {
      SnapshotLog.commitPinned(spark, dir, base, "replace", w1,
        removed = Seq(fa.path), summary = Map("t" -> "x"),
        guard = chainGuard)
    }
    assert(e.getMessage.contains("removed"))
    // the same guard still REBASES over a disjoint append (composability
    // with ingest is why the chain rebases at all)
    val dir2 = tmp("chain2")
    for (b <- 0 until 3) append(dir2, b * 1000L, (b + 1) * 1000L)
    val base2 = SnapshotLog.currentSnapshotId(spark, dir2).get
    val all2 = SnapshotLog.filesAt(spark, dir2, Some(base2)).filter(_.kind == "data")
    val f2 = all2.sortBy(_.path).head
    val w2 = SnapshotLog.writeData(
      spark.read.parquet(f2.path).repartition(1), dir2, statsCol = Some("id"))
    append(dir2, 9000, 9100) // interleave: plain append
    val id = SnapshotLog.commitPinned(spark, dir2, base2, "replace", w2,
      removed = Seq(f2.path), summary = Map("t" -> "x"),
      guard = ConflictGuard(readPaths = all2.map(_.path).toSet - f2.path))
    assert(id === base2 + 2)
    assert(count(dir2) === 3100)
  }

  test("soak: compaction composes with live appends — no aborts, no lost rows") {
    val dir = tmp("soak1")
    // many tiny files = permanent bin-pack debt, so every pass commits
    for (i <- 0 until 8) append(dir, i * 10L, i * 10L + 10)
    @volatile var appenderErr: Option[Throwable] = None
    val rows = new java.util.concurrent.atomic.AtomicLong(80L)
    val appender = new Thread(() => {
      try {
        for (i <- 0 until 12) {
          append(dir, 100000L + i * 10, 100000L + i * 10 + 10)
          rows.addAndGet(10)
        }
      } catch { case t: Throwable => appenderErr = Some(t) }
    })
    appender.start()
    var rebased = 0
    try {
      // maintenance loop racing the appender: with logical conflict
      // detection it NEVER aborts on an append interleave
      for (_ <- 0 until 6) {
        graft.cdc.Compaction.compactDir(spark, dir,
          targetBytes = 64L * 1024 * 1024)
        rebased += SnapshotLog.commits(spark, dir)
          .count(_.summary.contains("rebased_from"))
      }
    } finally appender.join()
    assert(appenderErr.isEmpty, s"appender failed: $appenderErr")
    assert(count(dir) === rows.get())
    // losing quietly is fine (timing), but the machinery must be exercised
    // somewhere across the suite; report for the curious
    info(s"soak observed $rebased rebased commit(s) in history samples")
  }

  test("soak: mask consolidation composes with a live rowdelta writer") {
    val dir = tmp("soak2")
    append(dir, 0, 1000)
    @volatile var writerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try {
        for (i <- 0 until 10) {
          // upsert a sliding window of keys: every batch adds a mask
          Merge.mergeOnRead(spark, dir,
            spark.range(i * 50L, i * 50L + 100)
              .select(col("id"), lit(i.toLong).as("v")), "id")
        }
      } catch { case t: Throwable => writerErr = Some(t) }
    })
    writer.start()
    try {
      for (_ <- 0 until 8) Merge.consolidateMasks(spark, dir)
    } finally writer.join()
    assert(writerErr.isEmpty, s"rowdelta writer failed: $writerErr")
    Merge.consolidateMasks(spark, dir)
    // correctness after the dust settles: latest value per upserted key
    val got = spark.read.format("graft").load(dir)
      .filter(col("id") < 550).groupBy(col("v")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch i covered [50i, 50i+100): keys [50i, 50(i+1)) keep value i
    // except the last batch's full window
    val expected = (0 until 9).map(i => i.toLong -> 50L).toMap + (9L -> 100L)
    assert(got.filterKeys(_ >= 0).toMap === expected)
  }

  test("two separate JVMs: appends race compaction, both land, nothing lost") {
    import scala.sys.process._
    val dir = tmp("jvmrace")
    // heavy standing small-file debt so every compaction pass commits
    for (i <- 0 until 10) append(dir, i * 10L, i * 10L + 10)
    val goFile = dir + ".go"
    val cp = System.getProperty("java.class.path")
    val out = new StringBuilder
    val proc = Process(Seq("java", "-Xmx1g", "-cp", cp, "graft.tools.OccRace",
      dir, goFile, "6", "10", "100000"))
      .run(ProcessLogger(l => out.synchronized { out.append(l).append('\n') },
        l => out.synchronized { out.append(l).append('\n') }))
    // wait for the second JVM's Spark to boot, then open the gate and
    // immediately start compacting against its appends
    Thread.sleep(8000)
    java.nio.file.Files.write(java.nio.file.Paths.get(goFile),
      Array.emptyByteArray)
    var passes = 0
    while (proc.isAlive() && passes < 60) {
      graft.cdc.Compaction.compactDir(spark, dir, targetBytes = 64L * 1024 * 1024)
      passes += 1
    }
    assert(proc.exitValue() === 0, s"appender JVM failed:\n$out")
    assert(out.toString.contains("DONE 60"), s"appender incomplete:\n$out")
    graft.cdc.Compaction.compactDir(spark, dir, targetBytes = 64L * 1024 * 1024)
    // nothing lost on either side: 100 seeded + 60 appended cross-process
    assert(count(dir) === 160L)
    val rebased = SnapshotLog.commits(spark, dir)
      .count(_.summary.contains("rebased_from"))
    info(s"cross-process race: $passes compaction passes, " +
      s"$rebased rebased commit(s) in retained history")
  }

  test("soak: SQL DELETE composes with disjoint live appends") {
    val dir = tmp("soak3")
    spark.range(0, 2000).select(col("id"), (col("id") % 7).as("v")).coalesce(2)
      .write.format("graft").option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE occ_del USING graft OPTIONS (path '$dir')")
    try {
      @volatile var appenderErr: Option[Throwable] = None
      val appender = new Thread(() => {
        try for (i <- 0 until 10) append(dir, 50000L + i * 10, 50000L + i * 10 + 10)
        catch { case t: Throwable => appenderErr = Some(t) }
      })
      appender.start()
      try {
        // deletes scoped far from the appender's id range: zone metadata
        // proves the interleaves irrelevant, so none of these may abort
        for (k <- 0 until 8)
          spark.sql(s"DELETE FROM occ_del WHERE id >= ${k * 100} AND id < ${k * 100 + 50}")
      } finally appender.join()
      assert(appenderErr.isEmpty, s"appender failed: $appenderErr")
      assert(count(dir) === 2000 - 8 * 50 + 100)
      assert(spark.sql("SELECT count(*) FROM occ_del WHERE id < 800 AND id % 100 < 50")
        .head.getLong(0) === 0L)
    } finally spark.sql("DROP TABLE occ_del")
  }
}
