package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{Merge, SnapshotLog}

/** SQL row-level DML on graft tables (`DELETE FROM` / `UPDATE` /
  * `MERGE INTO`, lowered by GraftDmlRule): row semantics against SQL's
  * contract (null predicates keep, simultaneous assignment, first-
  * applicable WHEN clause, cardinality violation), the copy-on-write
  * posture (only files that actually hold matching rows rewrite —
  * everything else carries by REFERENCE, pinned on paths), metadata-only
  * truncation, lineage-preserving rewrites (the change feed stays
  * derivable across SQL DML), and the loud refusals (time travel,
  * pending merge-on-read masks).
  */
class DmlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "dml-spec")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-dmlspec-$tag").toString + "/t"

  /** 3 range-clustered files over ids [0, 3000) with EXACT id zones
    * ([0,999], [1000,1999], [2000,2999] — one append per band, so the
    * layout never depends on range-partitioner sampling), plus a catalog
    * name for the SQL faces. */
  private def rangeTable(tag: String, name: String): String = {
    val dir = tmp(tag)
    for (b <- 0 until 3)
      spark.range(b * 1000L, (b + 1) * 1000L)
        .select(col("id"), (col("id") * 2).as("v")).coalesce(1)
        .write.format("graft").mode(if (b == 0) "error" else "append")
        .option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$dir')")
    dir
  }

  private def livePaths(dir: String): Set[String] =
    SnapshotLog.filesAt(spark, dir).map(_.path).toSet

  test("CDF pre-images across schema epochs keep the widened column's values") {
    val dir = tmp("epoch-pre")
    spark.range(0, 10).select(col("id"), lit(1L).as("v")).coalesce(1)
      .write.format("graft").option("statsCols", "id")
      .option("lineageKey", "id").save(dir)
    spark.sql(s"CREATE TABLE dml_epochpre USING graft " +
      s"OPTIONS (path '$dir', lineageKey 'id')")
    try {
      spark.sql("ALTER TABLE dml_epochpre ADD COLUMNS (flag BIGINT)")
      // new-epoch file WITH flag values, old-epoch file without
      spark.sql("INSERT INTO dml_epochpre VALUES (100, 2, 77), (101, 2, 88)")
      // one UPDATE touching BOTH epochs' files: the removed set then
      // spans two schemas, and a raw multi-path read of it could adopt
      // the old footer and silently drop `flag` from the emitted
      // pre-image payloads
      spark.sql("UPDATE dml_epochpre SET v = v * 10 WHERE id IN (1, 100)")
      val feedFrom = SnapshotLog.currentSnapshotId(spark, dir).get - 1
      val feed = SnapshotLog.changes(spark, dir, feedFrom, preImages = true).get
      val pre100 = feed.filter(col("_change_op") === "update_preimage" &&
        col("id") === 100).select(col("flag")).collect()
      assert(pre100.length === 1 && pre100.head.getLong(0) === 77L,
        "the new-epoch row's pre-image must carry its real flag value")
      val pre1 = feed.filter(col("_change_op") === "update_preimage" &&
        col("id") === 1).select(col("flag")).collect()
      assert(pre1.length === 1 && pre1.head.isNullAt(0),
        "the old-epoch row's pre-image null-fills the later column")
    } finally spark.sql("DROP TABLE dml_epochpre")
  }

  test("DELETE drops fully-covered files metadata-only; boundary files rewrite") {
    val dir = rangeTable("meta-del", "dml_metadel")
    try {
      val before = livePaths(dir)
      // id < 1500 covers file [0,999] entirely (zone + zero nulls proven
      // by the manifest) and half of [1000,1999]
      spark.sql("DELETE FROM dml_metadel WHERE id < 1500")
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.summary("files_dropped_metadata") === "1")
      assert(c.summary("files_touched") === "1")
      assert(c.summary("rows_deleted") === "1500")
      // the dropped file was REMOVED without a replacement rewrite of it:
      // one new file (the boundary survivors), two files gone
      assert(c.added.size === 1 && c.removed.size === 2)
      val after = livePaths(dir)
      assert((before intersect after).size === 1) // [2000,2999] by reference
      val back = spark.sql(
        "SELECT count(*) AS n, min(id) AS lo FROM dml_metadel").head
      assert(back.getLong(0) === 1500 && back.getLong(1) === 1500L)
      // a whole-file predicate with NO boundary is a pure metadata commit
      spark.sql("DELETE FROM dml_metadel WHERE id >= 2000")
      val c2 = SnapshotLog.commits(spark, dir).last
      assert(c2.summary("files_dropped_metadata") === "1" &&
        c2.summary("files_touched") === "0" && c2.added.isEmpty)
      assert(spark.sql("SELECT count(*) FROM dml_metadel").head.getLong(0) === 500)
    } finally spark.sql("DROP TABLE dml_metadel")
  }

  test("metadata DELETE never drops a file with nulls in the predicate column") {
    val dir = tmp("null-del")
    // one file whose id zone is [0,9] but which ALSO holds null ids —
    // `id < 100` covers the zone, yet the null rows must survive (SQL
    // deletes only where the predicate is TRUE)
    spark.range(10).select(
        when(col("id") < 5, col("id")).as("id"), col("id").as("v"))
      .coalesce(1)
      .write.format("graft").option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE dml_nulldel USING graft OPTIONS (path '$dir')")
    try {
      val f = SnapshotLog.filesAt(spark, dir).head
      assert(f.nulls.get("id").contains(5L), s"manifest null count: ${f.nulls}")
      spark.sql("DELETE FROM dml_nulldel WHERE id < 100")
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.summary("files_dropped_metadata") === "0",
        "a file with nulls in the predicate column must never drop by metadata")
      val back = spark.sql("SELECT count(*) AS n FROM dml_nulldel").head
      assert(back.getLong(0) === 5) // the 5 null-id rows survive
    } finally spark.sql("DROP TABLE dml_nulldel")
  }

  test("DELETE rewrites only files holding matching rows; the rest carry by reference") {
    val dir = rangeTable("del", "dml_del")
    try {
      val before = livePaths(dir)
      assert(before.size === 3)
      spark.sql("DELETE FROM dml_del WHERE id < 100")
      val after = livePaths(dir)
      // exactly one file held ids < 100: two carried by path identity
      assert((before intersect after).size === 2)
      val back = spark.sql("SELECT count(*) AS n, min(id) AS lo FROM dml_del").head
      assert(back.getLong(0) === 2900 && back.getLong(1) === 100L)
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.op === "upsert" && c.summary("mode") === "delete-sql" &&
        c.summary("rows_deleted") === "100" && c.summary("files_touched") === "1")
    } finally spark.sql("DROP TABLE dml_del")
  }

  test("DELETE keeps rows where the predicate is NULL (SQL deletes only TRUE)") {
    val dir = tmp("delnull")
    import spark.implicits._
    Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("id", "s")
      .write.format("graft").save(dir)
    spark.sql(s"CREATE TABLE dml_delnull USING graft OPTIONS (path '$dir')")
    try {
      spark.sql("DELETE FROM dml_delnull WHERE s = 'x'")
      val left = spark.sql("SELECT id FROM dml_delnull ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(left === Seq(2L, 3L), "the NULL-predicate row must survive")
    } finally spark.sql("DROP TABLE dml_delnull")
  }

  test("unconditional DELETE is a metadata-only truncation; history intact") {
    val dir = rangeTable("trunc", "dml_trunc")
    try {
      spark.sql("DELETE FROM dml_trunc")
      assert(spark.sql("SELECT count(*) FROM dml_trunc").head.getLong(0) === 0)
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.added.isEmpty && c.removed.size === 3,
        "truncation must not read or write any data file")
      assert(c.summary("rows_deleted") === "3000")
      // every pre-truncate snapshot still time-travels
      assert(spark.read.format("graft").option("versionAsOf", "3")
        .load(dir).count() === 3000)
    } finally spark.sql("DROP TABLE dml_trunc")
  }

  test("DELETE matching nothing commits nothing") {
    val dir = rangeTable("delnoop", "dml_delnoop")
    try {
      val id0 = SnapshotLog.currentSnapshotId(spark, dir).get
      spark.sql("DELETE FROM dml_delnoop WHERE id = 999999")
      assert(SnapshotLog.currentSnapshotId(spark, dir).get === id0,
        "a no-match DELETE must not publish a snapshot")
    } finally spark.sql("DROP TABLE dml_delnoop")
  }

  test("UPDATE: simultaneous assignment over the pre-update row; files carry by reference") {
    val dir = rangeTable("upd", "dml_upd")
    try {
      val before = livePaths(dir)
      // the classic swap: both RHS evaluate against the OLD row
      spark.sql("UPDATE dml_upd SET id = v, v = id WHERE id = 1500")
      val after = livePaths(dir)
      assert((before intersect after).size === 2)
      val r = spark.sql("SELECT id, v FROM dml_upd WHERE id = 3000").head
      assert(r.getLong(0) === 3000L && r.getLong(1) === 1500L,
        "SET a = b, b = a must swap, not chain")
      assert(spark.sql("SELECT count(*) FROM dml_upd").head.getLong(0) === 3000)
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.summary("mode") === "update-sql" && c.summary("rows_updated") === "1")
    } finally spark.sql("DROP TABLE dml_upd")
  }

  test("MERGE: first-applicable clause; untouched files carry by reference") {
    val dir = rangeTable("mrg", "dml_mrg")
    try {
      val before = livePaths(dir)
      // all source keys hit the first file's range; one insert key
      spark.sql(
        """MERGE INTO dml_mrg t
          |USING (SELECT * FROM VALUES (10L, 0L), (20L, 5L), (9999L, 7L) AS s(id, nv)) s
          |ON t.id = s.id
          |WHEN MATCHED AND s.nv = 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.nv + t.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""".stripMargin)
      val after = livePaths(dir)
      assert((before intersect after).size === 2,
        "files outside the source key range must carry by reference")
      assert(spark.sql("SELECT count(*) FROM dml_mrg WHERE id = 10").head.getLong(0) === 0)
      assert(spark.sql("SELECT v FROM dml_mrg WHERE id = 20").head.getLong(0) === 45L)
      assert(spark.sql("SELECT v FROM dml_mrg WHERE id = 9999").head.getLong(0) === 7L)
      assert(spark.sql("SELECT count(*) FROM dml_mrg").head.getLong(0) === 3000)
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.summary("mode") === "merge-sql" && c.summary("files_untouched") === "2")
    } finally spark.sql("DROP TABLE dml_mrg")
  }

  test("MERGE: duplicate source keys matching one target row throw; unmatched dupes insert") {
    val dir = rangeTable("card", "dml_card")
    try {
      val e = intercept[UnsupportedOperationException] {
        spark.sql(
          """MERGE INTO dml_card t
            |USING (SELECT * FROM VALUES (10L, 1L), (10L, 2L) AS s(id, nv)) s
            |ON t.id = s.id
            |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
      }
      assert(e.getMessage.contains("cardinality"))
      // duplicate keys that match NO target row are two legitimate inserts
      spark.sql(
        """MERGE INTO dml_card t
          |USING (SELECT * FROM VALUES (7777L, 1L), (7777L, 2L) AS s(id, nv)) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM dml_card WHERE id = 7777").head.getLong(0) === 2)
    } finally spark.sql("DROP TABLE dml_card")
  }

  test("insert-only MERGE appends without rewriting any touched file") {
    val dir = rangeTable("insonly", "dml_insonly")
    try {
      val before = livePaths(dir)
      spark.sql(
        """MERGE INTO dml_insonly t
          |USING (SELECT * FROM VALUES (10L, 1L), (5000L, 2L) AS s(id, nv)) s
          |ON t.id = s.id
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""".stripMargin)
      val after = livePaths(dir)
      assert(before.subsetOf(after),
        "insert-only MERGE must leave every pre-existing file live")
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.removed.isEmpty && c.summary("files_touched") === "0")
      // matched key 10 NOT re-inserted; unmatched key 5000 landed once
      assert(spark.sql("SELECT count(*) FROM dml_insonly WHERE id = 10").head.getLong(0) === 1)
      assert(spark.sql("SELECT v FROM dml_insonly WHERE id = 5000").head.getLong(0) === 2L)
      assert(spark.sql("SELECT count(*) FROM dml_insonly").head.getLong(0) === 3001)
    } finally spark.sql("DROP TABLE dml_insonly")
  }

  test("MERGE: NOT MATCHED BY SOURCE deletes target-only rows") {
    val dir = tmp("nmbs")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .write.format("graft").option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE dml_nmbs USING graft OPTIONS (path '$dir')")
    try {
      spark.sql(
        """MERGE INTO dml_nmbs t
          |USING (SELECT * FROM VALUES (2L, 99L) AS s(id, nv)) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val rows = spark.sql("SELECT id, v FROM dml_nmbs ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows === Seq((2L, 99L)))
    } finally spark.sql("DROP TABLE dml_nmbs")
  }

  test("SQL DML preserves row lineage: the change feed derives across UPDATE/DELETE/MERGE") {
    val dir = tmp("lineage")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L))
      .toDF("id", "v")
      .write.format("graft").option("statsCols", "id").save(dir)
    // establish lineage with one Scala-API lineage merge (snapshot 2)
    Merge.applyChanges(spark, dir, Seq((1L, 100L)).toDF("id", "v"), "id",
      deleteCol = None, lineage = true)
    spark.sql(s"CREATE TABLE dml_lin USING graft OPTIONS (path '$dir')")
    try {
      spark.sql("UPDATE dml_lin SET v = 999 WHERE id = 2")        // snapshot 3
      spark.sql("DELETE FROM dml_lin WHERE id = 3")               // snapshot 4
      spark.sql(
        """MERGE INTO dml_lin t
          |USING (SELECT * FROM VALUES (4L, 444L), (9L, 900L), (5L, 0L) AS s(id, nv)) s
          |ON t.id = s.id
          |WHEN MATCHED AND s.nv = 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.nv
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""".stripMargin) // snapshot 5
      val feed = SnapshotLog.changes(spark, dir, from = 2).get
        .select(col("_change_op"), col("_change_snapshot"), col("id"), col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(feed === Set(
        ("upsert", 3L, 2L, 999L),
        ("delete", 4L, 3L, -1L),
        ("upsert", 5L, 4L, 444L),
        ("upsert", 5L, 9L, 900L),
        ("delete", 5L, 5L, -1L)))
      // and the final state is consistent with replaying the feed
      val state = spark.sql("SELECT id, v FROM dml_lin ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(state === Seq((1L, 100L), (2L, 999L), (4L, 444L), (9L, 900L)))
    } finally spark.sql("DROP TABLE dml_lin")
  }

  test("SQL time travel: VERSION AS OF id / 'tag', TIMESTAMP AS OF; non-graft passes through") {
    val dir = tmp("ttsql")
    import spark.implicits._
    Seq((1L, 10L)).toDF("id", "v").write.format("graft").save(dir)
    Seq((2L, 20L)).toDF("id", "v").write.format("graft").mode("append").save(dir)
    SnapshotLog.tag(spark, dir, "audited", 1L)
    spark.sql(s"CREATE TABLE dml_ttsql USING graft OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT * FROM dml_ttsql VERSION AS OF 1").count() === 1)
      assert(spark.sql("SELECT * FROM dml_ttsql VERSION AS OF 'audited'")
        .head.getLong(0) === 1L)
      assert(spark.sql("SELECT * FROM dml_ttsql TIMESTAMP AS OF '2999-01-01'").count() === 2)
      assert(spark.sql("SELECT * FROM dml_ttsql FOR VERSION AS OF 2").count() === 2)
      // DML against the travel clause itself is unparseable (DELETE has no
      // AS OF grammar) — and the travel read is read-only by construction.
      // Non-graft tables keep Spark's own refusal:
      val pdir = tmp("ttsql-pq")
      Seq((1L, 1L)).toDF("id", "v").write.parquet(pdir)
      spark.sql(s"CREATE TABLE dml_ttsql_pq USING parquet OPTIONS (path '$pdir')")
      try {
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql("SELECT * FROM dml_ttsql_pq VERSION AS OF 1").collect()
        }
        assert(e.getMessage.contains("Time travel"))
      } finally spark.sql("DROP TABLE dml_ttsql_pq")
    } finally spark.sql("DROP TABLE dml_ttsql")
  }

  test("introspection TVFs: graft_history / graft_files / graft_tags / graft_changes") {
    val dir = tmp("tvf")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.format("graft").option("statsCols", "id").save(dir)
    Seq((3L, 30L)).toDF("id", "v")
      .write.format("graft").mode("append").option("statsCols", "id").save(dir)
    SnapshotLog.tag(spark, dir, "gold", 2L)
    // TVFs compose with ordinary SQL: filters, aggregates, projections
    val hist = spark.sql(s"SELECT snapshot_id, op FROM graft_history('$dir')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist === Seq((1L, "append"), (2L, "append")))
    assert(spark.sql(s"SELECT sum(rows) FROM graft_files('$dir')")
      .head.getLong(0) === 3)
    assert(spark.sql(s"SELECT count(*) FROM graft_files('$dir', 1)")
      .head.getLong(0) ===
      SnapshotLog.filesAt(spark, dir, Some(1L)).size.toLong)
    val tags = spark.sql(s"SELECT tag, snapshot_id FROM graft_tags('$dir')").head
    assert(tags.getString(0) === "gold" && tags.getLong(1) === 2L)
    // the change feed as a TVF, filtered in SQL
    val ins = spark.sql(
      s"SELECT id FROM graft_changes('$dir', 1) WHERE _change_op = 'insert'")
      .collect().map(_.getLong(0)).toSeq
    assert(ins === Seq(3L))
    // empty range: empty frame, schema present
    assert(spark.sql(s"SELECT * FROM graft_changes('$dir', 2, 2)").count() === 0)
    // TVFs also address the table by CATALOG NAME (no path needed)
    spark.sql(s"CREATE TABLE dml_tvf_named USING graft OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_history('dml_tvf_named')")
        .head.getLong(0) === 2)
      assert(spark.sql("SELECT sum(rows) FROM graft_files('dml_tvf_named')")
        .head.getLong(0) === 3)
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM graft_history('no_such_table')").collect()
      }
      assert(e.getMessage.contains("neither a graft catalog table"))
    } finally spark.sql("DROP TABLE dml_tvf_named")
  }

  test("SET TBLPROPERTIES lineageKey enables feed lineage on an existing table") {
    val dir = rangeTable("latelin", "dml_latelin")
    try {
      // no lineage anywhere: this DML commits an honest opaque upsert…
      spark.sql("UPDATE dml_latelin SET v = 0 WHERE id = 1")
      val opaqueAt = SnapshotLog.commits(spark, dir).last.snapshotId
      intercept[Exception] { SnapshotLog.changes(spark, dir, 0L) }
      // …then vanilla TBLPROPERTIES declares the key, and DML from here
      // on bootstraps lineage — the feed derives past the declaration
      spark.sql("ALTER TABLE dml_latelin SET TBLPROPERTIES ('lineageKey' = 'id')")
      spark.sql("UPDATE dml_latelin SET v = 7 WHERE id = 2")
      spark.sql("DELETE FROM dml_latelin WHERE id = 3")
      val feed = SnapshotLog.changes(spark, dir, opaqueAt).get
        .select(col("id"), col("_change_op")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed === Set((2L, "upsert"), (3L, "delete")))
    } finally spark.sql("DROP TABLE dml_latelin")
  }

  test("MERGE feed events key on the LINEAGE key, not the ON column; arbitrary ON stays derivable") {
    val dir = tmp("mrgkey")
    import spark.implicits._
    Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L))
      .toDF("id", "bucket", "v")
      .write.format("graft").option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE dml_mrgkey USING graft " +
      s"OPTIONS (path '$dir', lineageKey 'id')")
    try {
      // ON a NON-unique column (bucket 10 matches ids 1 and 2): the
      // conditional DELETE removes only id 1; id 2 is carried. The feed
      // must emit the id-1 delete — keying events on `bucket` would
      // anti-join it away because the carried id 2 re-adds bucket 10.
      Seq(10L).toDF("bucket").createOrReplaceTempView("dml_mrgkey_src")
      spark.sql(
        """MERGE INTO dml_mrgkey t USING dml_mrgkey_src s ON t.bucket = s.bucket
          |WHEN MATCHED AND t.id = 1 THEN DELETE""".stripMargin)
      val feed1 = SnapshotLog.changes(spark, dir, 1L, Some(2L)).get
        .select(col("id"), col("_change_op")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed1 === Set((1L, "delete")),
        s"the partially-deleted bucket's delete event must survive: $feed1")
      // an ON clause with NO extractable key equality (expression form):
      // stamps are written, so the commit must still record lineage and
      // the feed must derive — not waste the stamps as an opaque upsert
      Seq((300L, 333L)).toDF("sv", "nv").createOrReplaceTempView("dml_mrgkey_src2")
      spark.sql(
        """MERGE INTO dml_mrgkey t USING dml_mrgkey_src2 s ON t.v + 0 = s.sv
          |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
      val feed2 = SnapshotLog.changes(spark, dir, 2L, Some(3L)).get
        .select(col("id"), col("_change_op"), col("v")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(feed2 === Set((3L, "upsert", 333L)), s"got: $feed2")
    } finally spark.sql("DROP TABLE dml_mrgkey")
  }

  test("DML refuses time-travel relations and tables with pending masks") {
    val dir = rangeTable("refuse", "dml_refuse")
    spark.sql(s"CREATE TABLE dml_refuse_tt USING graft " +
      s"OPTIONS (path '$dir', versionAsOf '1')")
    try {
      val e1 = intercept[Exception] {
        spark.sql("DELETE FROM dml_refuse_tt WHERE id = 1")
      }
      assert(e1.getMessage.contains("time-travel"))
      // pending merge-on-read masks: COW DML must refuse, not detach them
      import spark.implicits._
      Merge.mergeOnRead(spark, dir, Seq((10L, 77L)).toDF("id", "v"), "id")
      val e2 = intercept[Exception] {
        spark.sql("UPDATE dml_refuse SET v = 0 WHERE id = 10")
      }
      assert(e2.getMessage.contains("delete mask"))
    } finally {
      spark.sql("DROP TABLE dml_refuse")
      spark.sql("DROP TABLE dml_refuse_tt")
    }
  }

  test("replaceWhere: one atomic commit swaps exactly the matching slice") {
    val dir = rangeTable("rw", "dml_rw")
    try {
      val preCommits = SnapshotLog.commits(spark, dir).size
      // replace band [1000, 2000) with 5 fresh rows
      spark.range(1000, 1005).select(col("id"), lit(-1L).as("v"))
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "id >= 1000 AND id < 2000").save(dir)
      // exactly ONE commit; band gone, replacement in, other bands intact
      assert(SnapshotLog.commits(spark, dir).size === preCommits + 1)
      val r = spark.sql("SELECT count(*), sum(CASE WHEN v = -1 THEN 1 " +
        "ELSE 0 END) FROM dml_rw").head
      assert((r.getLong(0), r.getLong(1)) === ((2005L, 5L)))
      assert(spark.sql(
        "SELECT count(*) FROM dml_rw WHERE id >= 1000 AND id < 2000")
        .head.getLong(0) === 5)
      // the slice predicate COVERED the middle file: it dropped by
      // metadata, and the two outer files carried by reference
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.summary("mode") === "replace-where", c.summary.toString)
      assert(c.summary("files_dropped_metadata").toLong === 1, c.summary)
      assert(c.summary("files_untouched").toLong === 2, c.summary)
      // rows that do NOT satisfy the predicate refuse loudly
      val e = intercept[Exception] {
        spark.range(0, 3).select(col("id"), lit(0L).as("v"))
          .write.format("graft").mode("overwrite")
          .option("replaceWhere", "id >= 1000 AND id < 2000").save(dir) }
      assert(e.getMessage.contains("do NOT satisfy"), e.getMessage)
      // replaceWhere without overwrite mode refuses
      val e2 = intercept[Exception] {
        spark.range(1000, 1001).select(col("id"), lit(0L).as("v"))
          .write.format("graft").mode("append")
          .option("replaceWhere", "id >= 1000").save(dir) }
      assert(e2.getMessage.contains("overwrite"), e2.getMessage)
      // a nothing-matched slice still lands its data (pure insert)
      spark.range(90000, 90002).select(col("id"), lit(7L).as("v"))
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "id >= 90000").save(dir)
      assert(spark.sql("SELECT count(*) FROM dml_rw WHERE id >= 90000")
        .head.getLong(0) === 2)
    } finally spark.sql("DROP TABLE dml_rw")
  }

  test("replaceWhere on a lineage table: the feed derives the swap") {
    val dir = tmp("rwlin")
    spark.range(0, 20).select(col("id"), col("id").as("v"))
      .write.format("graft").option("lineageKey", "id")
      .option("statsCols", "id").save(dir)
    // bootstrap lineage with one SQL update so the history is stamped
    spark.sql(s"CREATE TABLE dml_rwlin USING graft OPTIONS (path '$dir', " +
      "lineageKey 'id')")
    try {
      spark.sql("UPDATE dml_rwlin SET v = 100 WHERE id = 0")
      val preId = SnapshotLog.currentSnapshotId(spark, dir).get
      spark.range(5, 8).select(col("id"), lit(-5L).as("v"))
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "id >= 5 AND id < 10").save(dir)
      // the feed over the replaceWhere commit: 5 keys leave (5..9),
      // 3 arrive (5,6,7) — fold must equal the final state
      val ev = SnapshotLog.changes(spark, dir, from = preId).get
        .groupBy(col("_change_op")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ev.getOrElse("delete", 0L) === 2L, // 8, 9 leave outright
        s"feed ops: $ev")
      assert(ev.filterKeys(_ != "delete").values.sum === 3L, // 5,6,7 re-land
        s"feed ops: $ev")
      assert(spark.sql("SELECT count(*) FROM dml_rwlin").head.getLong(0) === 18)
    } finally spark.sql("DROP TABLE dml_rwlin")
  }
}
