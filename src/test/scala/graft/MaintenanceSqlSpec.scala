package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{Merge, SnapshotLog}

/** SQL maintenance statements (`OPTIMIZE` / `VACUUM`, claimed by
  * GraftSqlParser in front of the session parser): grammar faces,
  * lowering onto compactDir/expireSnapshots, the O(debt) bin-pack
  * posture (right-sized files carry by REFERENCE through SQL OPTIMIZE),
  * layout restoration (CLUSTER BY disjoint zones, ZORDER BY 2-D stats),
  * mask materialization unblocking SQL DML, tag-exempt retention, and
  * the loud refusals. Ordinary SQL must pass through the delegating
  * parser untouched.
  */
class MaintenanceSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "maint-sql-spec")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-maintsql-$tag").toString + "/t"

  /** n single-file appends of 100 ids each — pure small-file debt. */
  private def debtTable(tag: String, name: String, n: Int = 4): String = {
    val dir = tmp(tag)
    for (b <- 0 until n)
      spark.range(b * 100L, (b + 1) * 100L)
        .select(col("id"), (col("id") * 2).as("v")).coalesce(1)
        .write.format("graft").mode(if (b == 0) "error" else "append")
        .option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$dir')")
    dir
  }

  test("OPTIMIZE bin-packs small-file debt; history intact; report row") {
    val dir = debtTable("pack", "maint_pack")
    try {
      val before = SnapshotLog.filesAt(spark, dir)
      assert(before.size === 4)
      val rep = spark.sql("OPTIMIZE maint_pack").head
      assert(rep.getInt(1) === 4, "files_before")
      assert(rep.getInt(2) < 4, "files_after must shrink")
      assert(rep.getLong(3) === 400L, "rows preserved")
      assert(spark.sql("SELECT count(*), sum(v) FROM maint_pack").head
        .getLong(0) === 400)
      // maintenance is a replace commit: invisible to history semantics,
      // pre-optimize snapshots still time-travelable
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.op === "replace")
      assert(spark.sql("SELECT count(*) FROM maint_pack VERSION AS OF 2")
        .head.getLong(0) === 200)
      // the packed rewrite re-derived the id zones (pruning survives)
      assert(SnapshotLog.filesAt(spark, dir).forall(_.stats.contains("id")))
    } finally spark.sql("DROP TABLE maint_pack")
  }

  test("OPTIMIZE TARGET n MB leaves right-sized files by reference") {
    val dir = debtTable("target", "maint_target")
    try {
      // every test file is a few KB — with a 1 MB target they are all
      // sub-half-target and pack; re-running then finds zero debt and
      // carries everything by path identity (the convergence property)
      spark.sql("OPTIMIZE maint_target TARGET 1 MB")
      val packed = SnapshotLog.filesAt(spark, dir).map(_.path).toSet
      spark.sql("OPTIMIZE maint_target TARGET 1 MB")
      assert(SnapshotLog.filesAt(spark, dir).map(_.path).toSet === packed,
        "second OPTIMIZE must be a no-op carry: no files rewritten")
    } finally spark.sql("DROP TABLE maint_target")
  }

  test("OPTIMIZE CLUSTER BY restores disjoint zones; ZORDER BY records 2-D stats") {
    val dir = tmp("layout")
    // two round-robin appends of incompressible rows (several MB total,
    // so a 1 MB target yields MULTIPLE rewritten files): every input
    // file spans the whole id range — the zone-blind layout
    for (b <- 0 until 2)
      spark.range(300000).filter(pmod(col("id"), lit(2)) === b)
        .select(col("id"), xxhash64(col("id")).as("y")).coalesce(1)
        .write.format("graft").mode(if (b == 0) "error" else "append")
        .option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE maint_layout USING graft OPTIONS (path '$dir')")
    try {
      spark.sql("OPTIMIZE maint_layout TARGET 1 MB CLUSTER BY id")
      val zones = SnapshotLog.filesAt(spark, dir).flatMap(_.stats.get("id"))
        .sortBy(_._1)
      assert(zones.size > 1 && zones.sliding(2).forall {
        case Seq((_, hi), (lo, _)) => hi < lo
        case _ => true
      }, s"clustered zones must be disjoint: $zones")
      spark.sql("OPTIMIZE maint_layout TARGET 1 MB ZORDER BY (id, y)")
      val files = SnapshotLog.filesAt(spark, dir)
      assert(files.forall(f =>
        f.stats.contains("id") && f.stats.contains("y")),
        "z-ordered files must carry zone stats on BOTH dimensions")
      assert(spark.sql("SELECT count(*) FROM maint_layout").head.getLong(0) === 300000)
    } finally spark.sql("DROP TABLE maint_layout")
  }

  test("OPTIMIZE materializes pending masks, unblocking SQL DML") {
    val dir = debtTable("mor", "maint_mor")
    import spark.implicits._
    try {
      Merge.mergeOnRead(spark, dir, Seq((10L, 777L)).toDF("id", "v"), "id")
      assert(SnapshotLog.filesAt(spark, dir).exists(_.kind === "eqdelete"))
      intercept[Exception] {
        spark.sql("UPDATE maint_mor SET v = 0 WHERE id = 11")
      }
      spark.sql("OPTIMIZE maint_mor")
      assert(!SnapshotLog.filesAt(spark, dir).exists(_.kind === "eqdelete"),
        "OPTIMIZE must retire the masks (read amplification back to zero)")
      assert(spark.sql("SELECT v FROM maint_mor WHERE id = 10").head
        .getLong(0) === 777L, "the mask's upsert survives materialization")
      spark.sql("UPDATE maint_mor SET v = 0 WHERE id = 11") // now legal
      assert(spark.sql("SELECT v FROM maint_mor WHERE id = 11").head
        .getLong(0) === 0L)
    } finally spark.sql("DROP TABLE maint_mor")
  }

  test("VACUUM expires history beyond the last 2; tagged snapshots exempt") {
    val dir = debtTable("vac", "maint_vac")
    try {
      SnapshotLog.tag(spark, dir, "keep", 1L)
      val rep = spark.sql("VACUUM maint_vac").head
      // snapshots 1..4; retainLast=2 keeps {3,4}; 1 is tagged ⇒ only 2 expires
      assert(rep.getInt(0) === 1, s"snapshots_expired: $rep")
      assert(spark.sql("SELECT count(*) FROM maint_vac VERSION AS OF 'keep'")
        .head.getLong(0) === 100, "tagged snapshot must survive VACUUM")
      intercept[Exception] {
        spark.sql("SELECT count(*) FROM maint_vac VERSION AS OF 2").collect()
      }
      assert(spark.sql("SELECT count(*) FROM maint_vac").head.getLong(0) === 400)
    } finally spark.sql("DROP TABLE maint_vac")
  }

  test("VACUUM RETAIN n HOURS: age-gated; a huge horizon expires nothing") {
    val dir = debtTable("retain", "maint_retain")
    try {
      val rep0 = spark.sql("VACUUM maint_retain RETAIN 1000000 HOURS").head
      assert(rep0.getInt(0) === 0, "nothing is older than ~114 years")
      assert(SnapshotLog.snapshots(spark, dir).size === 4)
      val rep1 = spark.sql("VACUUM maint_retain RETAIN 0 HOURS").head
      assert(rep1.getInt(0) === 3, "RETAIN 0: everything beyond current expires")
      assert(SnapshotLog.snapshots(spark, dir) === Seq(4L))
    } finally spark.sql("DROP TABLE maint_retain")
  }

  test("OPTIMIZE WHERE: scoped bin-pack packs only the predicate's files") {
    val dir = tmp("scoped")
    // 4 small files in the LOW id band + 1 in the HIGH band; zones on id
    for (b <- 0 until 4)
      spark.range(b * 100L, (b + 1) * 100L)
        .select(col("id"), (col("id") * 2).as("v")).coalesce(1)
        .write.format("graft").mode(if (b == 0) "error" else "append")
        .option("statsCols", "id").save(dir)
    spark.range(2000, 2100).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.format("graft").mode("append")
      .option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE maint_scoped USING graft OPTIONS (path '$dir')")
    try {
      val highPath = SnapshotLog.filesAt(spark, dir)
        .filter(_.stats("id")._1 >= 2000).map(_.path)
      assert(highPath.size === 1)
      // predicate misses every file: listing proves no candidates, no commit
      // — in BOTH cases (SQL is case-insensitive; manifest zone keys are
      // case-sensitive, so the scope must canonicalize, not unscope)
      val before = SnapshotLog.commits(spark, dir).size
      spark.sql("OPTIMIZE maint_scoped WHERE id > 5000")
      spark.sql("OPTIMIZE maint_scoped WHERE ID > 5000")
      assert(SnapshotLog.commits(spark, dir).size === before)
      // low-band scope: the 4 low files pack, the high file is NOT a
      // candidate and carries by path identity
      val rep = spark.sql("OPTIMIZE maint_scoped WHERE id < 1000").head
      assert(rep.getInt(1) === 5 && rep.getInt(2) === 2, s"report: $rep")
      val after = SnapshotLog.filesAt(spark, dir).map(_.path)
      assert(after.size === 2 && after.contains(highPath.head))
      assert(spark.sql("SELECT count(*), sum(v) FROM maint_scoped").head ===
        org.apache.spark.sql.Row(500L,
          ((0L until 400L) ++ (2000L until 2100L)).map(_ * 2).sum))
      // refusals: unknown column (loud, names the schema), scoped layout
      val e1 = intercept[Exception] {
        spark.sql("OPTIMIZE maint_scoped WHERE nope = 1")
      }
      assert(e1.getMessage.contains("unknown column"))
      val e2 = intercept[Exception] {
        spark.sql("OPTIMIZE maint_scoped WHERE id < 10 ZORDER BY (id, v)")
      }
      assert(e2.getMessage.contains("bin-pack only"))
    } finally spark.sql("DROP TABLE maint_scoped")
  }

  test("RESTORE TABLE: metadata-only rollback to version and tag") {
    val dir = debtTable("rst", "maint_rst")
    try {
      SnapshotLog.tag(spark, dir, "v3", 3L)
      val rep = spark.sql("RESTORE maint_rst TO VERSION AS OF 2").head
      assert(rep.getLong(0) === 2L && rep.getLong(1) === 5L)
      assert(spark.sql("SELECT count(*) FROM maint_rst").head.getLong(0) === 200)
      // history intact: the rolled-back state is still reachable, and a
      // tag-addressed RESTORE walks forward again
      spark.sql("RESTORE TABLE maint_rst VERSION AS OF 'v3'")
      assert(spark.sql("SELECT count(*) FROM maint_rst").head.getLong(0) === 300)
      val e = intercept[Exception] {
        spark.sql("RESTORE maint_rst TO VERSION AS OF")
      }
      assert(e.getMessage.contains("graft RESTORE"))
    } finally spark.sql("DROP TABLE maint_rst")
  }

  test("ALTER TABLE ADD COLUMNS: schema-carrier commit, null-filled reads, DML on the new column") {
    val dir = debtTable("alter", "maint_alter")
    try {
      spark.sql("ALTER TABLE maint_alter ADD COLUMNS (tag STRING, score DOUBLE)")
      // old rows read with the new columns null — still on the FAST path
      // (one bearing epoch; the carrier only widens)
      val r = spark.sql(
        "SELECT count(*) AS n, count(tag) AS t, count(score) AS s FROM maint_alter").head
      assert(r.getLong(0) === 400 && r.getLong(1) === 0 && r.getLong(2) === 0)
      // history records the metadata-only schema commit; time travel
      // BEFORE it shows the old schema
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.op === "schema" && c.summary("add_columns") === "tag,score" &&
        c.added.forall(_.rows == 0L) && c.removed.isEmpty)
      assert(!spark.sql("SELECT * FROM maint_alter VERSION AS OF 4")
        .columns.contains("tag"))
      // INSERT now requires (and stores) the new columns
      spark.sql("INSERT INTO maint_alter VALUES (9000, 1, 'x', 0.5)")
      assert(spark.sql("SELECT tag FROM maint_alter WHERE id = 9000")
        .head.getString(0) === "x")
      // DML touching OLD files references the new column without error
      spark.sql("UPDATE maint_alter SET tag = 'old', score = 1.0 WHERE id = 7")
      val u = spark.sql("SELECT tag, score FROM maint_alter WHERE id = 7").head
      assert(u.getString(0) === "old" && u.getDouble(1) === 1.0)
      spark.sql("DELETE FROM maint_alter WHERE tag = 'old'")
      assert(spark.sql("SELECT count(*) FROM maint_alter").head.getLong(0) === 400)
      // refusals: duplicate column; other ALTER forms stay Spark's
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE maint_alter ADD COLUMNS (id INT)")
      }
      assert(e1.getMessage.contains("already exist"))
      // RENAME COLUMN is claimed for graft tables (metadata-only field
      // registry — semantics owned by SchemaRegistrySpec); a rename
      // round-trip composes with everything above and restores identity
      spark.sql("ALTER TABLE maint_alter RENAME COLUMN id TO id2")
      assert(spark.sql("SELECT count(id2) FROM maint_alter").head.getLong(0) === 400)
      spark.sql("ALTER TABLE maint_alter RENAME COLUMN id2 TO id")
      // maintenance composes: OPTIMIZE packs carrier + droppings into a
      // widened-schema file set; the column survives
      spark.sql("OPTIMIZE maint_alter")
      assert(spark.sql("SELECT count(tag) FROM maint_alter").head.getLong(0) === 1,
        "the inserted row's tag survives the pack") // id 9000, tag 'x'
      assert(spark.sql("SELECT count(*) FROM maint_alter").head.getLong(0) === 400)
    } finally spark.sql("DROP TABLE maint_alter")
  }

  test("ALTER TABLE ALTER COLUMN TYPE: widening-only schema-carrier commit") {
    val dir = tmp("widen")
    spark.range(0, 100)
      .select(col("id"), (col("id") % 7).cast("int").as("units"))
      .coalesce(1).write.format("graft").option("statsCols", "id").save(dir)
    spark.sql(s"CREATE TABLE maint_widen USING graft OPTIONS (path '$dir')")
    try {
      // refusals: narrowing and off-lattice changes would corrupt
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE maint_widen ALTER COLUMN id TYPE int") }
      assert(e1.getMessage.contains("widening-only"))
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE maint_widen ALTER COLUMN units TYPE string") }
      assert(e2.getMessage.contains("widening-only"))
      // the widening: one metadata-only schema commit, zero data rewrites
      spark.sql("ALTER TABLE maint_widen ALTER COLUMN units TYPE bigint")
      val c = SnapshotLog.commits(spark, dir).last
      assert(c.op === "schema" && c.summary("widen_column") === "units:BIGINT" &&
        c.added.forall(_.rows == 0L) && c.removed.isEmpty)
      // reads LUB the int epoch up to the declared type
      assert(spark.sql("SELECT units FROM maint_widen").schema.head.dataType ===
        org.apache.spark.sql.types.LongType)
      // values beyond any int land and read back across the epoch
      spark.sql("INSERT INTO maint_widen VALUES (9000, 3000000007)")
      assert(spark.sql("SELECT max(units) FROM maint_widen")
        .head.getLong(0) === 3000000007L)
      // time travel BEFORE the widening shows the narrow type
      assert(spark.sql("SELECT units FROM maint_widen VERSION AS OF 1")
        .schema.head.dataType === org.apache.spark.sql.types.IntegerType)
      // DML across the widening epoch rewrites old-epoch rows wide
      spark.sql("UPDATE maint_widen SET units = units + 3000000000 WHERE id = 7")
      assert(spark.sql("SELECT units FROM maint_widen WHERE id = 7")
        .head.getLong(0) === 3000000000L)
      // OPTIMIZE materializes the widened schema; every value survives
      spark.sql("OPTIMIZE maint_widen")
      assert(spark.sql("SELECT count(*) FROM maint_widen").head.getLong(0) === 101)
      assert(spark.sql("SELECT max(units) FROM maint_widen")
        .head.getLong(0) === 3000000007L)
    } finally spark.sql("DROP TABLE maint_widen")
  }

  test("maintenance statements over another provider's catalog table delegate") {
    // a session that also hosts another lakehouse extension (Delta et al.
    // behind this parser in the delegate chain) must receive ITS tables'
    // OPTIMIZE/VACUUM/RESTORE statements — claiming them here would shadow
    // the other extension with a bogus "not a graft catalog table" error.
    // With no such extension installed, delegation surfaces as Spark's own
    // parse error — the pin is that OUR claim message never appears.
    val base = java.nio.file.Files.createTempDirectory("graft-foreign").toString
    spark.range(10).write.parquet(s"$base/p")
    spark.sql(s"CREATE TABLE maint_foreign USING parquet LOCATION '$base/p'")
    try {
      for (stmt <- Seq("OPTIMIZE maint_foreign",
                       "VACUUM maint_foreign",
                       "RESTORE maint_foreign TO VERSION AS OF 1")) {
        val e = intercept[Exception](spark.sql(stmt))
        assert(!e.getMessage.contains("graft"),
          s"'$stmt' was claimed instead of delegated: ${e.getMessage}")
      }
      // unknown names remain OURS: the informative refusal, not a
      // misleading Spark syntax error
      val e = intercept[Exception](spark.sql("OPTIMIZE maint_no_such_table"))
      assert(e.getMessage.contains("graft"))
    } finally spark.sql("DROP TABLE maint_foreign")
  }

  test("quoted-path targets; refusals; ordinary SQL passes through") {
    val dir = debtTable("path", "maint_path")
    try {
      val rep = spark.sql(s"OPTIMIZE '$dir' TARGET 1 MB").head
      assert(rep.getInt(1) === 4 && rep.getInt(2) === 1)
      // another provider's EXISTING table delegates (its own extension —
      // or, with none installed, Spark's parser — owns the statement; the
      // dedicated delegation test pins all three statements)
      spark.range(3).write.mode("overwrite").saveAsTable("maint_plain")
      try {
        val e1 = intercept[Exception] { spark.sql("OPTIMIZE maint_plain") }
        assert(!e1.getMessage.contains("graft"))
      } finally spark.sql("DROP TABLE maint_plain")
      // malformed statement: OUR grammar error, not Spark's confusing one
      val e2 = intercept[Exception] {
        spark.sql("OPTIMIZE maint_path ZORDER BY (only_one)")
      }
      assert(e2.getMessage.contains("graft OPTIMIZE"))
      val e3 = intercept[Exception] { spark.sql(s"VACUUM '${dir}_nope'") }
      assert(e3.getMessage.contains("not a graft table"))
      // the delegating parser leaves everything else to Spark
      assert(spark.sql("SELECT 1 + 1 AS two").head.getInt(0) === 2)
    } finally spark.sql("DROP TABLE maint_path")
  }
}
