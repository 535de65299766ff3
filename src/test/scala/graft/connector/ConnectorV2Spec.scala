package graft.connector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.scalatest.funsuite.AnyFunSuite

import graft.Sessions
import graft.table.{Merge, SnapshotLog}

/** DataSourceV2 catalog face ([[GraftCatalog]]): TableCatalog lifecycle
  * (SHOW TABLES / SHOW CREATE / CREATE / RENAME / DROP), reads through
  * the V1Scan bridge, manifest FILE PRUNING from pushed V2 filters, and
  * COMPLETE aggregate pushdown answered from manifests alone — the
  * engine-contract replacement for the injected GraftMetadataAggRule
  * ordering dependence. Both faces share one log: a V1 `format("graft")`
  * writer lands commits the V2 catalog reads without coordination. */
class ConnectorV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "connector-v2-spec")

  private def freshWarehouse(tag: String): String = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft-v2-$tag").toString
    spark.conf.set(s"spark.sql.catalog.gv2_$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.gv2_$tag.warehouse", wh)
    wh
  }

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id"), (col("id") * 2).as("v"))

  test("TableCatalog lifecycle: list, read, SHOW CREATE, create, rename, drop") {
    val wh = freshWarehouse("cat")
    rows(0, 100).coalesce(1).write.format("graft")
      .option("statsCols", "id").save(s"$wh/t1")
    assert(spark.sql("SHOW TABLES IN gv2_cat").collect()
      .map(_.getString(1)).toSet === Set("t1"))
    assert(spark.sql("SELECT * FROM gv2_cat.t1").count() === 100)
    assert(spark.sql("SELECT v FROM gv2_cat.t1 WHERE id = 7")
      .head.getLong(0) === 14)
    val ddl = spark.sql("SHOW CREATE TABLE gv2_cat.t1").head.getString(0)
    assert(ddl.contains("graft"), ddl)
    // CREATE through the catalog: empty, immediately readable, and the
    // V1 writer face lands commits the catalog sees (one shared log)
    spark.sql("CREATE TABLE gv2_cat.t2 (id BIGINT, v DOUBLE)")
    assert(spark.sql("SELECT count(*) FROM gv2_cat.t2").head.getLong(0) === 0)
    rows(0, 5).select(col("id"), col("v").cast("double").as("v"))
      .write.format("graft").mode("append").save(s"$wh/t2")
    assert(spark.sql("SELECT count(*) FROM gv2_cat.t2").head.getLong(0) === 5)
    intercept[Exception] { spark.sql("CREATE TABLE gv2_cat.t2 (x INT)") }
    // RENAME refuses loudly: manifests hold ABSOLUTE file paths, so a
    // directory move would strand every reference — a naive fs rename
    // left a table that listed but threw PATH_NOT_FOUND on first read
    val eRen = intercept[Exception] {
      spark.sql("ALTER TABLE gv2_cat.t2 RENAME TO t3") }
    assert(eRen.getMessage.contains("absolute data-file paths"),
      eRen.getMessage)
    assert(spark.sql("SELECT count(*) FROM gv2_cat.t2").head.getLong(0) === 5,
      "the refused rename must leave the table fully readable")
    // a path-escaping identifier must refuse before any fs operation
    val eEsc = intercept[Exception] {
      spark.sql("DROP TABLE gv2_cat.`../escape`") }
    assert(eEsc.getMessage.contains("must be 1-128 chars"), eEsc.getMessage)
    spark.sql("DROP TABLE gv2_cat.t2")
    assert(spark.sql("SHOW TABLES IN gv2_cat").collect()
      .map(_.getString(1)).toSet === Set("t1"))
  }

  test("complete aggregate pushdown: count/min/max from manifests, no data scan") {
    val wh = freshWarehouse("agg")
    rows(10, 1010).coalesce(2).write.format("graft")
      .option("statsCols", "id").save(s"$wh/t")
    val df = spark.sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi FROM gv2_agg.t")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftMetadataAggRelation"),
      s"aggregate must plan as the metadata scan, got:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"), s"no file scan:\n$plan")
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1000L, 10L, 1009L)))
    // a FILTERED aggregate must NOT push (residual filters bail) …
    val filtered = spark.sql(
      "SELECT count(*) FROM gv2_agg.t WHERE id < 500")
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggRelation"))
    assert(filtered.head.getLong(0) === 490)
    // … and a MASKED table must not either (manifest rows ≠ logical rows)
    Merge.deleteWhere(spark, s"$wh/t", col("id") < 15)
    val masked = spark.sql("SELECT count(*) AS n, max(id) AS hi FROM gv2_agg.t")
    assert(!masked.queryExecution.executedPlan.toString
      .contains("GraftMetadataAggRelation"))
    assert((masked.head.getLong(0), masked.head.getLong(1)) === ((995L, 1009L)))
  }

  test("pushed V2 filters prune files from manifest zones; results stay exact") {
    val wh = freshWarehouse("prune")
    val dir = s"$wh/t"
    // 4 range-clustered files with disjoint id zones
    for (b <- 0 until 4)
      rows(b * 1000L, (b + 1) * 1000L).coalesce(1).write.format("graft")
        .mode(if (b == 0) "error" else "append")
        .option("statsCols", "id").save(dir)
    // unit face: the builder's pruning decision is observable
    val sb = new GraftScanBuilder(spark, dir)
    sb.pushFilters(Array(
      sources.GreaterThanOrEqual("id", 2100L),
      sources.LessThan("id", 2200L)))
    sb.build() match {
      case b: GraftBridgeScan =>
        assert(b.description().contains("files=1"), b.description())
        assert(b.description().contains("pruned=3"), b.description())
      case other => fail(s"expected the bridge scan, got $other")
    }
    // SQL face: same predicate, exact rows through the bridged scan
    val df = spark.sql("SELECT count(*) FROM gv2_prune.t " +
      "WHERE id >= 2100 AND id < 2200")
    assert(df.queryExecution.executedPlan.toString
      .contains("GraftBridgeRelation"))
    assert(df.head.getLong(0) === 100)
    // masks apply through the V2 read too
    Merge.mergeOnRead(spark, dir,
      spark.range(2100, 2105).select(col("id"), lit(true).as("del")),
      "id", deleteCol = Some("del"))
    assert(spark.sql("SELECT count(*) FROM gv2_prune.t " +
      "WHERE id >= 2100 AND id < 2200").head.getLong(0) === 95)
  }

  test("V2 time travel: VERSION AS OF id and tag pin the snapshot") {
    val wh = freshWarehouse("tt")
    val dir = s"$wh/t"
    rows(0, 50).coalesce(1).write.format("graft")
      .option("statsCols", "id").save(dir)
    SnapshotLog.tag(spark, dir, "first", 1L)
    rows(50, 80).coalesce(1).write.format("graft").mode("append")
      .option("statsCols", "id").save(dir)
    assert(spark.sql("SELECT count(*) FROM gv2_tt.t").head.getLong(0) === 80)
    assert(spark.sql("SELECT count(*) FROM gv2_tt.t VERSION AS OF 1")
      .head.getLong(0) === 50)
    assert(spark.sql("SELECT count(*) FROM gv2_tt.t VERSION AS OF 'first'")
      .head.getLong(0) === 50)
    assert(spark.sql(
      "SELECT count(*) FROM gv2_tt.t TIMESTAMP AS OF '2099-01-01 00:00:00'")
      .head.getLong(0) === 80)
  }

  test("LIMIT prunes files by manifest row counts on mask-free tables") {
    val wh = freshWarehouse("limit")
    val dir = s"$wh/t"
    for (b <- 0 until 4)
      rows(b * 1000L, (b + 1) * 1000L).coalesce(1).write.format("graft")
        .mode(if (b == 0) "error" else "append")
        .option("statsCols", "id").save(dir)
    val sb = new GraftScanBuilder(spark, dir)
    assert(!sb.pushLimit(10), "partial pushdown: the engine keeps its Limit")
    sb.build() match {
      case b: GraftBridgeScan =>
        assert(b.description().contains("files=1"), b.description())
        assert(b.description().contains("pruned=3"), b.description())
      case other => fail(s"expected the bridge scan, got $other")
    }
    assert(spark.sql("SELECT * FROM gv2_limit.t LIMIT 10").count() === 10)
    assert(spark.sql("SELECT count(*) FROM (SELECT * FROM gv2_limit.t LIMIT 3500) s")
      .head.getLong(0) === 3500, "a limit spanning files keeps enough of them")
    // masked tables never limit-prune (manifest rows ≠ logical rows)
    Merge.deleteWhere(spark, dir, col("id") < 5)
    val sb2 = new GraftScanBuilder(spark, dir)
    sb2.pushLimit(10)
    sb2.build() match {
      case b: GraftBridgeScan =>
        assert(b.description().contains("pruned=0"), b.description())
      case other => fail(s"expected the bridge scan, got $other")
    }
  }

  test("CBO statistics come from manifests (exact rows on mask-free tables)") {
    val wh = freshWarehouse("stats")
    rows(0, 500).coalesce(1).write.format("graft")
      .option("statsCols", "id").save(s"$wh/t")
    val sb = new GraftScanBuilder(spark, s"$wh/t")
    sb.build() match {
      case b: GraftBridgeScan =>
        val st = b.estimateStatistics()
        assert(st.numRows().getAsLong === 500)
        assert(st.sizeInBytes().getAsLong > 0)
      case other => fail(s"expected the bridge scan, got $other")
    }
  }
}
