package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{SnapshotLog, SyncEpoch}

/** Cross-table atomic publish ("sync epoch"): one marker pins every
  * table of a fan-out to one snapshot, so epoch readers always join a
  * consistent multi-table state. Pins the torn-state counterexample the
  * non-epoch path exhibits, the crash-window safety (commits without a
  * marker stay invisible to epoch readers), and the pipeline's --epoch
  * end-to-end flow over the CDC fixtures.
  */
class SyncEpochSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "sync-epoch-spec")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-epoch-$tag").toString

  private def orders(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n).map(i => (i.toLong, s"s${i % 3}")).toDF("okey", "status")
  }
  private def items(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n).flatMap(i => Seq((i.toLong, i * 2L), (i.toLong, i * 3L)))
      .toDF("okey", "qty")
  }

  test("epoch readers join a consistent pair; latest readers see the torn state") {
    val wh = tmp("torn")
    orders(50).write.format("graft").save(s"$wh/orders_parquet")
    items(50).write.format("graft").save(s"$wh/items_parquet")
    val e1 = SyncEpoch.publish(spark, wh, Map("orders" -> 1L, "items" -> 1L))
    assert(e1 === 1L)
    // a fan-out crashes mid-publish: orders' sync committed, items' never
    // landed, NO marker written — the torn window
    orders(50, from = 50).write.format("graft").mode("append")
      .save(s"$wh/orders_parquet")
    // PLAIN latest reads tear: 50 orders have no items
    val latestJoin = SnapshotLog.read(spark, s"$wh/orders_parquet").get
      .join(SnapshotLog.read(spark, s"$wh/items_parquet").get, Seq("okey"), "left")
    assert(latestJoin.filter(col("qty").isNull).count() === 50,
      "the non-epoch path must exhibit the torn join (the counterexample)")
    // EPOCH reads do not: the marker still pins (1, 1)
    val epochJoin = SyncEpoch.readAt(spark, wh, "orders").get
      .join(SyncEpoch.readAt(spark, wh, "items").get, Seq("okey"), "left")
    assert(epochJoin.filter(col("qty").isNull).count() === 0,
      "epoch readers must never see a torn multi-table state")
    assert(epochJoin.count() === 100) // 50 orders x 2 items
    // the next successful fan-out covers the orphaned commit: items
    // catches up, a new marker pins (2, 2)
    items(50, from = 50).write.format("graft").mode("append")
      .save(s"$wh/items_parquet")
    val e2 = SyncEpoch.publish(spark, wh, Map("orders" -> 2L, "items" -> 2L))
    assert(e2 === 2L)
    val caught = SyncEpoch.readAt(spark, wh, "orders").get
      .join(SyncEpoch.readAt(spark, wh, "items").get, Seq("okey"), "left")
    assert(caught.count() === 200 && caught.filter(col("qty").isNull).count() === 0)
    // older epochs stay readable (time travel composes)
    assert(SyncEpoch.readAt(spark, wh, "orders", Some(1L)).get.count() === 50)
    // the graft_epochs TVF narrates the markers
    val tvf = spark.sql(s"SELECT * FROM graft_epochs('$wh')").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(tvf === Set((1L, "orders", 1L), (1L, "items", 1L),
      (2L, "orders", 2L), (2L, "items", 2L)))
    // unknown table / epoch fail loudly
    assert(intercept[IllegalArgumentException] {
      SyncEpoch.readAt(spark, wh, "nope") }.getMessage.contains("does not pin"))
    assert(intercept[IllegalArgumentException] {
      SyncEpoch.pins(spark, wh, Some(99L)) }.getMessage.contains("does not exist"))
  }

  test("pipeline --epoch: staged fan-out publishes one marker; re-run pins unchanged state") {
    val wh = tmp("pipe") + "/warehouse"
    val off = tmp("pipe-off")
    val report = graft.cdc.PipelineRunner.run(spark,
      graft.cdc.CdcQueries.FixtureDir, wh, off,
      snapshotted = true, epoch = true)
    assert(report.allConsistent)
    val e1 = SyncEpoch.currentEpoch(spark, wh)
    assert(e1.contains(1L))
    val pins = SyncEpoch.pins(spark, wh)
    assert(pins.keySet === Set("orders", "customers", "products", "order_items"))
    // every pinned snapshot is the table's current one, and the epoch
    // join over the pinned pair matches the direct read
    pins.foreach { case (t, pin) =>
      assert(SnapshotLog.currentSnapshotId(spark, s"$wh/${pin.dir}")
        .contains(pin.snapshot), s"$t pin must be current after the run")
    }
    val n1 = SyncEpoch.readAt(spark, wh, "orders").get.count()
    assert(n1 > 0)
    // idempotent re-run: empty deltas everywhere — the new epoch pins the
    // SAME snapshots (no spurious commits), count unchanged
    val report2 = graft.cdc.PipelineRunner.run(spark,
      graft.cdc.CdcQueries.FixtureDir, wh, off,
      snapshotted = true, epoch = true)
    assert(report2.allConsistent)
    assert(SyncEpoch.currentEpoch(spark, wh).contains(2L))
    assert(SyncEpoch.pins(spark, wh) === pins,
      "an all-empty fan-out must pin the unchanged snapshots")
    assert(SyncEpoch.readAt(spark, wh, "orders").get.count() === n1)
  }

  test("epoch pins never regress: a stale publish carries the newer prior pin forward") {
    val wh = tmp("mono")
    orders(10).write.format("graft").save(s"$wh/orders_parquet")
    orders(10, from = 10).write.format("graft").mode("append")
      .save(s"$wh/orders_parquet") // snapshot 2
    assert(SyncEpoch.publish(spark, wh, Map("orders" -> 2L)) === 1L)
    // a SLOWER concurrent fan-out resolved its pins before the first one
    // published, then publishes second: its stale pin must not make
    // "current epoch" readers regress to snapshot 1
    val e2 = SyncEpoch.publish(spark, wh, Map("orders" -> 1L))
    assert(e2 === 2L)
    assert(SyncEpoch.pins(spark, wh, Some(e2))("orders").snapshot === 2L,
      "epoch N+1 must never pin a table OLDER than epoch N did")
    assert(SyncEpoch.readAt(spark, wh, "orders").get.count() === 20)
  }

  test("a stray non-numeric file in _graft_epochs never breaks readers") {
    val wh = tmp("stray")
    orders(10).write.format("graft").save(s"$wh/orders_parquet")
    SyncEpoch.publish(spark, wh, Map("orders" -> 1L))
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (junk <- Seq("notes.json", "backup-2.json")) {
      val out = fs.create(
        new org.apache.hadoop.fs.Path(s"$wh/_graft_epochs/$junk"), false)
      out.write("not an epoch marker".getBytes("UTF-8")); out.close()
    }
    assert(SyncEpoch.currentEpoch(spark, wh) === Some(1L))
    assert(SyncEpoch.readAt(spark, wh, "orders").get.count() === 10)
    // and publishing on top of the junk still works
    assert(SyncEpoch.publish(spark, wh, Map("orders" -> 1L)) === 2L)
  }
}
