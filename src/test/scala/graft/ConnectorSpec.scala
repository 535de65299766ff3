package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{Merge, SnapshotLog}

/** The `format("graft")` data-source face: reader/writer/time-travel/
  * streaming equivalence to the Scala table API, and the plan-shape
  * guarantees — mask-free single-epoch snapshots scan as a plain
  * parquet `FileSourceScanExec` (whole-stage codegen, parquet row-group
  * pushdown) whose file set the manifest zones/blooms/partition values
  * prune, while masked or drifted snapshots fall back to the computed
  * merge-on-read plan and stay CORRECT.
  */
class ConnectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("connector-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-connspec-$tag").toString + "/t"

  /** The executed scan node (post-AQE) of a collected DataFrame, when the
    * plan went through the fast HadoopFsRelation path. */
  private def fileScanOf(df: DataFrame): Option[FileSourceScanExec] = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val effective = plan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(plan)
    effective.collectFirst { case f: FileSourceScanExec => f }
  }

  private def rows(n: Int): DataFrame =
    spark.range(n).select(col("id"),
      concat(lit("cat"), pmod(col("id"), lit(5))).as("cat"),
      (col("id") * 2).as("v"))

  test("writer + reader round-trip; appends commit as append snapshots") {
    val dir = tmp("rt")
    rows(100).filter(col("id") < 50)
      .write.format("graft").option("statsCols", "id").save(dir)
    rows(100).filter(col("id") >= 50)
      .write.format("graft").mode("append").option("statsCols", "id").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 100)
    assert(back.agg(sum("id")).head.getLong(0) === (0L until 100).sum)
    val ops = SnapshotLog.commits(spark, dir).map(_.op)
    assert(ops === Seq("append", "append"))
    // the mask-free single-epoch read IS a parquet file scan
    assert(fileScanOf(back).isDefined)
  }

  test("zone pruning: a range WHERE skips files from manifest metadata") {
    val dir = tmp("zone")
    rows(4000).repartitionByRange(8, col("id"))
      .write.format("graft").option("statsCols", "id").save(dir)
    val all = spark.read.format("graft").load(dir)
    val full = fileScanOf(all).get.metrics("numFiles").value
    assert(full === 8)
    val band = all.filter(col("id") >= 100 && col("id") <= 400)
    val scan = fileScanOf(band).get
    assert(scan.metrics("numFiles").value < full,
      "range WHERE must prune range-clustered files")
    // the same predicate also reached parquet (row-group pushdown)
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(id,100)"))
    assert(band.count() === 301)
    // literal-on-the-left comparisons prune identically
    val flipped = all.filter(lit(100) <= col("id") && lit(400) >= col("id"))
    assert(fileScanOf(flipped).get.metrics("numFiles").value ===
      scan.metrics("numFiles").value)
    assert(flipped.count() === 301)
  }

  test("bloom pruning: equality lookup skips zone-blind files; IN probes all keys") {
    val dir = tmp("bloom")
    // round-robin slices: every file spans the whole key range (zones
    // blind), the manifest bloom is what can prune
    for (s <- 0 until 4)
      rows(4000).filter(pmod(col("id"), lit(4)) === s).coalesce(1)
        .write.format("graft").mode(if (s == 0) "error" else "append")
        .option("statsCols", "id").option("bloomCol", "id").save(dir)
    val all = spark.read.format("graft").load(dir)
    val hit = all.filter(col("id") === 1234)
    val scan = fileScanOf(hit).get
    assert(scan.metrics("numFiles").value <= 2,
      "a point key lives in one slice; blooms must skip the others")
    assert(hit.count() === 1)
    // IN-set: kept when ANY key might be present, still prunes misses
    val in = all.filter(col("id").isin(1234L, 1238L)) // same residue class
    assert(fileScanOf(in).get.metrics("numFiles").value <= 2)
    assert(in.count() === 2)
  }

  test("partition-value pruning through the reader's own WHERE") {
    val dir = tmp("parts")
    spark.range(1200).select(col("id"),
        concat(lit("d"), pmod(col("id"), lit(3))).as("day"))
      .repartitionByRange(3, col("day"))
      .write.format("graft").option("partitionCols", "day").save(dir)
    val all = spark.read.format("graft").load(dir)
    assert(fileScanOf(all).get.metrics("numFiles").value === 3)
    val one = all.filter(col("day") === "d1")
    assert(fileScanOf(one).get.metrics("numFiles").value === 1)
    assert(one.count() === 400)
  }

  test("time travel options: versionAsOf, tagAsOf, timestampAsOf") {
    val dir = tmp("tt")
    rows(10).write.format("graft").save(dir)
    Thread.sleep(20) // separate the commit timestamps
    rows(30).filter(col("id") >= 10)
      .write.format("graft").mode("append").save(dir)
    SnapshotLog.tag(spark, dir, "first", 1L)
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(dir)
    assert(v1.count() === 10)
    val tagged = spark.read.format("graft").option("tagAsOf", "first").load(dir)
    assert(tagged.count() === 10)
    val ts1 = SnapshotLog.commits(spark, dir).head.tsMs
    val asOf = spark.read.format("graft")
      .option("timestampAsOf", new java.sql.Timestamp(ts1).toString).load(dir)
    assert(asOf.count() === 10)
    assert(spark.read.format("graft").load(dir).count() === 30)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "1")
        .option("tagAsOf", "first").load(dir)
    }
  }

  test("merge-on-read snapshots read correct through the fallback, fast again after materialize") {
    val dir = tmp("mor")
    rows(100).write.format("graft").option("statsCols", "id").save(dir)
    val delta = spark.range(90, 110).select(col("id"),
      lit("upd").as("cat"), (col("id") * 3).as("v"))
    Merge.mergeOnRead(spark, dir, delta, keyCol = "id")
    val back = spark.read.format("graft").load(dir)
    // masked snapshot: no parquet fast scan, but exactly the API's answer
    assert(fileScanOf(back).isEmpty)
    val api = SnapshotLog.read(spark, dir).get
    assert(back.orderBy("id").collect().toSeq ===
      api.orderBy("id").collect().toSeq)
    assert(back.count() === 110)
    assert(back.filter(col("cat") === "upd").count() === 20)
    // maintenance folds the masks: the connector flips back to the fast path
    Merge.materializeDeletes(spark, dir)
    val after = spark.read.format("graft").load(dir)
    assert(fileScanOf(after).isDefined)
    assert(after.count() === 110)
    assert(after.filter(col("cat") === "upd").count() === 20)
  }

  test("drifted schema epochs fall back and merge through the widening lattice") {
    val dir = tmp("drift")
    spark.range(10).select(col("id"), lit("a").as("cat"))
      .write.format("graft").save(dir)
    spark.range(10, 20).select(col("id"), lit("b").as("cat"),
        (col("id") * 1.5).as("score"))
      .write.format("graft").mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(fileScanOf(back).isEmpty) // two epochs: computed path
    assert(back.count() === 20)
    assert(back.filter(col("score").isNull).count() === 10)
    assert(back.schema.fieldNames.toSet === Set("id", "cat", "score"))
    // column pruning still reaches the fallback relation
    assert(back.select("cat").distinct().count() === 2)
  }

  test("overwrite replaces atomically; history keeps the pre-overwrite snapshot") {
    val dir = tmp("ow")
    rows(40).write.format("graft").save(dir)
    rows(100).filter(col("id") >= 90)
      .write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() === 10)
    assert(spark.read.format("graft").option("versionAsOf", "1").load(dir)
      .count() === 40)
    // an overwrite is a whole-table upsert: the change feed refuses to
    // narrate it without row lineage rather than mislabeling rows
    intercept[IllegalArgumentException] {
      SnapshotLog.changes(spark, dir, from = 0L)
    }
  }

  test("SQL DDL face: CREATE TABLE … USING graft") {
    val dir = tmp("ddl")
    rows(25).write.format("graft").save(dir)
    spark.sql(s"CREATE TABLE conn_ddl USING graft OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM conn_ddl").head.getLong(0) === 25)
      assert(spark.sql("SELECT sum(v) AS s FROM conn_ddl WHERE id < 5")
        .head.getLong(0) === 20)
    } finally spark.sql("DROP TABLE conn_ddl")
  }

  test("streaming source: first batch = table, later batches = new appends only") {
    val base = java.nio.file.Files.createTempDirectory("graft-connspec-stream").toString
    val dir = s"$base/t_parquet"
    rows(50).write.format("graft").option("statsCols", "id").save(dir)
    val cp = tmp("streamcp")
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName("conn_stream")
      .option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      assert(spark.table("conn_stream").count() === 50)
      rows(80).filter(col("id") >= 50)
        .write.format("graft").mode("append").save(dir)
      // a compaction between stream reads must be invisible
      graft.cdc.Compaction.compactSnapshotted(spark, base, "t",
        targetBytes = Long.MaxValue)
      q.processAllAvailable()
      val got = spark.table("conn_stream")
      assert(got.count() === 80, "second drain must add ONLY the new rows")
      assert(got.select("id").distinct().count() === 80)
    } finally q.stop()
  }

  test("streaming source: data-changing commits throw; skipChangeCommits streams past") {
    val dir = tmp("streamch")
    rows(30).write.format("graft").save(dir)
    Merge.mergeOnRead(spark, dir,
      spark.range(5).select(col("id"), lit("u").as("cat"), col("id").as("v")),
      keyCol = "id")
    val cp1 = tmp("streamchcp1")
    val q1 = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName("conn_stream_ch")
      .option("checkpointLocation", cp1).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    q1.stop()
    assert(err.getMessage.contains("rowdelta") ||
      Option(err.getCause).exists(_.getMessage.contains("rowdelta")))
    val cp2 = tmp("streamchcp2")
    val q2 = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(dir)
      .writeStream.format("memory").queryName("conn_stream_skip")
      .option("checkpointLocation", cp2).start()
    try {
      q2.processAllAvailable()
      // appends only: the rowdelta commit's files are skipped
      assert(spark.table("conn_stream_skip").count() === 30)
    } finally q2.stop()
  }
}
