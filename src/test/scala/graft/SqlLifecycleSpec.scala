package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One SQL-ONLY user journey across the whole connector surface — no
  * Scala table API anywhere: CTAS (with a declared `lineageKey`) →
  * INSERT → UPDATE/DELETE/MERGE → time travel → introspection TVFs →
  * OPTIMIZE → streaming change feed → RESTORE → VACUUM. Every
  * statement's effect is asserted through SQL reads, and the change
  * feed must replay the journey's row-level history from snapshot 1.
  * Guards the INTERPLAY of the faces (each is individually spec'd
  * elsewhere): CTAS commits as an append so the feed derives from the
  * start, the declared lineageKey bootstraps stamps on the first DML,
  * lineage survives OPTIMIZE's replace commits, and VACUUM's retention
  * leaves the current state intact.
  */
class SqlLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "sql-lifecycle-spec")

  test("a SQL-only user drives create→mutate→inspect→maintain→stream→restore") {
    val base = java.nio.file.Files.createTempDirectory("graft-sqllife").toString
    val dir = s"$base/t"
    spark.range(100).select(col("id"), (col("id") % 10).as("bucket"),
        (col("id") * 1.5).as("score"))
      .createOrReplaceTempView("life_src")

    // 1. CTAS (snapshot 1) — an append commit, with row lineage declared
    spark.sql(s"CREATE TABLE life USING graft " +
      s"OPTIONS (path '$dir', lineageKey 'id') " +
      "AS SELECT * FROM life_src WHERE id < 80")
    try {
      assert(spark.sql("SELECT count(*) FROM life").head.getLong(0) === 80)

      // 2. INSERT the rest (snapshot 2)
      spark.sql("INSERT INTO life SELECT * FROM life_src WHERE id >= 80")
      assert(spark.sql("SELECT count(*) FROM life").head.getLong(0) === 100)

      // 3. row-level DML (snapshots 3, 4, 5) — the declared key
      //    bootstraps lineage on the first statement
      spark.sql("UPDATE life SET score = score * 2 WHERE bucket = 3")
      spark.sql("DELETE FROM life WHERE bucket = 7")
      spark.sql(
        """SELECT id, bucket, score FROM life_src WHERE id = 4
          |UNION ALL SELECT CAST(200 AS BIGINT), CAST(0 AS BIGINT),
          |  CAST(5.0 AS DOUBLE)""".stripMargin)
        .createOrReplaceTempView("life_delta")
      spark.sql(
        """MERGE INTO life t USING life_delta s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET score = 999.0
          |WHEN NOT MATCHED THEN INSERT (id, bucket, score)
          |  VALUES (s.id, s.bucket, s.score)""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM life").head.getLong(0) === 91)
      assert(spark.sql("SELECT score FROM life WHERE id = 4").head.getDouble(0)
        === 999.0)

      // 4. time travel + TVF introspection agree about history
      assert(spark.sql("SELECT count(*) FROM life VERSION AS OF 2")
        .head.getLong(0) === 100)
      val hist = spark.sql(
        s"SELECT op, count(*) AS n FROM graft_history('$dir') GROUP BY op")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hist === Map("append" -> 2, "upsert" -> 3))
      assert(spark.sql(s"SELECT sum(rows) FROM graft_files('$dir')")
        .head.getLong(0) === 91)

      // 5. OPTIMIZE (snapshot 6): pack the DML droppings; data identical,
      //    pre-DML history still time-travels through the replace commit
      val rep = spark.sql("OPTIMIZE life").head
      assert(rep.getInt(2) <= rep.getInt(1) && rep.getLong(3) === 91,
        s"report: $rep")
      assert(spark.sql("SELECT count(*) FROM life").head.getLong(0) === 91)
      assert(spark.sql("SELECT count(*) FROM life VERSION AS OF 3")
        .head.getLong(0) === 100, "pre-DELETE snapshot survives OPTIMIZE")

      // 6. the change feed replays the whole journey from snapshot 1 —
      //    CTAS inserts included, lineage across the maintenance replace
      val feed = spark.sql(
        s"SELECT _change_op, count(*) AS n FROM graft_changes('$dir', 0) " +
          "GROUP BY _change_op").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(feed === Map("insert" -> 100, "upsert" -> 12, "delete" -> 10),
        s"feed: $feed") // 10 bucket-3 updates + MERGE's (4, 200); bucket-7 gone

      // 7. a CDF consumer started at snapshot 2 streams exactly the DML
      //    window, and equals the batch face over the same interval
      val sink = s"$base/events"; val cp = s"$base/cp"
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("startingVersion", "2")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.read.parquet(sink)
        .groupBy(col("_change_op")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = spark.sql(
        s"SELECT _change_op, count(*) AS n FROM graft_changes('$dir', 2) " +
          "GROUP BY _change_op").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch && streamed ===
        Map("upsert" -> 12L, "delete" -> 10L),
        s"stream $streamed vs batch $batch")

      // 8. RESTORE to the pre-MERGE state (snapshot 7), confirm values
      spark.sql("RESTORE life TO VERSION AS OF 4")
      assert(spark.sql("SELECT count(*) FROM life").head.getLong(0) === 90)
      assert(spark.sql("SELECT score FROM life WHERE id = 4").head.getDouble(0)
        === 6.0, "id 4 back to its pre-MERGE score")

      // 9. VACUUM with a huge horizon expires nothing; unbounded VACUUM
      //    trims history while the current (restored) state stays intact
      assert(spark.sql("VACUUM life RETAIN 1000000 HOURS").head.getInt(0) === 0)
      assert(spark.sql("VACUUM life").head.getInt(0) > 0)
      assert(spark.sql("SELECT count(*) FROM life").head.getLong(0) === 90,
        "current state untouched by retention")
      intercept[Exception] {
        spark.sql("SELECT count(*) FROM life VERSION AS OF 1").collect()
      }
    } finally spark.sql("DROP TABLE life")
  }

  test("graft_partitions: manifest listing, exactness flag, rename, refusal") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-parts-tvf").toString + "/t"
    // two single-day files + ONE file spanning both days (multi-value)
    spark.range(0, 10).withColumn("ds", lit("2026-01-01"))
      .coalesce(1).write.format("graft")
      .option("partitionCols", "ds").save(dir)
    spark.range(0, 20).withColumn("ds", lit("2026-01-02"))
      .coalesce(1).write.format("graft").mode("append")
      .option("partitionCols", "ds").save(dir)
    spark.range(0, 6).withColumn("ds",
        org.apache.spark.sql.functions.when(col("id") < 3, "2026-01-01")
          .otherwise("2026-01-02"))
      .coalesce(1).write.format("graft").mode("append")
      .option("partitionCols", "ds").save(dir)
    val rows = spark.sql(s"SELECT value, files, rows, exact " +
      s"FROM graft_partitions('$dir', 'ds') ORDER BY value").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("2026-01-01", "2026-01-02"))
    // each day: its exact file + the spanning file; rows are the UPPER
    // BOUND (the spanning file's 6 rows count under both days) and the
    // exactness flag says so
    assert(rows.map(r => (r.getInt(1), r.getLong(2), r.getBoolean(3))).toSeq
      === Seq((2, 16L), (2, 26L)).map { case (f, n) => (f, n, false) })
    // single-value-per-file layouts report exact
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-parts-tvf2").toString + "/t"
    spark.range(0, 4).withColumn("ds", lit("a")).coalesce(1)
      .write.format("graft").option("partitionCols", "ds").save(dir2)
    val r2 = spark.sql(s"SELECT rows, exact FROM graft_partitions('$dir2')")
      .head
    assert((r2.getLong(0), r2.getBoolean(1)) === ((4L, true)))
    // values follow a RENAME (logical names, the registry school)
    spark.sql(s"ALTER TABLE '$dir2' RENAME COLUMN ds TO day")
    assert(spark.sql(s"SELECT column FROM graft_partitions('$dir2', 'day')")
      .head.getString(0) === "day")
    // a column with no recorded partition values refuses loudly
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_partitions('$dir2', 'nope')").collect() }
    assert(e.getMessage.contains("records no partition values"),
      e.getMessage)
    // pending delete masks make every group an upper bound → exact=false
    graft.table.Merge.deleteWhere(spark, dir2,
      col("day") === "a" && col("id") < 2)
    val r3 = spark.sql(s"SELECT rows, exact FROM graft_partitions('$dir2')")
      .head
    assert((r3.getLong(0), r3.getBoolean(1)) === ((4L, false)),
      "masked tables must report bounds, never exact attributions")
    // a row-bearing file that recorded NO values for the column (e.g.
    // written before partitionCols named it) makes the whole column
    // non-exact — its rows could belong to any value
    val dir3 = java.nio.file.Files
      .createTempDirectory("graft-parts-tvf3").toString + "/t"
    spark.range(0, 4).withColumn("ds", lit("a")).coalesce(1)
      .write.format("graft").option("partitionCols", "ds").save(dir3)
    spark.range(0, 3).withColumn("ds", lit("b")).coalesce(1)
      .write.format("graft").mode("append").save(dir3) // value-blind file
    val r4 = spark.sql(s"SELECT value, rows, exact " +
      s"FROM graft_partitions('$dir3', 'ds')").collect()
    assert(r4.map(_.getString(0)).toSeq === Seq("a"),
      "the blind file's value is unknowable — only 'a' lists")
    assert(!r4.head.getBoolean(2),
      "a value-blind row-bearing file must flag the column non-exact")
  }
}
