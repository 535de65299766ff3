package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.SnapshotLog

/** The INLINE writeData fast path (r15): manifest statistics computed in
  * the writing task (the real-V2-write machinery behind a plain runJob)
  * instead of the legacy write-then-re-read aggregate. The contract is
  * METADATA IDENTITY: every statistic the legacy pass produced — zones
  * in the long domains, null counts, partition-value sets, derived
  * bucket-id sets, the bloom bitset — must come out byte-identical from
  * the single-pass writer, with the whole read-back IO gone. */
class WriteInlineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local("4", "write-inline-spec")

  private def frame() = {
    import spark.implicits._
    // every tag domain at once: long, int, double (fractional +
    // negative), date, timestamp zones; a string bloom/partition key;
    // nulls sprinkled into the zone columns (null counts must match)
    spark.range(0, 1000)
      .select(
        col("id"),
        when(col("id") % 97 === 0, lit(null))
          .otherwise((col("id") % 41).cast("int")).as("i"),
        when(col("id") % 89 === 0, lit(null))
          .otherwise(col("id") * -1.75).as("d"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("id") % 30).cast("int")).as("dt"),
        timestamp_seconds(lit(1700000000L) + col("id") % 50 * 7207).as("ts"),
        concat(lit("k-"), (col("id") % 5).cast("string")).as("s"))
      .repartition(3, col("id"))
  }

  private def writeBoth(tag: String): (Seq[SnapshotLog.DataFile], Seq[SnapshotLog.DataFile]) = {
    val base = java.nio.file.Files.createTempDirectory(s"graft-wi-$tag").toString
    val df = frame()
    val inline = SnapshotLog.writeData(df, s"$base/a",
      statsCols = Seq("id", "i", "d", "dt", "ts"),
      bloomCol = Some("s"), partitionCols = Seq("s", "bucket(4,id)"))
    spark.conf.set("graft.write.inlineStats", "false")
    val legacy =
      try SnapshotLog.writeData(df, s"$base/b",
        statsCols = Seq("id", "i", "d", "dt", "ts"),
        bloomCol = Some("s"), partitionCols = Seq("s", "bucket(4,id)"))
      finally spark.conf.unset("graft.write.inlineStats")
    (inline, legacy)
  }

  private def meta(f: SnapshotLog.DataFile) =
    (f.rows, f.statsMin, f.statsMax, f.stats.toSeq.sortBy(_._1),
      f.nulls.toSeq.sortBy(_._1),
      f.parts.toSeq.sortBy(_._1).map { case (k, vs) => (k, vs.sorted) },
      f.blooms.toSeq.sortBy(_._1))

  test("inline manifest metadata is identical to the legacy read-back pass") {
    val (inline, legacy) = writeBoth("parity")
    assert(inline.size === legacy.size, "one file per partition on both paths")
    // same partitioned frame → same per-file row sets; compare the full
    // metadata as multisets (file order/paths differ)
    assert(inline.map(meta).sortBy(_.toString()) ===
      legacy.map(meta).sortBy(_.toString()))
    assert(inline.forall(_.bytes > 0))
    // the whole corpus reads back equal through both tables' entries
    val a = spark.read.parquet(inline.map(_.path): _*)
    val b = spark.read.parquet(legacy.map(_.path): _*)
    assert(a.count() === 1000 && b.count() === 1000)
    // integer checksum: double-sum reduction order may differ per plan
    assert(a.agg(sum(col("id")),
        sum((col("d") * 100).cast("long"))).head ===
      b.agg(sum(col("id")), sum((col("d") * 100).cast("long"))).head)
  }

  test("inline write runs ZERO read-back IO; the legacy path pays it") {
    val base = java.nio.file.Files.createTempDirectory("graft-wi-io").toString
    // a range-derived frame: ANY task input bytes are read-back
    def ioOf(body: => Unit): Long = {
      Thread.sleep(800) // drain earlier statements' task events
      val bytes = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(800) } finally
        spark.sparkContext.removeSparkListener(l)
      bytes.get()
    }
    val src = spark.range(0, 20000).select(col("id"), (col("id") * 3).as("v"))
    val inlineIo = ioOf {
      SnapshotLog.writeData(src, s"$base/a", statsCol = Some("id"))
    }
    assert(inlineIo === 0L,
      s"the inline write must not re-read its own output (read $inlineIo B)")
    spark.conf.set("graft.write.inlineStats", "false")
    val legacyIo =
      try ioOf {
        SnapshotLog.writeData(src, s"$base/b", statsCol = Some("id"))
      } finally spark.conf.unset("graft.write.inlineStats")
    assert(legacyIo > 0L, "the legacy path pays the stats read-back pass")
  }

  test("maxRecordsPerFile rolls inline files at the cap; stats stay exact") {
    val base = java.nio.file.Files.createTempDirectory("graft-wi-roll").toString
    val df = spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1)
    val files = SnapshotLog.writeData(df, s"$base/t", statsCol = Some("id"),
      maxRecordsPerFile = Some(300L))
    assert(files.size === 4, s"1000 rows / cap 300 = 4 files, got ${files.size}")
    assert(files.map(_.rows).sorted === Seq(100L, 300L, 300L, 300L))
    assert(files.map(_.rows).sum === 1000L)
    // zones partition the key space (a coalesced ascending write)
    val zones = files.flatMap(_.stats.get("id")).sortBy(_._1)
    assert(zones.head._1 === 0L && zones.last._2 === 999L)
    assert(spark.read.parquet(files.map(_.path): _*).count() === 1000)
  }

  test("empty frames, decimal fallback and absent columns behave like legacy") {
    val base = java.nio.file.Files.createTempDirectory("graft-wi-edge").toString
    import spark.implicits._
    // empty frame: no files, no entries — both paths
    assert(SnapshotLog.writeData(
      spark.range(0, 10).filter(col("id") < 0).toDF(),
      s"$base/e", statsCol = Some("id")) === Seq.empty)
    // DECIMAL stats column: outside the writer's tag surface — must
    // fall back to the legacy aggregate and still produce the zone
    val dec = spark.range(0, 100)
      .select(col("id"), col("id").cast("decimal(10,2)").as("m"))
    val files = SnapshotLog.writeData(dec, s"$base/d", statsCols = Seq("m"))
    assert(files.nonEmpty && files.forall(_.stats.contains("m")),
      files.map(_.stats).toString)
    assert(files.flatMap(_.stats.get("m")).map(_._1).min === 0L)
    // absent column: throws (legacy's own error), never silent
    intercept[Exception] {
      SnapshotLog.writeData(
        spark.range(0, 10).toDF(), s"$base/x", statsCol = Some("nope"))
    }
  }

  test("derived bucket-id sets match the SQL recording formula") {
    val base = java.nio.file.Files.createTempDirectory("graft-wi-bkt").toString
    // an UNARRANGED frame (one partition, mixed residues): the recorded
    // set is multi-valued and must equal the legacy bucketIdExpr values
    val df = spark.range(0, 64).select(col("id"),
      concat(lit("u"), col("id").cast("string")).as("sk")).coalesce(1)
    val inline = SnapshotLog.writeData(df, s"$base/a",
      partitionCols = Seq("bucket(4,id)", "bucket(4,sk)"))
    spark.conf.set("graft.write.inlineStats", "false")
    val legacy =
      try SnapshotLog.writeData(df, s"$base/b",
        partitionCols = Seq("bucket(4,id)", "bucket(4,sk)"))
      finally spark.conf.unset("graft.write.inlineStats")
    assert(inline.size === 1 && legacy.size === 1)
    // 64 ids spread over 4 buckets: over the cap (8)? No — at most 4
    // distinct ids per key; both record the same sorted sets
    assert(inline.head.parts === legacy.head.parts,
      s"${inline.head.parts} vs ${legacy.head.parts}")
    assert(inline.head.parts.keySet === Set("bucket(4,id)", "bucket(4,sk)"))
  }
}
