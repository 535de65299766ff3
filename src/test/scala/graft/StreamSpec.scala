package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.CdcQueries
import graft.schema.Tables
import graft.stream.StreamSync

/** Structured Streaming path: checkpointed CDC sync (AvailableNow) and
  * watermarked windowed aggregation, pinned against their batch
  * equivalents (the streaming/batch unification Spark guarantees).
  */
class StreamSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "stream-spec")
  val sf = "/root/testdata/sf0.001"

  test("streaming CDC sync: first drain writes all rows, re-run drains nothing new") {
    val base = Files.createTempDirectory("graft-stream").toString
    val topicDir = Files.createDirectories(Paths.get(s"$base/topic")).toString
    Files.copy(
      Paths.get(s"${CdcQueries.FixtureDir}/dbserver1.ecommerce.orders.jsonl"),
      Paths.get(s"$topicDir/batch-0.jsonl"))
    StreamSync.syncOnce(spark, topicDir, "orders",
      s"$base/warehouse", s"$base/checkpoints")
    val afterFirst = spark.read.parquet(s"$base/warehouse/orders_parquet").count()
    assert(afterFirst == 10)
    // second invocation: checkpoint says everything is processed → no dupes
    // (this is the exactly-once upgrade over the reference's offset file)
    StreamSync.syncOnce(spark, topicDir, "orders",
      s"$base/warehouse", s"$base/checkpoints")
    val afterSecond = spark.read.parquet(s"$base/warehouse/orders_parquet").count()
    assert(afterSecond == 10)
  }

  test("streaming windowed agg equals the batch tumbling query") {
    val base = Files.createTempDirectory("graft-stream-win").toString
    // stage events as parquet dir for the file stream
    val events = Tables.events(spark, sf)
    events.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream
      .schema(events.schema)
      .parquet(s"$base/in")
    val q = StreamSync.windowedCounts(stream)
      .writeStream
      .format("memory")
      .queryName("win_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("win_out")
      .select(col("hour_start"), col("event_type"), col("n"))
      .orderBy(col("hour_start"), col("event_type"))
      .collect()
    val expected = graft.ops.Events.tumbling(spark, sf)
      .select(col("hour_start"), col("event_type"), col("n"))
      .orderBy(col("hour_start"), col("event_type"))
      .collect()
    // append-mode emits only windows closed by the watermark; every emitted
    // window must match its batch counterpart
    val expMap = expected.map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(expMap((r.get(0), r.get(1))) == r.getLong(2))
    }
  }

  test("streaming dedup drops replayed event_ids") {
    val base = Files.createTempDirectory("graft-stream-dedup").toString
    val events = Tables.events(spark, sf).limit(100)
    // write the same batch twice → duplicates in the input
    events.write.mode("overwrite").parquet(s"$base/in")
    events.write.mode("append").parquet(s"$base/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$base/in")
    val q = StreamSync.dedupedEvents(stream)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table("dedup_out").count()
    assert(n == 100, s"expected 100 deduped events, got $n")
  }
}
