package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Per-table high-water-mark store: the max Kafka offset processed PER
  * PARTITION, persisted as one JSON file per table. Mirrors the
  * reference's /tmp/cdc_offsets/<table>.json protocol
  * (/root/reference/glue-jobs/kafka_to_s3_enhanced.py:43,71-80,206-215),
  * generalized to N partitions: the reference pins one partition per
  * topic (config/kafka-topics.json:5,15,24) and stores one scalar, but
  * its own `startingOffsets` JSON shape (`{topic: {"0": n}}`,
  * kafka_to_s3_enhanced.py:92-97) is per-partition — this store fills in
  * the semantics real multi-partition deployments hit first. State reads
  * as:
  *
  *  - `{"offsets": {"0": n, "1": m}, "offset": min, ...}` — the
  *    partitioned form; the scalar `offset` is still written for legacy
  *    readers of the reference's format, as the MIN over partitions: a
  *    legacy single-partition reader binds the scalar to partition 0, so
  *    writing the max would let it resume partition 0 PAST its true mark
  *    and silently skip records — the min makes a downgraded reader
  *    re-read duplicates instead, which is the at-least-once contract's
  *    safe side.
  *  - `{"offset": n, ...}` — legacy scalar state binds to partition 0,
  *    exactly the reference's single-partition meaning.
  *  - missing or corrupt → empty map / −1 ("from the beginning").
  *
  * Writes are atomic (temp file + move) so a crash mid-commit leaves the
  * previous state intact — with the write-then-commit ordering in
  * [[SyncJob]] this preserves the reference's at-least-once guarantee.
  * At scale this state is tiny (one scalar per partition per table); the
  * Structured Streaming path ([[graft.stream.StreamSync]]) replaces it
  * with the checkpoint offset log.
  */
final class OffsetStore(dir: String) {
  Files.createDirectories(Paths.get(dir))

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def pathFor(table: String): Path = Paths.get(dir, s"$table.json")

  /** Last processed offset per partition; empty if no/corrupt state
    * (read-from-beginning). Legacy scalar state binds to partition 0. */
  def lastOffsets(table: String): Map[Int, Long] = {
    val p = pathFor(table)
    if (!Files.exists(p)) Map.empty
    else
      try {
        val node = mapper.readTree(Files.readAllBytes(p))
        val multi = Option(node.get("offsets")).map { o =>
          import scala.jdk.CollectionConverters._
          o.fields().asScala.map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
        }
        multi.getOrElse {
          val scalar = Option(node.get("offset")).map(_.asLong(-1L)).getOrElse(-1L)
          if (scalar < 0) Map.empty else Map(0 -> scalar)
        }
      } catch { case _: Exception => Map.empty }
  }

  /** Last processed offset as the legacy SCALAR (max over partitions),
    * or −1 if no/corrupt state — the reference's single-partition view. */
  def lastOffset(table: String): Long = {
    val m = lastOffsets(table)
    if (m.isEmpty) -1L else m.values.max
  }

  /** Starting offsets for the next read: saved offset + 1 per partition,
    * else earliest. Partitions never seen carry no bound — the source
    * reads them from earliest (the safe default when a topic gains a
    * partition between syncs). */
  def startingOffsetsFor(table: String, topic: String): StartingOffsets = {
    val m = lastOffsets(table)
    if (m.isEmpty) StartingOffsets.Earliest
    else StartingOffsets.PerPartition(
      Map(topic -> m.map { case (p, o) => p -> (o + 1) }))
  }

  /** Starting offsets for ONE multi-topic read spanning several tables:
    * each table's saved per-partition marks land under ITS topic in the
    * same topic-keyed JSON shape the single-table form uses. Tables with
    * no saved state contribute no bound — their topics read from
    * earliest (the safe default for a table first seen mid-stream) —
    * and when NO table has state the whole read is `earliest`. */
  def startingOffsetsForAll(tableTopics: Seq[(String, String)]): StartingOffsets = {
    val bounded = tableTopics.flatMap { case (table, topic) =>
      val m = lastOffsets(table)
      if (m.isEmpty) None
      else Some(topic -> m.map { case (p, o) => p -> (o + 1) })
    }.toMap
    if (bounded.isEmpty) StartingOffsets.Earliest
    else StartingOffsets.PerPartition(bounded)
  }

  /** Commit the new high-water mark for partition 0 (the reference's
    * single-partition form — kept for parity callers). */
  def commit(table: String, offset: Long, recordsProcessed: Long): Unit =
    commitPartitioned(table, Map(0 -> offset), recordsProcessed)

  /** Commit per-partition high-water marks (called AFTER the sink
    * write). Partitions absent from `offsets` keep their previous mark —
    * an empty-on-some-partitions delta must not rewind them. */
  def commitPartitioned(table: String, offsets: Map[Int, Long],
                        recordsProcessed: Long): Unit = {
    require(offsets.nonEmpty, "commitPartitioned needs at least one partition")
    val merged = lastOffsets(table) ++ offsets
    val parts = merged.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }.mkString("{", ", ", "}")
    // legacy scalar = MIN over partitions (see class doc: a legacy reader
    // binding it to partition 0 must duplicate, never skip)
    val json =
      s"""{"offsets": $parts, "offset": ${merged.values.min}, """ +
        s""""timestamp": "${java.time.Instant.now()}", "records_processed": $recordsProcessed}"""
    val p = pathFor(table)
    val tmp = Paths.get(dir, s".$table.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
