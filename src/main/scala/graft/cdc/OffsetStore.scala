package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Per-table high-water-mark store: the max Kafka offset processed,
  * persisted as one JSON file per table. Mirrors the reference's
  * /tmp/cdc_offsets/<table>.json protocol
  * (/root/reference/glue-jobs/kafka_to_s3_enhanced.py:43,71-80,206-215):
  * missing or corrupt state reads as −1 ("from the beginning"); a commit
  * records {offset, timestamp, records_processed}.
  *
  * Writes are atomic (temp file + move) so a crash mid-commit leaves the
  * previous state intact — with the write-then-commit ordering in
  * [[SyncJob]] this preserves the reference's at-least-once guarantee.
  * At scale this state is tiny (one scalar per table); the Structured
  * Streaming path ([[graft.stream.StreamSync]]) replaces it with the
  * checkpoint offset log.
  */
final class OffsetStore(dir: String) {
  Files.createDirectories(Paths.get(dir))

  private def pathFor(table: String): Path = Paths.get(dir, s"$table.json")

  /** Last processed offset, or −1 if no/corrupt state (read-from-beginning). */
  def lastOffset(table: String): Long = {
    val p = pathFor(table)
    if (!Files.exists(p)) -1L
    else
      try {
        val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        """"offset"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(-1L)
      } catch { case _: Exception => -1L }
  }

  /** Starting offsets for the next read: saved offset + 1, else earliest. */
  def startingOffsetsFor(table: String, topic: String, partition: Int = 0): StartingOffsets = {
    val last = lastOffset(table)
    if (last < 0) StartingOffsets.Earliest
    else StartingOffsets.PerPartition(Map(topic -> Map(partition -> (last + 1))))
  }

  /** Commit the new high-water mark (called AFTER the sink write). */
  def commit(table: String, offset: Long, recordsProcessed: Long): Unit = {
    val json =
      s"""{"offset": $offset, "timestamp": "${java.time.Instant.now()}", "records_processed": $recordsProcessed}"""
    val p = pathFor(table)
    val tmp = Paths.get(dir, s".$table.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
