package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** FIELD-ID column mapping for snapshot tables — the piece that makes
  * `ALTER TABLE … RENAME/DROP COLUMN` METADATA-ONLY operations (the
  * Delta column-mapping / Iceberg field-id school, both published
  * designs):
  *
  *  - every column is a FIELD with a stable numeric id, a PHYSICAL name
  *    (what parquet footers and manifest stats/bloom/partition keys are
  *    recorded under — fixed at field creation, never changed) and a
  *    LOGICAL name (what users see and SQL references — the only thing a
  *    rename touches);
  *  - the registry's full state rides the committing manifest's summary
  *    (`fields` key) and every checkpoint, so it is resolved PER
  *    SNAPSHOT by the same anchor+delta fold as the file list: time
  *    travel to a pre-rename snapshot shows the old name, and the rename
  *    history IS table metadata (successive `schema` commits);
  *  - a DROPPED field keeps its entry (tombstoned): its physical columns
  *    still exist in old files and its manifest zone/bloom entries must
  *    be IGNORED, not reinterpreted — re-adding the same logical name
  *    later creates a NEW field whose physical name is disambiguated
  *    ([[FieldRegistry.freshPhysical]]), so old values can never
  *    resurrect under the new column.
  *
  * A table acquires a registry at its first RENAME/DROP (bootstrap =
  * identity over the visible schema); until then nothing changes — reads
  * and writes never pay a translation. With a NON-identity registry,
  * reads project physical→logical ([[toLogical]]) and writes translate
  * logical→physical ([[toPhysical]], applied inside
  * [[SnapshotLog.writeData]]), so file bytes never need rewriting for a
  * rename — at 100 TB that is the whole point. A full clustering rewrite
  * (`OPTIMIZE … CLUSTER/ZORDER BY`, or plain `OPTIMIZE` on a renamed
  * table) MATERIALIZES logical names into fresh files and commits a
  * reset (identity) registry, restoring the connector fast path.
  */
final case class FieldDef(id: Int, physical: String, logical: String,
                          dropped: Boolean)

final case class FieldRegistry(fields: Seq[FieldDef], nextId: Int) {

  def live: Seq[FieldDef] = fields.filterNot(_.dropped)

  /** Identity = every live field reads/writes under its own logical name
    * and no tombstoned field exists whose physical columns could still
    * linger in live files. Identity registries impose zero translation
    * and keep the connector fast path. */
  def isIdentity: Boolean = fields.forall(f => !f.dropped && f.physical == f.logical)

  private def ci(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  private lazy val liveByPhysical: Map[String, FieldDef] =
    live.map(f => ci(f.physical) -> f).toMap
  private lazy val liveByLogical: Map[String, FieldDef] =
    live.map(f => ci(f.logical) -> f).toMap
  private lazy val droppedPhysicals: Set[String] =
    fields.filter(_.dropped).map(f => ci(f.physical)).toSet

  def physicalOf(logical: String): Option[String] =
    liveByLogical.get(ci(logical)).map(_.physical)

  def logicalOf(physical: String): Option[String] =
    liveByPhysical.get(ci(physical)).map(_.logical)

  /** Project a PHYSICAL-space frame (raw file read) to LOGICAL space:
    * live fields rename to their logical name, tombstoned fields' columns
    * drop, unregistered columns (internal markers, drift additions not
    * yet registered) pass through unchanged. */
  def toLogical(df: DataFrame): DataFrame = {
    val cols = df.columns.flatMap { c =>
      liveByPhysical.get(ci(c)) match {
        case Some(f) => Some(col(c).as(f.logical))
        case None if droppedPhysicals.contains(ci(c)) => None
        case None => Some(col(c))
      }
    }
    df.select(cols.toSeq: _*)
  }

  def toLogicalSchema(s: StructType): StructType =
    StructType(s.fields.flatMap { f =>
      liveByPhysical.get(ci(f.name)) match {
        case Some(fd) => Some(f.copy(name = fd.logical))
        case None if droppedPhysicals.contains(ci(f.name)) => None
        case None => Some(f)
      }
    })

  /** Translate a LOGICAL-space frame (user data, merge deltas, INSERT
    * rows) to PHYSICAL space for writing. Refuses the one genuinely
    * ambiguous shape: an unregistered column that collides with some
    * field's physical name (writing it would alias a different field's
    * storage). */
  def toPhysical(df: DataFrame): DataFrame = {
    val allPhysical = fields.map(f => ci(f.physical)).toSet
    val cols = df.columns.map { c =>
      liveByLogical.get(ci(c)) match {
        case Some(f) => col(c).as(f.physical)
        case None =>
          require(!allPhysical.contains(ci(c)) || liveByPhysical.get(ci(c))
              .exists(f => ci(f.logical) == ci(c)),
            s"column '$c' collides with a registered field's physical " +
              "name but is not that field's logical name — rename it or " +
              "register it before writing")
          col(c)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Translate a manifest entry's metadata keys (stats / blooms /
    * partition-value sets — recorded under PHYSICAL names) to logical:
    * tombstoned fields' entries are REMOVED (their zones describe a
    * column that no longer exists — consulting them for a re-added
    * same-named column would prune against the wrong data), unregistered
    * keys pass through. Paths/rows/seq are untouched. */
  def translateMeta(f: SnapshotLog.DataFile): SnapshotLog.DataFile = {
    def key(k: String): Option[String] =
      liveByPhysical.get(ci(k)).map(_.logical)
        .orElse(if (droppedPhysicals.contains(ci(k))) None else Some(k))
    f.copy(
      stats = f.stats.flatMap { case (k, v) => key(k).map(_ -> v) },
      blooms = f.blooms.flatMap { case (k, v) => key(k).map(_ -> v) },
      parts = f.parts.flatMap { case (k, v) => key(k).map(_ -> v) },
      nulls = f.nulls.flatMap { case (k, v) => key(k).map(_ -> v) })
  }

  /** Rename a live field's LOGICAL name — metadata only. */
  def rename(from: String, to: String): FieldRegistry = {
    val f = liveByLogical.getOrElse(ci(from), throw new IllegalArgumentException(
      s"cannot rename '$from': no such column (has: " +
        s"${live.map(_.logical).mkString(", ")})"))
    require(!liveByLogical.contains(ci(to)) || ci(to) == ci(from),
      s"cannot rename '$from' to '$to': a column '$to' already exists")
    copy(fields = fields.map(x => if (x.id == f.id) x.copy(logical = to) else x))
  }

  /** Tombstone a live field — metadata only; its physical columns stay in
    * old files but are invisible to every read and its manifest metadata
    * entries stop participating in pruning. */
  def drop(name: String): FieldRegistry = {
    val f = liveByLogical.getOrElse(ci(name), throw new IllegalArgumentException(
      s"cannot drop '$name': no such column (has: " +
        s"${live.map(_.logical).mkString(", ")})"))
    require(live.size > 1, s"cannot drop '$name': it is the last column")
    copy(fields = fields.map(x => if (x.id == f.id) x.copy(dropped = true) else x))
  }

  /** Register new fields (ALTER TABLE ADD COLUMNS on a registry table).
    * Physical names are disambiguated against every name EVER used —
    * re-adding a dropped field's name gets fresh storage, never the old
    * bytes. Returns (registry, physical names in input order). */
  def add(names: Seq[String]): (FieldRegistry, Seq[String]) = {
    var reg = this
    val phys = names.map { n =>
      require(!reg.liveByLogical.contains(ci(n)),
        s"cannot add '$n': a column with that name already exists")
      val p = reg.freshPhysical(n)
      reg = reg.copy(
        fields = reg.fields :+ FieldDef(reg.nextId, p, n, dropped = false),
        nextId = reg.nextId + 1)
      p
    }
    (reg, phys)
  }

  /** A physical name for a new field: the logical name itself unless any
    * field (live or tombstoned) ever used it physically — then
    * `<name>_fid<id>` (ids are unique forever, so so is the name). */
  private def freshPhysical(logical: String): String =
    if (fields.exists(f => ci(f.physical) == ci(logical)))
      s"${logical}_fid$nextId"
    else logical

  /** The identity registry over the SAME field ids with physical :=
    * logical and tombstones pruned — committed by the materializing
    * rewrite that physically wrote logical names into every live file. */
  def reset: FieldRegistry =
    FieldRegistry(live.map(f => f.copy(physical = f.logical)), nextId)

  def toJson: String = {
    val root: ObjectNode = FieldRegistry.mapper.createObjectNode()
    root.put("next_id", nextId)
    val arr = root.putArray("fields")
    fields.foreach { f =>
      val n = arr.addObject()
      n.put("id", f.id); n.put("p", f.physical); n.put("l", f.logical)
      if (f.dropped) n.put("d", true)
    }
    FieldRegistry.mapper.writeValueAsString(root)
  }
}

object FieldRegistry {

  private[table] val mapper = new ObjectMapper()

  /** The summary / checkpoint key the registry rides under. */
  val SummaryKey = "fields"

  def fromJson(json: String): FieldRegistry = {
    import scala.jdk.CollectionConverters._
    val node = mapper.readTree(json)
    FieldRegistry(
      node.get("fields").elements().asScala.toSeq.map { f =>
        FieldDef(f.get("id").asInt(), f.get("p").asText(), f.get("l").asText(),
          Option(f.get("d")).exists(_.asBoolean()))
      },
      node.get("next_id").asInt())
  }

  /** Identity registry over a visible schema — what the first RENAME/
    * DROP bootstraps from (physical = logical = the current names; ids
    * assigned in schema order). */
  def bootstrap(names: Seq[String]): FieldRegistry =
    FieldRegistry(
      names.zipWithIndex.map { case (n, i) =>
        FieldDef(i + 1, n, n, dropped = false) },
      names.size + 1)
}
