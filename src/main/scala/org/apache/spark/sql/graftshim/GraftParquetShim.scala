package org.apache.spark.sql.graftshim

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, VariantExtraction}
import org.apache.spark.sql.execution.datasources.{FilePartition, NoopCache, PartitionedFile, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}

/** Bridge constructing the ENGINE's own vectorized parquet [[Batch]] over
  * an explicit, manifest-pinned file list — the read machinery behind the
  * graft V2 batch scan. `ParquetScan` / `PartitioningAwareFileIndex` are
  * `private[sql]`, hence this file's package placement (the same
  * placement Delta uses for its Spark-internal bridges). Contains no
  * Spark-derived code; it only instantiates.
  *
  * Everything downstream of this call is stock Spark: FilePartition
  * packing (`maxPartitionBytes`), the vectorized columnar parquet reader,
  * row-group predicate pushdown from `pushedFilters`, nested-column
  * pruning — which is exactly the point: the graft layer decides WHICH
  * files (manifest zones/blooms/partition values, static and runtime),
  * the engine decides HOW to read them. */
object GraftParquetShim {

  /** A [[Batch]] reading `files` (path, bytes) as parquet under
    * `readDataSchema` (missing columns null-fill natively). Rebuild per
    * runtime-filter application — construction is metadata-only. */
  def parquetBatch(spark: SparkSession,
                   files: Seq[(String, Long)],
                   dataSchema: StructType,
                   readDataSchema: StructType,
                   pushedFilters: Array[Filter]): Batch = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val statuses = files.map { case (p, bytes) =>
      // the index resolves roots through fs.makeQualified — manifest
      // paths are scheme-less, so QUALIFY the keys or every lookup
      // misses (file:/x vs /x) and the scan silently reads nothing
      val raw = new Path(p)
      val qualified = raw.getFileSystem(hadoopConf).makeQualified(raw)
      new FileStatus(bytes, false, 1, 128L << 20, 0L, qualified) }
    val index = new PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {
      // allFiles() enumerates FROM rootPaths (each resolved through
      // leafFiles / leafDirToChildrenFiles), so the manifest-pinned file
      // paths ARE the roots — an empty list would list nothing
      override val rootPaths: Seq[Path] = statuses.map(_.getPath)
      override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
      override val leafFiles: mutable.LinkedHashMap[Path, FileStatus] =
        mutable.LinkedHashMap(statuses.map(s => s.getPath -> s): _*)
      override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
        statuses.groupBy(_.getPath.getParent)
          .map { case (d, fs) => d -> fs.toArray }
      override def refresh(): Unit = ()
    }
    ParquetScan(spark,
      hadoopConf,
      index,
      dataSchema = dataSchema,
      readDataSchema = readDataSchema,
      readPartitionSchema = new StructType(),
      pushedFilters = pushedFilters,
      options = CaseInsensitiveStringMap.empty(),
      pushedAggregate = None,
      partitionFilters = Nil,
      dataFilters = Nil,
      pushedVariantExtractions = Array.empty[VariantExtraction])
  }

  /** The MASKED vectorized variant — the deletion-vector read (the
    * Iceberg vectorized position-delete / Delta DV design): files with
    * pending positional masks stay ON the engine's vectorized columnar
    * parquet reader; the read schema additionally requests the engine's
    * own row-index generator column (`ParquetFileFormat.
    * ROW_INDEX_TEMPORARY_COLUMN_NAME` — populated by the vectorized
    * reader itself, page-skipping-safe, never read from the file), and a
    * per-batch SELECTION WRAPPER drops exactly the masked ordinals
    * without copying a single value ([[GraftSelectedColumnVector]]:
    * logical row → surviving physical row through an int indirection).
    * Unmasked files read through the plain packed batch with no
    * row-index column and zero wrapper overhead. Downstream stays
    * columnar either way — no InternalRow bridge, no whole-stage-codegen
    * break.
    *
    * EQUALITY masks (r15) ride the same wrapper: the folded
    * (key → max delete seq) table ships ONCE per executor inside the
    * reader factory ([[GraftEqMask]], budget-gated driver metadata);
    * an eq-affected file additionally reads its key column (appended to
    * the inner schema when the projection pruned it) and the selection
    * drops rows whose key's delete seq exceeds the FILE's commit seq —
    * exactly [[graft.table.SnapshotLog]]'s `_graft_del_seq <=
    * _graft_seq` survival rule, evaluated per batch instead of through
    * a broadcast join on the Row bridge.
    *
    * Each masked file gets its OWN input partition: the row-index
    * column resets per file, so the reader must know which file's mask
    * applies (the same one-file-per-task shape Delta's DV scan uses);
    * unmasked files keep the engine's `maxPartitionBytes` packing. */
  def maskedBatch(spark: SparkSession,
                  plain: Seq[(String, Long)],
                  masked: Seq[GraftMaskedFileSpec],
                  dataSchema: StructType,
                  readDataSchema: StructType,
                  pushedFilters: Array[Filter],
                  eqMask: Option[GraftEqMask] = None): Batch = {
    require(masked.nonEmpty, "maskedBatch with no masked files")
    val plainBatch =
      if (plain.isEmpty) None
      else Some(parquetBatch(spark, plain, dataSchema, readDataSchema,
        pushedFilters))
    // the equality key column joins the masked inner read when the
    // projection pruned it; the wrapper consumes and drops it
    val needKey = eqMask.filter(e =>
      !readDataSchema.fieldNames.exists(_.equalsIgnoreCase(e.keyCol)))
    val keyOrdinal = eqMask.map(e =>
      readDataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(e.keyCol)) match {
        case -1 => readDataSchema.length // appended just below
        case i => i
      })
    val withKey = needKey match {
      case Some(e) => StructType(readDataSchema.fields :+
        dataSchema.fields.find(_.name.equalsIgnoreCase(e.keyCol)).get
          .copy(nullable = true))
      case None => readDataSchema
    }
    // the TEMPORARY row-index column: the parquet readers recognize it
    // by name, exclude it from the file's requested schema, and
    // populate it with each row's file ordinal (page-skipping-safe)
    // nullable: the column is never IN the file — the requested parquet
    // schema must mark it optional (a required missing column refuses at
    // reader init); the generator then overwrites the null vector with
    // real ordinals before every batch is handed out
    val readWithIdx = StructType(withKey.fields :+
      org.apache.spark.sql.types.StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        org.apache.spark.sql.types.LongType, nullable = true))
    val maskedInner = parquetBatch(spark,
      masked.map(m => (m.path, m.len)),
      dataSchema, readWithIdx, pushedFilters)
    // Vectorization is decided PER SCHEMA (field count, types), and the
    // two inner factories differ by the appended row-index column — at
    // the codegen maxFields boundary one can answer columnar while the
    // other answers row-based, and the engine's DataSourceV2ScanExecBase
    // requires ONE answer for the whole scan ("Cannot mix row-based and
    // columnar partitions"). Decide ONCE here over representative
    // partitions of both shapes; on disagreement every partition takes
    // the row-based path (always available) instead of failing the query.
    val plainFactory = plainBatch.map(_.createReaderFactory())
    val maskedFactory = maskedInner.createReaderFactory()
    val uniformColumnar = {
      val maskedProbe = masked.headOption.forall { m =>
        maskedFactory.supportColumnarReads(FilePartition(0, Array(
          PartitionedFile(InternalRow.empty, SparkPath.fromPathString(m.path),
            0L, m.len, Array.empty, 0L, m.len, Map.empty))))
      }
      val plainProbe = plainBatch.forall(
        _.planInputPartitions().forall(plainFactory.get.supportColumnarReads))
      maskedProbe && plainProbe
    }
    new Batch {
      override def planInputPartitions(): Array[InputPartition] = {
        val pp = plainBatch.map(_.planInputPartitions())
          .getOrElse(Array.empty[InputPartition])
        pp ++ masked.zipWithIndex.map { case (m, i) =>
          val pf = PartitionedFile(InternalRow.empty,
            SparkPath.fromPathString(m.path), 0L, m.len, Array.empty, 0L,
            m.len, Map.empty)
          GraftMaskedPartition(m.positions, m.fileSeq, m.eqApplies,
            FilePartition(pp.length + i, Array(pf))): InputPartition
        }
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftMaskedReaderFactory(plainFactory, maskedFactory,
          readDataSchema, uniformColumnar, eqMask, keyOrdinal.getOrElse(-1),
          keyOrdinal.map(withKey(_).dataType).orNull)
    }
  }

  /** The ROW-ID vectorized variant (r15): serves scans whose projection
    * includes the scan-metadata columns (`_graft_file`/`_graft_pos` —
    * the row-id face of the delta-based row-level operations, and
    * explicit metadata-column SELECTs), keeping the read columnar
    * instead of degrading to the Row bridge. Every file gets its OWN
    * partition (the row index resets per file and the file path is a
    * per-partition CONSTANT): the inner vectorized read requests the
    * engine's row-index generator column, and the wrapper emits
    *   - `_graft_pos` as that vector (selection-filtered under a mask —
    *     surviving rows keep their ORIGINAL file ordinal, which is what
    *     a posdelete entry must name), and
    *   - `_graft_file` as a zero-copy constant string vector carrying
    *     the same qualified-URI rendering the V1 `_metadata.file_path`
    *     read emits (pinned in RowLevelSpec), so both paths' row ids
    *     are byte-identical.
    * `outputSchema` is the scan's declared output with the metadata
    * columns at their requested ordinals; data columns keep their
    * relative order. */
  def posBatch(spark: SparkSession,
               files: Seq[GraftPosFileSpec],
               dataSchema: StructType,
               outputSchema: StructType,
               fileColName: String, posColName: String,
               pushedFilters: Array[Filter],
               /** The PHYSICAL twin of `outputSchema` on registry tables
                 * (same field order, files' column names) — what the
                 * inner parquet read requests; defaults to the output. */
               physOutputSchema: StructType = null,
               /** Folded EQUALITY mask (r15): row-id reads of eq-masked
                 * tables — the vanilla-session DML source scan between
                 * upsert ingests — stay vectorized; surviving rows keep
                 * their ORIGINAL file ordinals (selection filters by
                 * position, exactly like the positional mask). */
               eqMask: Option[GraftEqMask] = None): Batch = {
    def isMeta(n: String): Boolean =
      n.equalsIgnoreCase(fileColName) || n.equalsIgnoreCase(posColName)
    val physOut = Option(physOutputSchema).getOrElse(outputSchema)
    val dataFields = physOut.fields.filterNot(f => isMeta(f.name))
    // the eq key column joins the inner read when the projection pruned
    // it (GraftEqMask.keyCol is PHYSICAL — compare in the files' space)
    val needKey = eqMask.filter(e =>
      !dataFields.exists(_.name.equalsIgnoreCase(e.keyCol)))
    val keyOrdinal = eqMask.map(e =>
      dataFields.indexWhere(_.name.equalsIgnoreCase(e.keyCol)) match {
        case -1 => dataFields.length // appended just below
        case i => i
      }).getOrElse(-1)
    val withKey = needKey match {
      case Some(e) => dataFields :+
        dataSchema.fields.find(_.name.equalsIgnoreCase(e.keyCol)).get
          .copy(nullable = true)
      case None => dataFields
    }
    val idxOrdinal = withKey.length
    val readWithIdx = StructType(withKey :+
      org.apache.spark.sql.types.StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        org.apache.spark.sql.types.LongType, nullable = true))
    // output ordinal → inner ordinal; FileCode/PosCode mark the two
    // synthesized columns
    val colMap: Array[Int] = {
      var next = 0
      outputSchema.fields.map { f =>
        if (f.name.equalsIgnoreCase(fileColName)) GraftPosReaderFactory.FileCode
        else if (f.name.equalsIgnoreCase(posColName)) GraftPosReaderFactory.PosCode
        else { val i = next; next += 1; i }
      }
    }
    val inner = parquetBatch(spark, files.map(f => (f.path, f.len)),
      dataSchema, readWithIdx, pushedFilters)
    val hadoopConf = spark.sessionState.newHadoopConf()
    new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        files.zipWithIndex.map { case (f, i) =>
          val raw = new Path(f.path)
          // the emitted _graft_file value — the same qualified Path
          // rendering ("file:/x", Path.toString) the V1 read's
          // _metadata.file_path carries for this file (pinned against
          // it in RowLevelSpec)
          val qualified = raw.getFileSystem(hadoopConf)
            .makeQualified(raw).toString
          val pf = PartitionedFile(InternalRow.empty,
            SparkPath.fromPathString(f.path), 0L, f.len, Array.empty, 0L,
            f.len, Map.empty)
          GraftPosPartition(qualified, f.positions, f.fileSeq, f.eqApplies,
            FilePartition(i, Array(pf))): InputPartition
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftPosReaderFactory(inner.createReaderFactory(),
          outputSchema, colMap, idxOrdinal, eqMask, keyOrdinal,
          if (keyOrdinal >= 0) withKey(keyOrdinal).dataType else null)
    }
  }

  /** The KEY-GROUPED variant for storage-partitioned joins: one input
    * partition per bucket group, each carrying its bucket id as the
    * [[HasPartitionKey]] row — `EnsureRequirements` then aligns two
    * same-bucketed scans WITHOUT an exchange (the Iceberg SPJ shape).
    * Within-bucket files concatenate into one task (no splitting): the
    * classic bucketed-join tradeoff of per-bucket parallelism for zero
    * shuffle. The reader factory is the stock vectorized parquet one,
    * unwrapped per partition. */
  def bucketedBatch(spark: SparkSession,
                    groups: Seq[(Int, Seq[(String, Long)])],
                    dataSchema: StructType,
                    readDataSchema: StructType,
                    pushedFilters: Array[Filter]): Batch = {
    val inner = parquetBatch(spark, groups.flatMap(_._2), dataSchema,
      readDataSchema, pushedFilters)
    new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        groups.sortBy(_._1).zipWithIndex.map { case ((bucket, fs), i) =>
          val pfiles = fs.map { case (p, len) =>
            PartitionedFile(InternalRow.empty, SparkPath.fromPathString(p),
              0L, len, Array.empty, 0L, len, Map.empty)
          }.toArray
          GraftBucketedPartition(
            new GenericInternalRow(Array[Any](bucket)),
            FilePartition(i, pfiles)): InputPartition
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftUnwrapReaderFactory(inner.createReaderFactory())
    }
  }

  /** Key-grouped + MASKED (r15): storage-partitioned joins on a
    * merge-on-read table between compactions. Masks — positional AND
    * equality — filter rows WITHIN files and can never change a row's
    * bucket membership (the bucket is a pure function of the key; an
    * eq-delete removes rows, never moves them), so key-grouped
    * reporting stays sound — each bucket keeps ONE [[HasPartitionKey]]
    * partition, whose reader concatenates its files sequentially:
    * masked files through the row-index selection read, unmasked
    * through the plain packed read. Selection preserves row order, so a
    * sorted single-file bucket stays sorted under its mask. */
  def bucketedMaskedBatch(spark: SparkSession,
                          groups: Seq[(Int, Seq[GraftMaskedFileRef])],
                          dataSchema: StructType,
                          readDataSchema: StructType,
                          pushedFilters: Array[Filter],
                          eqMask: Option[GraftEqMask] = None): Batch = {
    def needsMask(f: GraftMaskedFileRef): Boolean =
      f.positions.nonEmpty || f.eqApplies
    val plainInner = parquetBatch(spark,
      groups.flatMap(_._2).map(f => (f.path, f.len)),
      dataSchema, readDataSchema, pushedFilters)
    // the eq key joins the masked inner read when the projection pruned
    // it; the wrapper consumes and drops it (same shape as maskedBatch)
    val needKey = eqMask.filter(e =>
      !readDataSchema.fieldNames.exists(_.equalsIgnoreCase(e.keyCol)))
    val keyOrdinal = eqMask.map(e =>
      readDataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(e.keyCol)) match {
        case -1 => readDataSchema.length
        case i => i
      }).getOrElse(-1)
    val withKey = needKey match {
      case Some(e) => StructType(readDataSchema.fields :+
        dataSchema.fields.find(_.name.equalsIgnoreCase(e.keyCol)).get
          .copy(nullable = true))
      case None => readDataSchema
    }
    val idxOrdinal = withKey.length
    val readWithIdx = StructType(withKey.fields :+
      org.apache.spark.sql.types.StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        org.apache.spark.sql.types.LongType, nullable = true))
    val maskedInner = parquetBatch(spark,
      groups.flatMap(_._2).collect { case f if needsMask(f) => (f.path, f.len) },
      dataSchema, readWithIdx, pushedFilters)
    val plainFactory = plainInner.createReaderFactory()
    val maskedFactory = maskedInner.createReaderFactory()
    // one pre-agreed columnar answer for the whole scan (the engine
    // refuses mixed row/columnar partitions) — the two factories'
    // schemas differ by the appended columns, so probe both
    def probePartition(p: String, len: Long): FilePartition =
      FilePartition(0, Array(PartitionedFile(InternalRow.empty,
        SparkPath.fromPathString(p), 0L, len, Array.empty, 0L, len,
        Map.empty)))
    val uniformColumnar =
      groups.flatMap(_._2).headOption.forall(f =>
        plainFactory.supportColumnarReads(probePartition(f.path, f.len))) &&
      groups.flatMap(_._2).find(needsMask)
        .forall(f =>
          maskedFactory.supportColumnarReads(probePartition(f.path, f.len)))
    new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        groups.sortBy(_._1).zipWithIndex.map { case ((bucket, fs), i) =>
          GraftBucketedMaskedPartition(
            new GenericInternalRow(Array[Any](bucket)), i, fs)
            : InputPartition
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftBucketedMaskedReaderFactory(plainFactory, maskedFactory,
          readDataSchema, uniformColumnar, idxOrdinal, eqMask, keyOrdinal,
          if (keyOrdinal >= 0) withKey(keyOrdinal).dataType else null)
    }
  }
}

/** One bucket group of a key-grouped graft scan: the partition key is
  * the bucket id row the engine groups/aligns on. */
private[graftshim] final case class GraftBucketedPartition(
    key: InternalRow,
    files: FilePartition) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = files.preferredLocations()
}

/** One file of a key-grouped masked scan: path, length, sorted deleted
  * ordinals (empty = no positional mask), commit seq + equality-mask
  * applicability. */
final case class GraftMaskedFileRef(
    path: String, len: Long, positions: Array[Long],
    fileSeq: Long = Long.MaxValue, eqApplies: Boolean = false)

/** One bucket group of a key-grouped MASKED scan (r15): the partition
  * key is the bucket id; files read sequentially within the task,
  * masked ones through the selection read. */
private[graftshim] final case class GraftBucketedMaskedPartition(
    key: InternalRow, index: Int,
    files: Seq[GraftMaskedFileRef]) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Reader factory of [[GraftParquetShim.bucketedMaskedBatch]]: per
  * partition, a sequential concatenation of per-file readers — plain
  * files on the packed factory, masked files on the row-index factory
  * with the zero-copy selection filter. */
private[graftshim] final class GraftBucketedMaskedReaderFactory(
    plain: PartitionReaderFactory,
    maskedInner: PartitionReaderFactory,
    readDataSchema: StructType,
    uniformColumnar: Boolean,
    /** Ordinal of the row-index generator column in the masked inner
      * schema (after the appended eq key, when one rides). */
    idxOrd: Int,
    eqMask: Option[GraftEqMask] = None,
    keyOrd: Int = -1,
    /** INNER-schema type of the eq key column (null without one). */
    keyType: org.apache.spark.sql.types.DataType = null)
    extends PartitionReaderFactory {

  private def dataCols: Int = readDataSchema.length

  private def needsMask(f: GraftMaskedFileRef): Boolean =
    f.positions.nonEmpty || f.eqApplies

  private def filePartition(f: GraftMaskedFileRef): FilePartition =
    FilePartition(0, Array(PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(f.path), 0L, f.len, Array.empty, 0L, f.len,
      Map.empty)))

  override def supportColumnarReads(p: InputPartition): Boolean =
    uniformColumnar

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val g = p.asInstanceOf[GraftBucketedMaskedPartition]
    val cols = dataCols
    new PartitionReader[ColumnarBatch] {
      private val it = g.files.iterator
      private var reader: PartitionReader[ColumnarBatch] = _
      private var file: GraftMaskedFileRef = _
      private var current: ColumnarBatch = _
      override def next(): Boolean = {
        while (true) {
          if (reader == null) {
            if (!it.hasNext) return false
            file = it.next()
            reader =
              if (!needsMask(file)) plain.createColumnarReader(filePartition(file))
              else maskedInner.createColumnarReader(filePartition(file))
          }
          if (reader.next()) {
            val b = reader.get()
            current =
              if (!needsMask(file)) b
              else GraftMaskedReaderFactory.filterBatch(b, file.positions,
                cols, idxOrd, if (file.eqApplies) eqMask else None, keyOrd,
                file.fileSeq)
            return true
          }
          reader.close(); reader = null
        }
        false
      }
      override def get(): ColumnarBatch = current
      override def close(): Unit = if (reader != null) reader.close()
    }
  }

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val g = p.asInstanceOf[GraftBucketedMaskedPartition]
    val cols = dataCols
    val drop = UnsafeProjection.create(
      readDataSchema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        BoundReference(i, f.dataType, nullable = true)
      })
    new PartitionReader[InternalRow] {
      private val it = g.files.iterator
      private var reader: PartitionReader[InternalRow] = _
      private var file: GraftMaskedFileRef = _
      private var row: InternalRow = _
      private var masked = false
      override def next(): Boolean = {
        while (true) {
          if (reader == null) {
            if (!it.hasNext) return false
            file = it.next()
            masked = needsMask(file)
            reader =
              if (masked) maskedInner.createReader(filePartition(file))
              else plain.createReader(filePartition(file))
          }
          var advanced = false
          while (!advanced && reader.next()) {
            val r = reader.get()
            val posKeep = !masked || file.positions.isEmpty ||
              java.util.Arrays.binarySearch(
                file.positions, r.getLong(idxOrd)) < 0
            val eqKeep = !masked || !file.eqApplies || eqMask.forall { e =>
              r.isNullAt(keyOrd) || {
                val ds =
                  if (e.isString) e.delSeqOfStr(r.getUTF8String(keyOrd))
                  else e.delSeqOfLong(GraftMaskedReaderFactory.keyAsLong(
                    r, keyOrd, keyType))
                ds <= file.fileSeq
              }
            }
            if (posKeep && eqKeep) {
              row = r
              advanced = true
            }
          }
          if (advanced) return true
          reader.close(); reader = null
        }
        false
      }
      override def get(): InternalRow = if (masked) drop(row) else row
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}

/** One masked file handed to [[GraftParquetShim.maskedBatch]]: sorted
  * deleted row ordinals (may be empty when only the equality mask
  * applies), the file's commit seq, and whether the equality mask can
  * affect it (some key's delete seq exceeds the file's). */
final case class GraftMaskedFileSpec(
    path: String, len: Long, positions: Array[Long],
    fileSeq: Long, eqApplies: Boolean)

/** The folded EQUALITY mask (r15), shipped once per executor in the
  * reader factory: aligned (sorted key → max delete seq) arrays. A row
  * with key k in a file of commit seq s is deleted iff
  * delSeq(k) > s — the broadcast-join survival rule
  * (`_graft_del_seq <= _graft_seq` keeps), evaluated per batch.
  * Integral keys normalize to longs; string keys compare in UTF8String
  * binary order (the driver sorted them that way). Null keys never
  * match (SQL join semantics). */
final case class GraftEqMask(
    keyCol: String,
    longKeys: Array[Long],
    strKeys: Array[String],
    delSeqs: Array[Long]) {
  @transient lazy val strKeysU8: Array[org.apache.spark.unsafe.types.UTF8String] =
    strKeys.map(org.apache.spark.unsafe.types.UTF8String.fromString)
  def isString: Boolean = strKeys.nonEmpty
  /** delete seq of `k`, Long.MinValue when unmasked. */
  def delSeqOfLong(k: Long): Long = {
    val i = java.util.Arrays.binarySearch(longKeys, k)
    if (i < 0) Long.MinValue else delSeqs(i)
  }
  def delSeqOfStr(k: org.apache.spark.unsafe.types.UTF8String): Long = {
    val i = java.util.Arrays.binarySearch(
      strKeysU8.asInstanceOf[Array[AnyRef]], k.asInstanceOf[AnyRef],
      GraftEqMask.U8Order.asInstanceOf[java.util.Comparator[AnyRef]])
    if (i < 0) Long.MinValue else delSeqs(i)
  }
}

object GraftEqMask {
  val U8Order: java.util.Comparator[org.apache.spark.unsafe.types.UTF8String] =
    (a, b) => a.compareTo(b)
}

/** One MASKED data file: its sorted deleted row ordinals, commit seq +
  * equality-mask applicability, plus the single-file [[FilePartition]]
  * the stock parquet reader consumes. */
private[graftshim] final case class GraftMaskedPartition(
    positions: Array[Long],
    fileSeq: Long,
    eqApplies: Boolean,
    files: FilePartition) extends InputPartition {
  override def preferredLocations(): Array[String] = files.preferredLocations()
}

/** Routes plain partitions to the untouched packed reader and masked
  * partitions through the row-index (+ equality-key) selection filter.
  * `readDataSchema` is the OUTPUT schema; masked inner readers see up
  * to two extra trailing columns (the eq key when the projection pruned
  * it, then the row index) the wrapper consumes and drops. */
private[graftshim] final class GraftMaskedReaderFactory(
    plain: Option[PartitionReaderFactory],
    maskedInner: PartitionReaderFactory,
    readDataSchema: StructType,
    /** ONE pre-agreed answer for every partition (the engine refuses
      * mixed row/columnar scans); false routes everything row-based. */
    uniformColumnar: Boolean,
    eq: Option[GraftEqMask] = None,
    /** Ordinal of the eq key column in the masked INNER schema (-1 when
      * no equality mask rides this scan). */
    keyOrdinal: Int = -1,
    /** INNER-schema type of the eq key column (null without one) — the
      * row-based probe's access type; the OUTPUT schema may have pruned
      * the key away, so it is never looked up there. */
    keyType: org.apache.spark.sql.types.DataType = null)
    extends PartitionReaderFactory {

  private def dataCols: Int = readDataSchema.length
  /** the row-index generator column is always LAST in the inner schema */
  private def idxOrdinal: Int =
    if (eq.isDefined && keyOrdinal == dataCols) dataCols + 1 else dataCols

  override def supportColumnarReads(p: InputPartition): Boolean =
    uniformColumnar

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = p match {
    case m: GraftMaskedPartition =>
      val inner = maskedInner.createColumnarReader(m.files)
      val cols = dataCols
      val idxOrd = idxOrdinal
      val eqFor = if (m.eqApplies) eq else None
      new PartitionReader[ColumnarBatch] {
        private var current: ColumnarBatch = _
        override def next(): Boolean = {
          if (!inner.next()) return false
          current = GraftMaskedReaderFactory.filterBatch(inner.get(),
            m.positions, cols, idxOrd, eqFor, keyOrdinal, m.fileSeq)
          true
        }
        override def get(): ColumnarBatch = current
        override def close(): Unit = inner.close()
      }
    case other => plain.get.createColumnarReader(other)
  }

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case m: GraftMaskedPartition =>
      // row-based fallback (schemas the vectorized reader declines):
      // skip masked ordinals by the trailing row-index field and eq-
      // masked keys, then project the extras away so the output matches
      // readDataSchema exactly
      val inner = maskedInner.createReader(m.files)
      val cols = dataCols
      val idxOrd = idxOrdinal
      val eqFor = if (m.eqApplies) eq else None
      val drop = UnsafeProjection.create(
        readDataSchema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
          BoundReference(i, f.dataType, nullable = true)
        })
      new PartitionReader[InternalRow] {
        private var row: InternalRow = _
        override def next(): Boolean = {
          while (inner.next()) {
            val r = inner.get()
            val posKeep = m.positions.isEmpty ||
              java.util.Arrays.binarySearch(m.positions, r.getLong(idxOrd)) < 0
            val eqKeep = eqFor.forall { e =>
              r.isNullAt(keyOrdinal) || {
                val ds =
                  if (e.isString) e.delSeqOfStr(r.getUTF8String(keyOrdinal))
                  else e.delSeqOfLong(
                    GraftMaskedReaderFactory.keyAsLong(r, keyOrdinal, keyType))
                ds <= m.fileSeq
              }
            }
            if (posKeep && eqKeep) {
              row = r
              return true
            }
          }
          false
        }
        override def get(): InternalRow = drop(row)
        override def close(): Unit = inner.close()
      }
    case other => plain.get.createReader(other)
  }
}

private[graftshim] object GraftMaskedReaderFactory {

  private[graftshim] def keyAsLong(r: InternalRow, ord: Int,
                                   dt: org.apache.spark.sql.types.DataType): Long =
    dt match {
      case org.apache.spark.sql.types.LongType => r.getLong(ord)
      case org.apache.spark.sql.types.IntegerType => r.getInt(ord).toLong
      case org.apache.spark.sql.types.ShortType => r.getShort(ord).toLong
      case org.apache.spark.sql.types.ByteType => r.getByte(ord).toLong
      // temporal keys (r15): the internal representations ARE the fold's
      // long domain — dates epoch days (int), timestamps epoch micros
      case org.apache.spark.sql.types.DateType => r.getInt(ord).toLong
      case org.apache.spark.sql.types.TimestampType => r.getLong(ord)
      case other => throw new IllegalStateException(s"bad eq key type $other")
    }

  /** Internal-representation long of one key vector cell — the eq
    * probe's read side, shared by every columnar filter loop. */
  private[graftshim] def vecKeyAsLong(v: ColumnVector, i: Int): Long =
    v.dataType() match {
      case org.apache.spark.sql.types.LongType => v.getLong(i)
      case org.apache.spark.sql.types.IntegerType => v.getInt(i).toLong
      case org.apache.spark.sql.types.ShortType => v.getShort(i).toLong
      case org.apache.spark.sql.types.ByteType => v.getByte(i).toLong
      case org.apache.spark.sql.types.DateType => v.getInt(i).toLong
      case org.apache.spark.sql.types.TimestampType => v.getLong(i)
      case other => throw new IllegalStateException(s"bad eq key type $other")
    }

  /** Drop masked rows from one columnar batch: positional ordinals by
    * the row-index vector, equality-masked keys by the factory's folded
    * (key → delete seq) arrays against the FILE's commit seq. Surviving
    * ordinals become the selection map of zero-copy wrapper vectors. A
    * fully surviving batch passes the inner vectors through untouched
    * (minus the extras) — between-mask files pay nothing per value. */
  private[graftshim] def filterBatch(b: ColumnarBatch, positions: Array[Long],
                                     dataCols: Int, idxOrd: Int,
                                     eq: Option[GraftEqMask], keyOrd: Int,
                                     fileSeq: Long): ColumnarBatch = {
    val idx = if (positions.isEmpty) null else b.column(idxOrd)
    val key = eq.map(_ => b.column(keyOrd)).orNull
    val isStr = eq.exists(_.isString)
    val n = b.numRows()
    val sel = new Array[Int](n)
    var out = 0
    var i = 0
    while (i < n) {
      val posKeep = idx == null ||
        java.util.Arrays.binarySearch(positions, idx.getLong(i)) < 0
      val eqKeep = eq match {
        case None => true
        case Some(e) =>
          key.isNullAt(i) || {
            val ds =
              if (isStr) e.delSeqOfStr(key.getUTF8String(i))
              else e.delSeqOfLong(GraftMaskedReaderFactory.vecKeyAsLong(key, i))
            ds <= fileSeq
          }
      }
      if (posKeep && eqKeep) {
        sel(out) = i
        out += 1
      }
      i += 1
    }
    if (out == n)
      new ColumnarBatch(Array.tabulate[ColumnVector](dataCols)(b.column), n)
    else {
      val selTrim = java.util.Arrays.copyOf(sel, out)
      new ColumnarBatch(Array.tabulate[ColumnVector](dataCols)(c =>
        new GraftSelectedColumnVector(b.column(c), selTrim)), out)
    }
  }
}

/** A zero-copy SELECTION view of a column vector: logical row `i` reads
  * the inner vector's physical row `sel(i)`. Children (struct fields)
  * wrap recursively with the same map, so nested access and the default
  * interval/variant getters (which recurse through [[getChild]]) stay
  * correct; array/map getters remap the row BEFORE delegating, and the
  * returned views reference the inner child data directly (element
  * storage is physical and untouched by row selection). Never closes
  * the inner vector — the parquet reader owns it. */
private[graftshim] final class GraftSelectedColumnVector(
    inner: ColumnVector, sel: Array[Int])
    extends ColumnVector(inner.dataType()) {
  override def close(): Unit = ()
  override def hasNull: Boolean = inner.hasNull
  // may overcount after selection — safe direction (consumers use it
  // only to decide whether null checks are needed)
  override def numNulls(): Int = inner.numNulls()
  override def isNullAt(i: Int): Boolean = inner.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = inner.getBoolean(sel(i))
  override def getByte(i: Int): Byte = inner.getByte(sel(i))
  override def getShort(i: Int): Short = inner.getShort(sel(i))
  override def getInt(i: Int): Int = inner.getInt(sel(i))
  override def getLong(i: Int): Long = inner.getLong(sel(i))
  override def getFloat(i: Int): Float = inner.getFloat(sel(i))
  override def getDouble(i: Int): Double = inner.getDouble(sel(i))
  override def getArray(i: Int): ColumnarArray = inner.getArray(sel(i))
  override def getMap(i: Int): ColumnarMap = inner.getMap(sel(i))
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    inner.getDecimal(sel(i), precision, scale)
  override def getUTF8String(i: Int)
      : org.apache.spark.unsafe.types.UTF8String =
    inner.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(sel(i))
  override def getChild(ordinal: Int): ColumnVector =
    new GraftSelectedColumnVector(inner.getChild(ordinal), sel)
}

/** One file of a ROW-ID scan: path, length, sorted deleted ordinals
  * (empty = unmasked), the file's commit seq, and whether the equality
  * mask can affect it. */
final case class GraftPosFileSpec(
    path: String, len: Long, positions: Array[Long],
    fileSeq: Long = Long.MaxValue, eqApplies: Boolean = false)

/** One partition of a ROW-ID scan: the qualified-URI string its rows
  * carry as `_graft_file`, the sorted deleted ordinals (empty =
  * unmasked), the file's commit seq + equality-mask applicability, and
  * the single-file [[FilePartition]] the stock reader consumes. */
private[graftshim] final case class GraftPosPartition(
    fileValue: String,
    positions: Array[Long],
    fileSeq: Long,
    eqApplies: Boolean,
    files: FilePartition) extends InputPartition {
  override def preferredLocations(): Array[String] = files.preferredLocations()
}

/** Reader factory of [[GraftParquetShim.posBatch]]: the inner reader
  * sees the data columns (+ the eq key when the projection pruned it)
  * + the trailing row-index generator column; the wrapper reorders data
  * columns to their output ordinals and synthesizes the two metadata
  * columns — `_graft_file` as a constant string vector, `_graft_pos` as
  * the row-index vector itself (both selection-filtered under a mask,
  * so surviving rows keep their original file ordinals). Columnar
  * support is a per-scan constant (one schema for every partition), so
  * the engine's uniformity requirement holds structurally. */
private[graftshim] final class GraftPosReaderFactory(
    inner: PartitionReaderFactory,
    outputSchema: StructType,
    colMap: Array[Int],
    /** Ordinal of the row-index generator column in the inner schema
      * (last; after the appended eq key, when one rides). */
    idxOrd: Int,
    eq: Option[GraftEqMask] = None,
    keyOrd: Int = -1,
    /** INNER-schema type of the eq key column (null without an eq
      * mask) — the row-based probe's access type; never looked up in
      * the output schema, which may have pruned the key away. */
    keyType: org.apache.spark.sql.types.DataType = null)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case g: GraftPosPartition => inner.supportColumnarReads(g.files)
    case other => inner.supportColumnarReads(other)
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val g = p.asInstanceOf[GraftPosPartition]
    val innerR = inner.createColumnarReader(g.files)
    val fileU8 = org.apache.spark.unsafe.types.UTF8String
      .fromString(g.fileValue)
    val eqFor = if (g.eqApplies) eq else None
    val isStr = eqFor.exists(_.isString)
    new PartitionReader[ColumnarBatch] {
      private var current: ColumnarBatch = _
      override def next(): Boolean = {
        if (!innerR.next()) return false
        val b = innerR.get()
        val idx = b.column(idxOrd)
        val key = eqFor.map(_ => b.column(keyOrd)).orNull
        val n = b.numRows()
        val sel: Array[Int] =
          if (g.positions.isEmpty && eqFor.isEmpty) null
          else {
            val s = new Array[Int](n)
            var out = 0; var i = 0
            while (i < n) {
              val posKeep = g.positions.isEmpty ||
                java.util.Arrays.binarySearch(
                  g.positions, idx.getLong(i)) < 0
              val eqKeep = eqFor match {
                case None => true
                case Some(e) =>
                  key.isNullAt(i) || {
                    val ds =
                      if (isStr) e.delSeqOfStr(key.getUTF8String(i))
                      else e.delSeqOfLong(
                        GraftMaskedReaderFactory.vecKeyAsLong(key, i))
                    ds <= g.fileSeq
                  }
              }
              if (posKeep && eqKeep) { s(out) = i; out += 1 }
              i += 1
            }
            if (out == n) null else java.util.Arrays.copyOf(s, out)
          }
        val rows = if (sel == null) n else sel.length
        def view(v: ColumnVector): ColumnVector =
          if (sel == null) v else new GraftSelectedColumnVector(v, sel)
        current = new ColumnarBatch(colMap.map {
          case GraftPosReaderFactory.FileCode =>
            new GraftConstantStringVector(fileU8): ColumnVector
          case GraftPosReaderFactory.PosCode => view(idx)
          case c => view(b.column(c))
        }, rows)
        true
      }
      override def get(): ColumnarBatch = current
      override def close(): Unit = innerR.close()
    }
  }

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val g = p.asInstanceOf[GraftPosPartition]
    val innerR = inner.createReader(g.files)
    val eqFor = if (g.eqApplies) eq else None
    val proj = UnsafeProjection.create(
      outputSchema.fields.toIndexedSeq.zip(colMap).map {
        case (_, GraftPosReaderFactory.FileCode) =>
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(g.fileValue),
            org.apache.spark.sql.types.StringType)
            : org.apache.spark.sql.catalyst.expressions.Expression
        case (_, GraftPosReaderFactory.PosCode) =>
          BoundReference(idxOrd, org.apache.spark.sql.types.LongType,
            nullable = false)
        case (f, c) => BoundReference(c, f.dataType, nullable = true)
      })
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (innerR.next()) {
          val r = innerR.get()
          val posKeep = g.positions.isEmpty ||
            java.util.Arrays.binarySearch(
              g.positions, r.getLong(idxOrd)) < 0
          val eqKeep = eqFor.forall { e =>
            r.isNullAt(keyOrd) || {
              val ds =
                if (e.isString) e.delSeqOfStr(r.getUTF8String(keyOrd))
                else e.delSeqOfLong(GraftMaskedReaderFactory.keyAsLong(
                  r, keyOrd, keyType))
              ds <= g.fileSeq
            }
          }
          if (posKeep && eqKeep) {
            row = r
            return true
          }
        }
        false
      }
      override def get(): InternalRow = proj(row)
      override def close(): Unit = innerR.close()
    }
  }
}

private[graftshim] object GraftPosReaderFactory {
  final val FileCode = -1
  final val PosCode = -2
}

/** A constant non-null string column — the per-partition `_graft_file`
  * value, one shared UTF8String however many rows read it. */
private[graftshim] final class GraftConstantStringVector(
    value: org.apache.spark.unsafe.types.UTF8String)
    extends ColumnVector(org.apache.spark.sql.types.StringType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = false
  override def numNulls(): Int = 0
  override def isNullAt(i: Int): Boolean = false
  override def getBoolean(i: Int): Boolean =
    throw new UnsupportedOperationException
  override def getByte(i: Int): Byte = throw new UnsupportedOperationException
  override def getShort(i: Int): Short = throw new UnsupportedOperationException
  override def getInt(i: Int): Int = throw new UnsupportedOperationException
  override def getLong(i: Int): Long = throw new UnsupportedOperationException
  override def getFloat(i: Int): Float = throw new UnsupportedOperationException
  override def getDouble(i: Int): Double = throw new UnsupportedOperationException
  override def getArray(i: Int): ColumnarArray =
    throw new UnsupportedOperationException
  override def getMap(i: Int): ColumnarMap =
    throw new UnsupportedOperationException
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    throw new UnsupportedOperationException
  override def getUTF8String(i: Int)
      : org.apache.spark.unsafe.types.UTF8String = value
  override def getBinary(i: Int): Array[Byte] = value.getBytes
  override def getChild(ordinal: Int): ColumnVector =
    throw new UnsupportedOperationException
}

/** Unwraps [[GraftBucketedPartition]]s back to the [[FilePartition]]s
  * the stock parquet reader factory expects. */
private[graftshim] final class GraftUnwrapReaderFactory(
    inner: PartitionReaderFactory) extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case g: GraftBucketedPartition => g.files
    case other => other
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}
