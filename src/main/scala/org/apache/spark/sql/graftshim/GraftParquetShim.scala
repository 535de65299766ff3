package org.apache.spark.sql.graftshim

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, VariantExtraction}
import org.apache.spark.sql.execution.datasources.{FilePartition, NoopCache, PartitionedFile, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

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
}

/** One bucket group of a key-grouped graft scan: the partition key is
  * the bucket id row the engine groups/aligns on. */
private[graftshim] final case class GraftBucketedPartition(
    key: InternalRow,
    files: FilePartition) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = files.preferredLocations()
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
