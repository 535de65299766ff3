package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's `bucket` function — what the engine resolves the
  * `bucket(n, col)` transform of [[GraftV2BatchScan.outputPartitioning]]
  * against (`V2ExpressionUtils` loads it from the scan relation's
  * [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]). Two
  * scans whose bound functions share a `canonicalName` report COMPATIBLE
  * key-grouped partitionings, which is what lets `EnsureRequirements`
  * zip them without an exchange (the Iceberg SPJ function-catalog
  * design).
  *
  * The bucket of an integral value is
  * `floorMod(murmur3(floorMod(v, n)), n)` — the residue hashed with
  * Spark's own Murmur3 (seed 42), i.e. EXACTLY the shuffle-partition id
  * `SnapshotLog.bucketArrange`'s hash-repartition assigns. That identity
  * is what makes the per-file manifest recording a singleton BY
  * CONSTRUCTION (no range-sampling fragility under skew); the plain
  * residue was rejected for exactly that reason. The write-side twin is
  * [[graft.table.SnapshotLog.bucketIdExpr]]; the alignment contract
  * across scans is the canonical name. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col) - hashed-residue bucket id of an integral or string column"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"graft bucket(n, col) takes 2 arguments, got ${inputType.length}")
    val colType = inputType.fields(1).dataType
    require(colType.isInstanceOf[ByteType] || colType.isInstanceOf[ShortType] ||
      colType.isInstanceOf[IntegerType] || colType.isInstanceOf[LongType] ||
      colType.isInstanceOf[StringType],
      s"graft bucket(n, col): col must be integral or string, got $colType")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val residue: Long = colType match {
          case _: StringType =>
            // string residue = pmod(xxhash64(col), n), the SQL twin of
            // SnapshotLog.hashStringKey; xxhash64 of a NULL is its seed
            // (42), so a null string key holds residue pmod(42, n)
            val h =
              if (input.isNullAt(1)) 42L
              else {
                val u = input.getUTF8String(1)
                org.apache.spark.sql.catalyst.expressions.XXH64
                  .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
                    u.numBytes, 42L)
              }
            Math.floorMod(h, n.toLong)
          case _ =>
            // NULL integral keys mirror the writer exactly: the residue
            // pmod(cast(col AS long), n) is null, and Spark's hash(null)
            // contributes nothing — the hash stays at its seed (42) —
            // so the writer places null rows in pmod(42, n). The
            // engine-evaluated placement must agree or v2 bucketed-
            // shuffle planning would route null rows to a different
            // partition than storage.
            if (input.isNullAt(1)) return Math.floorMod(42, n)
            val v = colType match {
              case _: ByteType => input.getByte(1).toLong
              case _: ShortType => input.getShort(1).toLong
              case _: IntegerType => input.getInt(1).toLong
              case _ => input.getLong(1)
            }
            Math.floorMod(v, n.toLong)
        }
        // Spark's hash(longResidue) = Murmur3 hashLong with seed 42 —
        // byte-identical to both the writer's partitioner and the
        // manifest recording expression
        Math.floorMod(
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(residue, 42),
          n)
      }
    }
  }
}
