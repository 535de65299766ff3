package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native typed-imperative AGGREGATES — the Catalyst capability class the
  * scalar expressions in [[expressions.scala]] don't cover. Both support
  * partial aggregation (map-side combine), which is the whole point at
  * scale: only the bounded buffer crosses the exchange, never the rows.
  */

/** Bounded-heap top-k-per-group: `topk_by(ord, value, k)` returns the `k`
  * values with the greatest `ord`, ordered descending. The buffer is a
  * size-k min-heap, so a group's partial state is ≤ k elements regardless
  * of group size — the scale-correct replacement for the window
  * `row_number() <= k` idiom, which must sort EVERY row of every
  * partition and carry them all through the exchange. Ties are broken by
  * `ord` itself (pass a struct like (price, -key) for a deterministic
  * total order). Null `ord` rows are skipped, like built-in max.
  */
case class TopKByAgg(
    ord: Expression, value: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {
  require(k > 0, "topk_by needs k > 0")

  private lazy val ordOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)
  // min-heap: head is the SMALLEST of the kept k, evicted first
  private lazy val heapOrdering: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(ordOrdering).reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    new mutable.PriorityQueue[(Any, Any)]()(heapOrdering)

  override def update(buf: mutable.PriorityQueue[(Any, Any)], input: InternalRow)
      : mutable.PriorityQueue[(Any, Any)] = {
    val o = ord.eval(input)
    if (o != null) {
      if (buf.size < k) {
        buf.enqueue((InternalRow.copyValue(o), InternalRow.copyValue(value.eval(input))))
      } else if (ordOrdering.compare(o, buf.head._1) > 0) {
        buf.dequeue()
        buf.enqueue((InternalRow.copyValue(o), InternalRow.copyValue(value.eval(input))))
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Any, Any)],
      other: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    other.foreach { e =>
      if (buf.size < k) buf.enqueue(e)
      else if (ordOrdering.compare(e._1, buf.head._1) > 0) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Any, Any)]): Any =
    new GenericArrayData(buf.toSeq.sortBy(_._1)(ordOrdering.reverse).map(_._2))

  // Serialize the ≤k (ord, value) pairs as one UnsafeRow holding an array
  // of structs — same technique as Spark's own collect aggregates.
  private lazy val pairType = new StructType()
    .add("o", ord.dataType, nullable = false).add("v", value.dataType, value.nullable)
  private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(pairType, containsNull = false)))

  override def serialize(buf: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val arr = new GenericArrayData(buf.toSeq.map { case (o, v) =>
      InternalRow(o, v): Any
    })
    serProj.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      buf.enqueue((InternalRow.copyValue(s.get(0, ord.dataType)),
        InternalRow.copyValue(s.get(1, value.dataType))))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(value.dataType, containsNull = value.nullable)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(ord, value)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByAgg =
    copy(ord = c(0), value = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk_by"
}

/** Misra–Gries heavy-hitters sketch: `heavy_hitters(item, k)` keeps at
  * most `k` (item, weight) counters. Classic stream update (Misra & Gries
  * 1982, public): a resident item increments its counter; a non-resident
  * item with free space starts at 1; otherwise EVERY counter decrements
  * (dropping zeros). Partial buffers merge per Agarwal et al. 2012
  * ("Mergeable Summaries", public): sum counters pairwise, then subtract
  * the (k+1)-th largest weight and drop non-positives — which preserves
  * the sketch's guarantee under Spark's partial aggregation exactly like
  * a single sequential pass.
  *
  * Guarantee (what the DuckDB oracle checks): every item with true
  * frequency > n/(k+1) is present among the returned candidates, and each
  * returned weight lower-bounds the true frequency within n/(k+1). Only
  * the ≤k-entry buffer crosses the exchange — the scale-correct
  * replacement for exact vocab counting when only the frequent tail
  * matters.
  *
  * Output: array of (item, weight) structs, weight-descending, item
  * ascending on ties.
  */
case class MisraGriesAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] with UnaryLike[Expression] {
  require(k > 0, "heavy_hitters needs k > 0")

  private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow)
      : mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.get(v) match {
        case Some(c) => buf.update(InternalRow.copyValue(v), c + 1)
        case None if buf.size < k => buf.update(InternalRow.copyValue(v), 1L)
        case None =>
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val sorted = buf.toSeq.sortWith { case ((ia, wa), (ib, wb)) =>
      if (wa != wb) wa > wb else itemOrdering.compare(ia, ib) < 0
    }
    new GenericArrayData(sorted.map { case (i, w) => InternalRow(i, w): Any })
  }

  private lazy val pairType = new StructType()
    .add("item", child.dataType, nullable = false).add("est", LongType, nullable = false)
  private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(pairType, containsNull = false)))

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val arr = new GenericArrayData(buf.toSeq.map { case (i, w) =>
      InternalRow(i, w): Any
    })
    serProj.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      buf.update(InternalRow.copyValue(s.get(0, child.dataType)), s.getLong(1))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  override def nullable: Boolean = false
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "heavy_hitters"
}

/** Shared hashing for the bloom build/probe pair: SplitMix64-finalized
  * double hashing (public-domain constants), `numHashes` probes into a
  * power-of-two bit space. Lives in a static object so the probe's
  * generated code can call it without a reference object.
  */
object BloomFilterOps {
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def bitIndex(key: Long, i: Int, numBits: Int): Int = {
    val h1 = mix(key + 0x9e3779b97f4a7c15L)
    val h2 = mix(key ^ 0xc2b2ae3d27d4eb4fL) | 1L // odd ⇒ full cycle over 2^n
    (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
  }
  def set(bits: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = bits.length * 64
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(key, i, numBits)
      bits(b >>> 6) |= (1L << (b & 63)); i += 1
    }
  }
  def mightContain(bytes: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length * 8
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(key, i, numBits)
      if ((bytes(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_build(key, numBits, numHashes)`: aggregates LONG keys into a
  * bloom-filter bitset (BINARY). Partial states are fixed-size bitsets
  * OR-merged across partitions — constant bytes over the exchange. Feed
  * the result to [[BloomMightContain]] as a broadcast runtime filter: no
  * false negatives, so prefilter + exact join ≡ exact join.
  */
case class BloomBuildAgg(
    child: Expression, numBits: Int, numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(numBits > 0 && (numBits & (numBits - 1)) == 0 && numBits % 64 == 0,
    "numBits must be a power of two multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(bits: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilterOps.set(bits, v.asInstanceOf[Long], numHashes)
    bits
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(bits: Array[Long]): Any = serialize(bits)

  override def serialize(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(bits)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override protected def withNewChildInternal(c: Expression): BloomBuildAgg =
    copy(child = c)
  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "bloom_build"
}

/** `bloom_might_contain(bloom, key)`: membership probe against a
  * [[BloomBuildAgg]] bitset. Sits in scan-side filters, so it generates a
  * static call inside whole-stage codegen rather than falling back to
  * interpreted eval.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression with Predicate {
  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomFilterOps.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = graft.functions.BloomFilterOps.mightContain($bloom, $key, $numHashes);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BloomMightContain = copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
