package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
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

/** Mergeable quantile-sketch state: a compactor hierarchy in the
  * MRL/KLL family (Manku–Rajagopalan–Lindsay, SIGMOD 1998; Karnin–Lang–
  * Liberty, FOCS 2016 — both public). Level i holds ≤ 2k values, each
  * representing weight 2^i; a full level sorts itself and promotes every
  * second value (alternating start offset, so successive compactions'
  * rank errors cancel instead of accumulate) to level i+1. Retained
  * state is O(k·log(n/k)) values regardless of n — the property that
  * lets one sketch per epoch/partition be PERSISTED and later unioned
  * without re-touching rows, which Spark's built-in approx_percentile
  * (an in-query GK buffer) cannot do and its DataSketches surface only
  * covers for distinct-count (HLL), not quantiles.
  *
  * Guarantee (what the rank-invariant oracle checks): a quantile answer
  * at q has normalized rank error ≤ number-of-levels / (2k) in the
  * worst case — ≈ 2% at k=256, n=10^6 — bounded at 5% in the
  * registered query.
  */
/** Growable PRIMITIVE double buffer — the sketch's level storage.
  * `ArrayBuffer[Double]` boxes every element (one allocation per
  * update() on the aggregation hot path); this keeps the identical
  * insertion-order semantics on a raw Array[Double]. */
final class DoubleBuf(initial: Int = 16) {
  var arr: Array[Double] = new Array[Double](initial)
  var size: Int = 0
  def add(v: Double): Unit = {
    if (size == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(size) = v; size += 1
  }
  def apply(i: Int): Double = arr(i)
  def clear(): Unit = size = 0
  def sortInPlace(): Unit = java.util.Arrays.sort(arr, 0, size)
  def addAll(o: DoubleBuf): Unit = {
    if (size + o.size > arr.length)
      arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, size + o.size))
    System.arraycopy(o.arr, 0, arr, size, o.size); size += o.size
  }
}

final class QuantileSketch(val k: Int) {
  import scala.collection.mutable.ArrayBuffer
  val levels: ArrayBuffer[DoubleBuf] = ArrayBuffer(new DoubleBuf)
  var n: Long = 0L
  var flips: Long = 0L // alternating compaction-offset counter

  def update(v: Double): Unit = {
    levels(0).add(v); n += 1
    if (levels(0).size >= 2 * k) compact(0)
  }

  private def compact(level: Int): Unit = {
    val buf = levels(level)
    buf.sortInPlace()
    if (levels.size == level + 1) levels += new DoubleBuf
    val next = levels(level + 1)
    var i = (flips & 1L).toInt
    flips += 1
    while (i < buf.size) { next.add(buf(i)); i += 2 }
    buf.clear()
    if (next.size >= 2 * k) compact(level + 1)
  }

  def mergeIn(o: QuantileSketch): Unit = {
    n += o.n; flips += o.flips
    while (levels.size < o.levels.size) levels += new DoubleBuf
    var i = 0
    while (i < o.levels.size) {
      levels(i).addAll(o.levels(i))
      if (levels(i).size >= 2 * k) compact(i)
      i += 1
    }
  }

  /** Value whose weighted rank first reaches q·(total weight). */
  def quantile(q: Double): Double = {
    var total0 = 0
    var lv = 0
    while (lv < levels.size) { total0 += levels(lv).size; lv += 1 }
    if (total0 == 0) return Double.NaN
    val vals = new Array[Double](total0)
    val wts = new Array[Long](total0)
    var j = 0
    lv = 0
    while (lv < levels.size) {
      val w = 1L << lv
      val l = levels(lv)
      var i = 0
      while (i < l.size) { vals(j) = l(i); wts(j) = w; j += 1; i += 1 }
      lv += 1
    }
    // stable index sort by value (ties keep level order, exactly like
    // the previous boxed sortBy; a rank query landing in a tie run
    // returns the tied value either way)
    val order = (0 until total0).toArray.sortBy(vals(_))
    var cum = 0L
    var total = 0L
    var i = 0
    while (i < total0) { total += wts(i); i += 1 }
    val target = q * total
    i = 0
    while (i < total0) {
      cum += wts(order(i))
      if (cum >= target) return vals(order(i))
      i += 1
    }
    vals(order(total0 - 1))
  }

  def serialized: Array[Byte] = {
    var total = 0
    levels.foreach(total += _.size)
    val bb = java.nio.ByteBuffer
      .allocate(4 + 8 + 8 + 4 + levels.size * 4 + total * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(k).putLong(n).putLong(flips).putInt(levels.size)
    levels.foreach { l =>
      bb.putInt(l.size)
      var i = 0
      while (i < l.size) { bb.putDouble(l(i)); i += 1 }
    }
    bb.array()
  }
}

object QuantileSketch {
  /** Static entry point for [[QuantileValue]]'s generated code. */
  def quantileOf(bytes: Array[Byte], q: Double): Double =
    deserialize(bytes).quantile(q)

  def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sk = new QuantileSketch(bb.getInt)
    sk.n = bb.getLong; sk.flips = bb.getLong
    val numLevels = bb.getInt
    var i = 0
    while (i < numLevels) {
      if (sk.levels.size == i) sk.levels += new DoubleBuf
      val sz = bb.getInt
      var j = 0
      while (j < sz) { sk.levels(i).add(bb.getDouble); j += 1 }
      i += 1
    }
    sk
  }
}

/** `quantile_sketch(x, k)`: aggregates DOUBLE values into a serialized
  * [[QuantileSketch]] (BINARY). The epoch-persistable half of the
  * build/merge pair — mirror of `hll_sketch_agg` for rank queries.
  * Partial buffers merge map-side; only O(k·log(n/k)) doubles cross the
  * exchange.
  */
case class QuantileSketchAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] with UnaryLike[Expression] {
  require(k >= 8, "quantile_sketch needs k >= 8")
  require(child.dataType == DoubleType,
    "quantile_sketch input must be DOUBLE (the SQL registration casts)")

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QuantileSketch, other: QuantileSketch): QuantileSketch = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: QuantileSketch): Any = buf.serialized
  override def serialize(buf: QuantileSketch): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_sketch"
}

/** `quantile_merge(sketch)`: unions serialized [[QuantileSketch]]es into
  * one (BINARY) — mirror of `hll_union_agg`. This is the cross-epoch
  * path: per-epoch sketches persisted at ingest are merged WITHOUT
  * re-reading the epochs' rows, and the merged sketch keeps the same
  * rank guarantee over the union.
  */
case class QuantileMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] with UnaryLike[Expression] {

  // k is carried by the serialized sketches themselves; an empty union
  // falls back to a minimal valid sketch.
  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(8)

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val incoming = QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf.n == 0L && buf.k < incoming.k) { incoming.mergeIn(buf); incoming }
      else { buf.mergeIn(incoming); buf }
    }
  }

  override def merge(buf: QuantileSketch, other: QuantileSketch): QuantileSketch =
    if (buf.n == 0L && buf.k < other.k) { other.mergeIn(buf); other }
    else { buf.mergeIn(other); buf }

  override def eval(buf: QuantileSketch): Any = buf.serialized
  override def serialize(buf: QuantileSketch): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override protected def withNewChildInternal(c: Expression): QuantileMergeAgg =
    copy(child = c)
  override def withNewMutableAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_merge"
}

/** `quantile_value(sketch, q)`: rank-q estimate from a serialized
  * [[QuantileSketch]]. Evaluated on aggregated sketch rows (one per
  * epoch/group), never per input row, so the deserialize-per-call cost
  * is off the hot path by construction.
  */
case class QuantileValue(left: Expression, right: Expression)
    extends BinaryExpression {
  require(right.dataType == DoubleType,
    "quantile_value q must be DOUBLE (the SQL registration casts)")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(sketch: Any, q: Any): Any =
    QuantileSketch.quantileOf(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, q) =>
      s"${ev.value} = graft.functions.QuantileSketch.quantileOf($sk, $q);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : QuantileValue = copy(left = l, right = r)
  override def prettyName: String = "quantile_value"
}

/** `cms_merge(sketch)`: union of serialized Count–Min sketches (the
  * binary column Spark's built-in `count_min_sketch` aggregate emits).
  * CMS counters sum elementwise, so the merge is EXACT: merging
  * per-epoch sketches yields bit-identical counters to one sketch built
  * over all epochs' rows with the same (eps, confidence, seed) — the
  * persisted-sketch incremental pattern ([[graft.ops.Relational
  * .q34HllMergeEpochs]]'s HLL analogue, but with exact merge agreement).
  * Only the KB-scale counter array crosses the exchange, never rows.
  * Spark ships build (`count_min_sketch`) but no merge aggregate or
  * query expression — these two close the loop.
  */
case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.util.sketch.CountMinSketch]
  with UnaryLike[Expression] {
  import org.apache.spark.util.sketch.CountMinSketch

  // Empty 1×1 sentinel marks "no input yet"; the first real sketch is
  // adopted wholesale (sketch shape is carried by the inputs themselves).
  // totalCount == 0 keeps a legitimately 1×1-shaped NON-empty input from
  // being mistaken for the sentinel and silently dropped — such an input
  // instead reaches mergeInPlace, which correctly rejects the
  // incompatible shape. An all-null group evals to NULL (below), matching
  // the built-in aggregates' no-input convention.
  override def createAggregationBuffer(): CountMinSketch = CountMinSketch.create(1, 1, 1)
  private def isSentinel(s: CountMinSketch): Boolean =
    s.depth == 1 && s.width == 1 && s.totalCount == 0

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val incoming = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (isSentinel(buf)) incoming
      else { buf.mergeInPlace(incoming); buf }
    }
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (isSentinel(buf)) other
    else if (isSentinel(other)) buf
    else { buf.mergeInPlace(other); buf }

  override def eval(buf: CountMinSketch): Any =
    if (isSentinel(buf)) null else serialize(buf)
  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg =
    copy(child = c)
  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "cms_merge"
}

/** `cms_estimate(sketch, item)`: point-frequency estimate from a
  * serialized Count–Min sketch. Evaluated on aggregated sketch rows (one
  * per epoch/group) against a handful of query items, never per input
  * row, so the deserialize-per-call cost is off the hot path by
  * construction. Guarantees (deterministic for a fixed seed + data):
  * estimate ≥ true count always; estimate ≤ true + eps·N with the
  * sketch's confidence.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(sketch: Any, item: Any): Any = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch.asInstanceOf[Array[Byte]]))
    val key: Any = item match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }
    java.lang.Long.valueOf(cms.estimateCount(key))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CmsEstimate = copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
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

/** `keyed_max(key, value)`: per-key maximum as `map<bigint, bigint>` —
  * max(value) grouped by key WITHOUT a groupBy, so it can ride an
  * `observe()` on a write pass. The motivating consumer is the CDC
  * sync's per-PARTITION high-water mark (Kafka topics with N > 1
  * partitions need one resume offset per partition — the reference's
  * `{topic: {"0": n}}` shape generalized): the buffer is one entry per
  * distinct key (partition count, not row count), merged by max, so the
  * metric costs O(partitions) bytes on a scan of any size and the delta
  * is still read exactly once. Keys and values are evaluated as longs;
  * null key or value rows are skipped (like built-in max).
  */
case class KeyedMaxAgg(
    left: Expression, right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty[Long, Long]

  private def bump(buf: mutable.HashMap[Long, Long], k: Long, v: Long): Unit =
    buf.get(k) match {
      case Some(cur) => if (v > cur) buf.update(k, v)
      case None => buf.update(k, v)
    }

  override def update(buf: mutable.HashMap[Long, Long], input: InternalRow)
      : mutable.HashMap[Long, Long] = {
    val k = left.eval(input)
    val v = right.eval(input)
    if (k != null && v != null)
      bump(buf, k.asInstanceOf[Number].longValue, v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: mutable.HashMap[Long, Long],
      other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    other.foreach { case (k, v) => bump(buf, k, v) }
    buf
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    val sorted = buf.toSeq.sortBy(_._1) // deterministic map order
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : KeyedMaxAgg = copy(left = l, right = r)
  override def withNewMutableAggBufferOffset(o: Int): KeyedMaxAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KeyedMaxAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "keyed_max"
}
