package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the operators Spark lacks. Preference
  * order per the build brief: built-ins first; these expressions exist only
  * where a built-in composition would be materially slower or impossible.
  */

/** Signed big-endian two's-complement bytes → Decimal(precision, scale).
  * This is the Debezium `decimal.handling.mode=precise` wire encoding
  * (base64 is stripped upstream by the built-in unbase64); the reference
  * stores these opaquely as strings (SURVEY.md §1.2) — this expression is
  * the optional fidelity fix. Cold path → interpreted eval is fine.
  */
case class BigEndianDecimal(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(precision, scale)
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val unscaled = new java.math.BigInteger(bytes)
    Decimal(new java.math.BigDecimal(unscaled, scale), precision, scale)
  }
  override protected def withNewChildInternal(c: Expression): BigEndianDecimal = copy(child = c)
}

/** Cosine similarity between two float vectors, whole-stage-codegen'd.
  * This sits in the innermost loop of brute-force ANN (|candidates| × dim
  * multiply-adds), so it generates a primitive float loop instead of the
  * boxed per-element evaluation a `functions.aggregate`/`zip_with`
  * composition would produce.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i); val yv = y.getFloat(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny) + 1e-30)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          float $xv = $a.getFloat($i); float $yv = $b.getFloat($i);
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny) + 1e-30);
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** Morton (Z-order) interleave of two non-negative `bits`-bit longs:
  * x's bit i lands at position 2i+1, y's at 2i — the space-filling-curve
  * key a write path sorts by for multi-dimensional data skipping
  * ([[graft.llm.Curation.zorderLayout]]). Native with codegen because the
  * equivalent `aggregate()` higher-order function evaluates interpreted
  * per row, which is exactly the wrong cost profile for a projection
  * that runs over every row of a 100 TB rewrite. */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    var z = 0L; var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    java.lang.Long.valueOf(z)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val z = ctx.freshName("z")
      s"""
        long $z = 0L;
        for (int $i = 0; $i < $bits; $i++) {
          $z |= (($a >> $i) & 1L) << (2 * $i + 1);
          $z |= (($b >> $i) & 1L) << (2 * $i);
        }
        ${ev.value} = $z;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValue =
    copy(left = l, right = r)
  override def prettyName: String = "zvalue"
}

/** Deterministic 64-bit mix (SplitMix64 finalizer) used to derive the
  * MinHash permutation family from a seed. Public-domain constant set. */
private[functions] object Mix {
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** MinHash signature over an array of pre-hashed shingles (long). For each
  * of `numHashes` affine permutations h_i(x) = a_i*x + b_i (mod 2^64,
  * unsigned order), emits min over the shingle set → array<long> of length
  * `numHashes`. Null/empty shingle set → null signature.
  *
  * The per-row work (|shingles| × numHashes multiply-adds) runs inside
  * this compiled eval loop, so CodegenFallback costs only per-row dispatch,
  * not per-element boxing.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => Mix.splitmix64(seed + 2L * i) | 1L) // odd multipliers
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => Mix.splitmix64(seed + 2L * i + 1))
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(-1L) // unsigned max
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = as(i) * h + bs(i)
        if (java.lang.Long.compareUnsigned(v, sig(i)) < 0) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** 64-bit SimHash over an array of pre-hashed token/shingle longs: per bit
  * position, vote +1/−1 by the bit of each hash; the result bit is the vote
  * sign. Near-duplicate docs land within a small Hamming distance
  * (computed downstream with built-in bit_count(a ^ b)).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Distinct hashed word-k-gram set of a document in one compiled pass:
  * split on single spaces, xxhash64 (seed 42) each k-word shingle, dedup.
  *
  * Semantically equal to the built-in composition
  * `transform(array_distinct(transform(sequence(...), i ->
  * concat_ws(" ", slice(split(text," "), i+1, k)))), xxhash64)` — but that
  * composition evaluates interpreted (higher-order functions don't codegen)
  * and re-evaluates `split` for every lambda element, i.e. O(words²)
  * string allocations per document. This expression is the documented
  * hot-path fix: one split, one hash per shingle, a long-set dedup.
  * Documents with fewer than k words yield an empty set (downstream
  * MinHash/SimHash then null out, matching the oracle's len>=k gate).
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "shingle size k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val space = UTF8String.fromString(" ")
  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](2 * (n - k + 1))
    val out = new Array[Long](n - k + 1)
    var m = 0
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = words(i + j); j += 1 }
      val h = XxHash64Function.hash(UTF8String.concatWs(space, window: _*), StringType, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** Distinct word-k-gram strings of a document in one compiled pass — the
  * string-typed sibling of [[ShingleHashes]], used where downstream needs
  * the actual shingles (exact Jaccard verification) rather than hashes.
  * Same rationale: the equivalent built-in higher-order-function
  * composition evaluates interpreted and re-splits the text per element.
  * Fewer than k words yields an empty array.
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "shingle size k must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val space = UTF8String.fromString(" ")
  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](2 * (n - k + 1))
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = words(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
  override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
}

/** Polynomial rolling-hash fingerprint of a string (Karp–Rabin over UTF-16
  * code units, mod 2^64): a cheap whole-document fingerprint for content
  * addressing / shift-tolerant chunk hashing in dedup pipelines.
  */
case class RollingHash(child: Expression, base: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * base + s.charAt(i).toLong; i += 1 }
    java.lang.Long.valueOf(h)
  }
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** Column-level API over the custom expressions. */
object GraftFunctions {
  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  def big_endian_decimal(bytes: Column, precision: Int = 10, scale: Int = 2): Column =
    c(BigEndianDecimal(e(bytes), precision, scale))
  def shingle_hashes(text: Column, k: Int = 3): Column = c(ShingleHashes(e(text), k))
  def shingles(text: Column, k: Int = 3): Column = c(Shingles(e(text), k))
  def vec_cosine(a: Column, b: Column): Column = c(VecCosine(e(a), e(b)))
  def minhash_signature(shingleHashes: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    c(MinHashSignature(e(shingleHashes), numHashes, seed))
  def simhash64(tokenHashes: Column): Column = c(SimHash64(e(tokenHashes)))
  def rolling_hash(s: Column, base: Long = 1000003L): Column = c(RollingHash(e(s), base))
  def topk_by(ord: Column, value: Column, k: Int): Column =
    c(TopKByAgg(e(ord), e(value), k).toAggregateExpression())
  def heavy_hitters(item: Column, k: Int): Column =
    c(MisraGriesAgg(e(item), k).toAggregateExpression())
  def quantile_sketch(x: Column, k: Int = 256): Column =
    c(QuantileSketchAgg(Cast(e(x), DoubleType), k).toAggregateExpression())
  def quantile_merge(sketch: Column): Column =
    c(QuantileMergeAgg(e(sketch)).toAggregateExpression())
  def quantile_value(sketch: Column, q: Double): Column =
    c(QuantileValue(e(sketch), Literal(q)))
  def bloom_build(key: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    c(BloomBuildAgg(e(key), numBits, numHashes).toAggregateExpression())
  def bloom_might_contain(bloom: Column, key: Column, numHashes: Int = 5): Column =
    c(BloomMightContain(e(bloom), e(key), numHashes))
  def cms_merge(sketch: Column): Column =
    c(CmsMergeAgg(e(sketch)).toAggregateExpression())
  def cms_estimate(sketch: Column, item: Column): Column =
    c(CmsEstimate(e(sketch), e(item)))
  // longs enforced at the seam (ImplicitCastInputTypes' AbstractDataType
  // is private[sql]); without the casts an int input crashes interpreted
  // eval (constant folding) while silently working under codegen
  def zvalue(x: Column, y: Column, bits: Int = 8): Column =
    c(ZValue(Cast(e(x), LongType), Cast(e(y), LongType), bits))
  def keyed_max(key: Column, value: Column): Column =
    c(KeyedMaxAgg(Cast(e(key), LongType), Cast(e(value), LongType))
      .toAggregateExpression())
}
