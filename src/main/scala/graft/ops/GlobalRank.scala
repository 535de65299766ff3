package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking — the replacement for a no-partition
  * `Window.orderBy(...)` (which moves the WHOLE input through one
  * partition: the canonical scale-killer the optimization guide's §2
  * warns about, and exactly what `WindowExec` warns about at runtime).
  *
  * Shape: ONE range exchange of the input (parallel, AQE-exempt because
  * the partition count is explicit), a per-partition row-count aggregate
  * (≤ `parts` rows) whose running sum becomes each partition's global
  * rank offset, broadcast back onto the sorted partitions. Within a
  * single action the two consumers share the one exchange (AQE stage
  * reuse), so the input is shuffled once and no stage ever holds more
  * than its range slice — at any scale.
  *
  * Rank ties: `ord` must be a total order (callers append a unique id
  * column) — the same requirement the single-partition window had for
  * deterministic output.
  */
object GlobalRank {

  /** Adaptive guard for callers that can estimate their input: below
    * `graft.rank.distributedMinBytes` (default: one scan split,
    * spark.sql.files.maxPartitionBytes) a single-partition window sorts
    * the whole input in one task faster than the distributed rank's
    * extra jobs can; above it the window is the scale-killer. Mirrors
    * AQE's size-based strategy switches; both paths produce identical
    * assignments (RankSpec pins equality). */
  def distributedWorthIt(df: DataFrame, inputBytes: Long): Boolean = {
    val spark = df.sparkSession
    val floor = spark.conf.getOption("graft.rank.distributedMinBytes")
      .map(_.toLong)
      .getOrElse(org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")))
    inputBytes > floor
  }

  /** Sum of the source files behind `df` — the same metadata-only probe
    * [[graft.schema.Tables.parallelized]] uses. */
  def inputBytes(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }

  /** Returns `df` with two appended columns: `_rank` (0-based global rank
    * in `ord` order) and `_n` (total row count). */
  def ranked(df: DataFrame, ord: Seq[Column], parts: Int): DataFrame = {
    val p = math.max(parts, 1)
    // EAGER materialization of the range exchange (the repo's standard
    // multi-consumer localCheckpoint discipline): the offset branch and
    // the row branch MUST see the same partition boundaries, but column
    // pruning gives each consumer a differently-projected Exchange —
    // separate exchanges sample separate (nondeterministic) range
    // boundaries, which skews the offsets against the rows. One
    // checkpointed shuffle output is read by both.
    val exch = df.repartitionByRange(p, ord: _*).localCheckpoint(true)
    // per-partition counts → exclusive prefix offsets (+ the total):
    // ≤ `parts` rows, so the unpartitioned running-sum window is bounded
    // by the partition count, never the data
    val offs = exch
      .groupBy(spark_partition_id().as("_pid"))
      .agg(count(lit(1)).as("_cnt"))
      .select(col("_pid"),
        coalesce(sum(col("_cnt")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("_off"),
        sum(col("_cnt")).over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("_n"))
    // local 0-based row index inside the sorted range partition, read off
    // monotonically_increasing_id's (partition << 33 | index) layout —
    // no per-partition window, no extra sort
    exch.sortWithinPartitions(ord: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
      .join(broadcast(offs), "_pid")
      .withColumn("_rank", col("_off") + col("_mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("_mid", "_pid", "_off")
  }

  /** `ntile(n)` over a global `ord` — [[ranked]] + Spark's own NTile
    * bucket arithmetic (first `N % n` buckets get the extra row), without
    * the single-partition WindowExec. Appends `file_id` (long), `_rank`,
    * `_n`. */
  def ntileRanked(df: DataFrame, ord: Seq[Column], n: Int, parts: Int): DataFrame =
    ranked(df, ord, parts)
      // NTile's bucket arithmetic (integral `div` throughout): with
      // small = N div n, rem = N % n, the first rem buckets hold
      // small+1 rows each; `when` guards the small = 0 (N < n) case,
      // where every rank lands in the first branch
      .withColumn("file_id", expr(
        s"""CASE WHEN _rank + 1 <= (_n % $n) * ((_n div $n) + 1)
           |     THEN _rank div ((_n div $n) + 1) + 1
           |     ELSE (_n % $n) +
           |          (_rank - (_n % $n) * ((_n div $n) + 1)) div (_n div $n) + 1
           |END""".stripMargin))

  /** EXACT interpolated percentiles of `valueCol` at `qs` — the same
    * values `percentile(col, array(qs))` returns (replicates
    * PercentileBase.getPercentile's arithmetic bit-for-bit), computed by
    * distributed rank selection instead of one OpenHashMap of every
    * distinct value merged into a single buffer: [[ranked]] over the
    * column, keep only the ≤ 2·|qs| boundary-rank rows, fold them to one
    * row. No task ever holds more than its range slice. Returns a 1-row
    * frame with columns `p0..p{k-1}` (doubles, unrounded). */
  def exactPercentiles(df: DataFrame, valueCol: Column, qs: Seq[Double],
                       parts: Int): DataFrame = {
    val r = ranked(df.select(valueCol.cast("double").as("_v"))
      .filter(col("_v").isNotNull), Seq(col("_v")), parts)
    // Percentile's position arithmetic: pos = (N-1) * q (doubles),
    // lower = floor(pos), higher = ceil(pos); result = value at rank
    // lower when the ranks (or the two values) coincide, else
    // (higher - pos) * lowerVal + (pos - lower) * higherVal
    def pos(q: Double) = (col("_n") - lit(1L)).cast("double") * lit(q)
    val keep = qs.map(q => col("_rank") === floor(pos(q)) ||
      col("_rank") === ceil(pos(q))).reduce(_ || _)
    val aggs = qs.zipWithIndex.flatMap { case (q, i) => Seq(
      max(when(col("_rank") === floor(pos(q)), col("_v"))).as(s"_lo$i"),
      max(when(col("_rank") === ceil(pos(q)), col("_v"))).as(s"_hi$i"),
      max(pos(q)).as(s"_pos$i")) }
    r.filter(keep)
      .agg(aggs.head, aggs.tail: _*)
      .select(qs.indices.map { i =>
        val (lo, hi, p) = (col(s"_lo$i"), col(s"_hi$i"), col(s"_pos$i"))
        when(lo === hi, lo)
          .otherwise((ceil(p).cast("double") - p) * lo +
            (p - floor(p).cast("double")) * hi).as(s"p$i")
      }: _*)
  }
}
