package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GlobalRank

/** Pins the r15 distributed-rank machinery (the scale-safe replacement
  * for no-partition WindowExec sorts): rank integrity, ntile equality
  * against Spark's own window NTile on the same total order, and the
  * exact-percentile selection's bit-identity against the builtin
  * `percentile` aggregate.
  */
class RankSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "rank-spec")
  val sf = "/root/testdata/sf0.001"

  test("ranked assigns a dense 0-based global rank in ord order") {
    val df = spark.range(5000).select(
      (col("id") * 2654435761L % 100003L).as("k"), col("id"))
    val r = GlobalRank.ranked(df, Seq(col("k"), col("id")), 7)
    val chk = r.agg(count(lit(1)), countDistinct(col("_rank")),
      min(col("_rank")), max(col("_rank")), max(col("_n"))).collect()(0)
    assert(chk.getLong(0) == 5000L)
    assert(chk.getLong(1) == 5000L) // dense: no gaps, no duplicates
    assert(chk.getLong(2) == 0L && chk.getLong(3) == 4999L)
    assert(chk.getLong(4) == 5000L)
    // rank order IS ord order: rank 0 carries the smallest key
    val viaRank = r.orderBy(col("_rank")).select(col("k")).limit(3)
      .collect().map(_.getLong(0)).toSeq
    val viaSort = df.orderBy(col("k"), col("id")).select(col("k")).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(viaRank == viaSort)
  }

  test("ntileRanked equals window ntile on the same total order") {
    for (n <- Seq(7, 64, 6000)) { // remainder path, even path, n > N path
      val df = spark.range(4999).select(
        (col("id") * 40503L % 65521L).as("k"), col("id"))
      val dist = GlobalRank.ntileRanked(df, Seq(col("k"), col("id")), n, 7)
        .select(col("id"), col("file_id").cast("int").as("b"))
      val win = df.select(col("id"),
        ntile(n).over(Window.orderBy(col("k"), col("id"))).as("b"))
      assert(dist.exceptAll(win).isEmpty && win.exceptAll(dist).isEmpty,
        s"ntile($n) mismatch between distributed and window assignment")
    }
  }

  test("exactPercentiles matches the builtin percentile bit-for-bit") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice").cast("double").as("v"))
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val got = GlobalRank.exactPercentiles(li, col("v"), qs, 7).collect()(0)
    val ref = li.agg(expr("percentile(v, array(0.25, 0.5, 0.75, 0.95))"))
      .collect()(0).getSeq[Double](0)
    qs.indices.foreach { i =>
      assert(java.lang.Double.doubleToLongBits(got.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(ref(i)),
        s"q=${qs(i)}: got ${got.getDouble(i)} want ${ref(i)}")
    }
    // interpolation edge: tiny frames where floor(pos) == ceil(pos)
    // for some q and the two boundary values coincide for others
    val tiny = spark.range(5).select((col("id") % 3).cast("double").as("v"))
    val g2 = GlobalRank.exactPercentiles(tiny, col("v"), qs, 3).collect()(0)
    val r2 = tiny.agg(expr("percentile(v, array(0.25, 0.5, 0.75, 0.95))"))
      .collect()(0).getSeq[Double](0)
    qs.indices.foreach { i =>
      assert(java.lang.Double.doubleToLongBits(g2.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(r2(i)))
    }
  }

  test("zorder layout stats agree across the window and distributed paths") {
    val base = graft.llm.Curation.zorderLayout(spark, sf).collect().toSeq
    val prev = spark.conf.getOption("graft.rank.distributedMinBytes")
    spark.conf.set("graft.rank.distributedMinBytes", "0") // force distributed
    try {
      val dist = graft.llm.Curation.zorderLayout(spark, sf).collect().toSeq
      assert(dist == base)
    } finally prev.fold(spark.conf.unset("graft.rank.distributedMinBytes"))(
      v => spark.conf.set("graft.rank.distributedMinBytes", v))
  }
}
