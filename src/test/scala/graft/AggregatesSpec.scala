package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions.{bloom_build, bloom_might_contain, heavy_hitters, topk_by}

/** Pins the typed-imperative aggregates: bounded-heap top-k (values,
  * ordering, ties, partial/merge path across many partitions, SQL
  * registration) and the bloom build/probe pair (no false negatives,
  * bounded false positives, OR-merge across partitions), plus the two
  * registered queries' equivalence to their window / plain-join twins.
  */
class AggregatesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "aggregates-spec")
  val sf = "/root/testdata/sf0.001"

  test("topk_by keeps the k greatest by ord, descending, through partial merges") {
    import spark.implicits._
    // 1000 rows over 7 partitions: every partial heap must serialize,
    // cross the exchange, and merge
    val df = spark.range(1000).repartition(7)
      .select(col("id"), (col("id") % 10).as("g"), (col("id") * 37 % 1000).as("score"))
    val got = df.groupBy(col("g"))
      .agg(topk_by(col("score"), col("id"), 3).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // brute-force expectation
    val rows = (0L until 1000L).map(id => (id % 10, id * 37 % 1000, id))
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy(-_._2).take(3).map(_._3)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (g, ids) => assert(got(g) == ids, s"group $g") }
  }

  test("topk_by is SQL-callable through the injected function") {
    import spark.implicits._
    Seq((1, 10L), (1, 30L), (1, 20L), (2, 5L)).toDF("g", "x")
      .createOrReplaceTempView("topk_src")
    val got = spark.sql(
      "SELECT g, topk_by(x, x, 2) AS top FROM topk_src GROUP BY g ORDER BY g")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got == Map(1 -> Seq(30L, 20L), 2 -> Seq(5L)))
  }

  test("heavy_hitters honors the Misra-Gries guarantee under any partitioning") {
    import spark.implicits._
    // skewed stream: item i appears 2^(10-i) times for i in 0..9, plus a
    // long tail of singletons — n = 2047 + 500
    val rows = (0 to 9).flatMap(i => Seq.fill(1 << (10 - i))(s"hot_$i")) ++
      (0 until 500).map(i => s"tail_$i")
    val n = rows.size
    val k = 8
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val guaranteed = exact.filter { case (_, c) => c > n.toDouble / (k + 1) }.keySet
    assert(guaranteed.nonEmpty, "fixture must have guaranteed heavy hitters")
    // partial-merge paths differ with partitioning; the guarantee must not
    for (parts <- Seq(1, 4, 13)) {
      val got = rows.toDF("item").repartition(parts)
        .agg(heavy_hitters(col("item"), k).as("hh"))
        .select(explode(col("hh")).as("c"))
        .select(col("c.item"), col("c.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k)
      assert(guaranteed.subsetOf(got.keySet),
        s"parts=$parts lost guaranteed items: ${guaranteed -- got.keySet}")
      // weights lower-bound true frequency within n/(k+1)
      got.foreach { case (item, est) =>
        assert(est <= exact(item), s"$item overestimated: $est > ${exact(item)}")
        assert(est >= exact(item) - n.toDouble / (k + 1) - 1, s"$item bound too loose")
      }
    }
  }

  test("heavy_hitters plans as a partial+final typed aggregate") {
    import spark.implicits._
    val plan = (0 until 100).map(i => s"t$i").toDF("item").repartition(4)
      .agg(heavy_hitters(col("item"), 8))
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate per partition ⇒ only ≤k-entry buffers
    // cross the exchange — the aggregate's whole point at scale
    assert(plan.contains("ObjectHashAggregate"), s"expected typed partial agg:\n$plan")
  }

  test("heavy_hitters is SQL-callable through the injected function") {
    import spark.implicits._
    Seq("a", "a", "a", "b", "b", "c").toDF("s").createOrReplaceTempView("hh_in")
    val out = spark.sql("SELECT heavy_hitters(s, 2) AS hh FROM hh_in")
      .select(explode(col("hh")).as("c")).select(col("c.item")).as[String].collect()
    assert(out.contains("a"))
  }

  test("bloom has no false negatives and a sane false-positive rate") {
    import spark.implicits._
    val keys = spark.range(0, 2000).repartition(5) // multi-partition: OR-merge path
    val bloomRow = keys.agg(bloom_build(col("id"), 1 << 16, 5).as("bf"))
    val probeAll = spark.range(0, 4000)
      .crossJoin(broadcast(bloomRow))
      .select(col("id"), bloom_might_contain(col("bf"), col("id"), 5).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every inserted key must hit
    (0L until 2000L).foreach(k => assert(probeAll(k), s"false negative on $k"))
    // absent keys: 2000 keys in 2^16 bits with 5 hashes ⇒ fp ≈ 0.0001;
    // allow two orders of magnitude slack
    val fp = (2000L until 4000L).count(probeAll(_))
    assert(fp <= 20, s"false-positive count $fp out of 2000")
  }

  test("rel_q31 (heap top-k aggregate) ≡ rel_q7 (ranking window)") {
    val a = graft.ops.Relational.q31TopKAgg(spark, sf)
    val b = graft.ops.Relational.q7WindowTopPerNation(spark, sf)
    assert(a.schema.fieldNames.toSeq == b.schema.fieldNames.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("rel_q32 (bloom-prefiltered semi join) ≡ plain semi join") {
    import graft.schema.Tables
    val part = Tables(spark, sf, "part").filter(col("p_size") <= 5)
    val plain = Tables(spark, sf, "lineitem")
      .join(part.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("l_returnflag"))
    val bloomed = graft.ops.Relational.q32BloomSemiJoin(spark, sf)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }
}
