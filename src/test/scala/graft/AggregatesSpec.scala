package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions.{bloom_build, bloom_might_contain, heavy_hitters, quantile_merge, quantile_sketch, quantile_value, topk_by}

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

  test("quantile_sketch stays within its rank bound under any partitioning") {
    import spark.implicits._
    // adversarial-ish skewed distribution: squares (dense low, sparse
    // high) — rank bounds must hold regardless of value distribution
    val n = 100000
    val xs = (0 until n).map(i => (i.toDouble * i) % 999983)
    val sorted = xs.sorted
    for (parts <- Seq(1, 4, 32)) {
      val skRow = xs.toDF("x").repartition(parts)
        .agg(quantile_sketch(col("x"), 256).as("sk"))
      val got = skRow.select(
        quantile_value(col("sk"), 0.25).as("q25"),
        quantile_value(col("sk"), 0.50).as("q50"),
        quantile_value(col("sk"), 0.95).as("q95")).head()
      for ((q, v) <- Seq(0.25 -> got.getDouble(0), 0.50 -> got.getDouble(1),
                         0.95 -> got.getDouble(2))) {
        val rank = sorted.count(_ <= v).toDouble / n
        // tighter than the registered query's 5%: the worst-case bound at
        // k=256, n=1e5 is ~1.7%; alternating offsets keep typical error
        // well under it
        assert(math.abs(rank - q) <= 0.03,
          s"parts=$parts q=$q: estimate $v has rank $rank")
      }
    }
  }

  test("quantile_merge of per-group sketches ≡ one sketch's guarantee") {
    import spark.implicits._
    val n = 60000
    val xs = (0 until n).map(i => ((i * 37) % 1000).toDouble)
    val sorted = xs.sorted
    // 12 epochs built independently (the persisted-sketch-per-epoch
    // shape), then unioned without touching rows again
    val merged = xs.zipWithIndex.map { case (x, i) => (i % 12, x) }
      .toDF("epoch", "x").repartition(8)
      .groupBy(col("epoch")).agg(quantile_sketch(col("x"), 256).as("sk"))
      .agg(quantile_merge(col("sk")).as("msk"))
    val got = merged.select(
      quantile_value(col("msk"), 0.10).as("q10"),
      quantile_value(col("msk"), 0.50).as("q50"),
      quantile_value(col("msk"), 0.90).as("q90")).head()
    for ((q, v) <- Seq(0.10 -> got.getDouble(0), 0.50 -> got.getDouble(1),
                       0.90 -> got.getDouble(2))) {
      val rank = sorted.count(_ <= v).toDouble / n
      assert(math.abs(rank - q) <= 0.03, s"q=$q: estimate $v has rank $rank")
    }
  }

  test("quantile sketch family is SQL-callable and plans as typed partial agg") {
    import spark.implicits._
    (0 until 1000).map(_.toDouble).toDF("x").createOrReplaceTempView("qs_in")
    val est = spark.sql(
      "SELECT quantile_value(quantile_sketch(x, 64), 0.5) AS med FROM qs_in")
      .head().getDouble(0)
    assert(math.abs(est - 500.0) <= 50.0, s"median estimate $est")
    val plan = spark.range(1000).select(col("id").cast("double").as("x"))
      .repartition(4).agg(quantile_sketch(col("x"), 64))
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate ⇒ only sketch buffers cross the exchange
    assert(plan.contains("ObjectHashAggregate"), s"expected typed partial agg:\n$plan")
  }

  test("cms merge is exact and estimates honor the CMS guarantees") {
    import spark.implicits._
    import graft.functions.GraftFunctions.{cms_merge, cms_estimate}
    // skewed synthetic stream over 5 partitions and 4 groups: every
    // partial sketch must serialize, cross the exchange, and merge
    val df = spark.range(20000).repartition(5)
      .select((col("id") % 4).as("g"),
        concat(lit("tok"), pmod(col("id") * col("id"), lit(97))).as("token"))
    val eps = 0.001
    def cms(c: org.apache.spark.sql.Column) =
      count_min_sketch(c, lit(eps), lit(0.99), lit(42))
    val merged = df.groupBy(col("g")).agg(cms(col("token")).as("sk"))
      .agg(cms_merge(col("sk")).as("msk"))
    val direct = df.agg(cms(col("token")).as("dsk"))
    val trueCounts = df.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = trueCounts.keys.take(20).toSeq
    val row = merged.crossJoin(direct)
      .select(probes.flatMap(t => Seq(
        cms_estimate(col("msk"), lit(t)).as(s"m_$t"),
        cms_estimate(col("dsk"), lit(t)).as(s"d_$t"))): _*)
      .head()
    probes.zipWithIndex.foreach { case (t, i) =>
      val (m, d) = (row.getLong(2 * i), row.getLong(2 * i + 1))
      assert(m == d, s"merge must be exact for $t: merged=$m direct=$d")
      assert(d >= trueCounts(t), s"no undercount for $t")
      assert(d <= trueCounts(t) + math.ceil(20000 * eps).toLong + 1,
        s"eps bound for $t: est=$d true=${trueCounts(t)}")
    }
  }

  test("cms family is SQL-callable through the injected functions") {
    import spark.implicits._
    Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("g", "t")
      .createOrReplaceTempView("cms_src")
    val got = spark.sql(
      """SELECT cms_estimate(cms_merge(sk), 'x') AS est FROM
        |  (SELECT g, count_min_sketch(t, 0.01d, 0.99d, 42) AS sk
        |   FROM cms_src GROUP BY g)""".stripMargin).head().getLong(0)
    assert(got == 2L)
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
