package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.schema.Tables

/** Scalar-function slice — string / date / math / array / map / json — one
  * oracled query per family (SURVEY.md §2.2: the reference uses none of
  * these, but the rebuild inherits the whole library from Spark; these
  * queries demonstrate the capability rather than merely asserting it).
  * All expressions are built-in Catalyst functions → whole-stage codegen,
  * no UDFs in any of them.
  */
object Functions {

  def fString(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_name").like("%1%"))
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("digitless"))
      .orderBy(col("c_custkey"))

  def fDate(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mth"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_before_2002"))
      .orderBy(col("o_orderkey"))

  def fMath(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        round(log(col("l_extendedprice") + 1), 6).as("price_ln"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_tax") * 100).cast("long").as("tax_pct_ceil"),
        // double, not DECIMAL(10,4): a decimal's trailing-zero scale
        // ('0.0100') hashes differently from the oracle's float 0.01 in the
        // driver compare even though the values are equal; decimal-cast
        // coverage lives in cdc_typed_orders where the scale is exact
        round(abs(col("l_discount") - lit(0.05)), 4).as("disc_dev"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def fArray(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        split(col("text"), " ").as("words"))
      .select(
        col("doc_id"),
        size(col("words")).as("n_words"),
        array_contains(col("words"), "spark").as("has_spark"),
        concat_ws(" ", slice(col("words"), 1, 3)).as("first3"),
        element_at(array_sort(col("words")), 1).as("first_sorted"),
        size(array_distinct(col("words"))).as("n_distinct_words"))
      .orderBy(col("doc_id"))

  def fMap(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        map(lit("chars"), length(col("text")).cast("long"),
            lit("words"), size(split(col("text"), " ")).cast("long")).as("m"))
      .select(
        col("doc_id"),
        element_at(col("m"), "chars").as("n_chars"),
        element_at(col("m"), "words").as("n_words"),
        size(map_keys(col("m"))).as("n_keys"))
      .orderBy(col("doc_id"))

  def fJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_path"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k_struct"))
      .orderBy(col("event_id"))

  /** Statistical aggregates (corr / covariance / stddev): one partial+final
    * pass using mergeable central-moment accumulators — the distributed
    * formulation both Spark and DuckDB implement, so values agree to FP
    * noise and the rounding below absorbs accumulation-order drift
    * (tighter rounding on the [−1,1]-scale corr, looser on price-scale
    * moments). */
  def fStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
        round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
        round(stddev_pop(col("l_quantity")), 6).as("qty_stddev_pop"),
        round(avg(col("l_discount")), 6).as("avg_discount"))
      .orderBy(col("l_returnflag"))

  /** Linear-regression aggregates (regr_slope / intercept / r² / count):
    * the per-group OLS fit both engines compute from the same mergeable
    * moment accumulators (sums of x, y, x², xy) — one partial+final pass,
    * no second scan. Rounding absorbs accumulation-order drift like
    * [[fStats]]: r² lives on [0,1] (6 places), slope/intercept on data
    * scale (4). */
  def fRegression(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy(col("l_returnflag"))

  /** Exact percentiles: Spark's `percentile` sorts the group and linearly
    * interpolates at p·(n−1) — the same definition as ANSI
    * percentile_cont, so the oracle is exact, not an estimator. The
    * estimator twin, [[fApproxPercentile]], registers separately under the
    * no-oracle allowlist (like approx_count_distinct it has no
    * cross-engine oracle; its error bound is spec-pinned instead). */
  def fPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("price_p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("price_p75"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_p50"))
      .orderBy(col("l_returnflag"))

  /** Approximate percentiles via approx_percentile (Greenwald-Khanna
    * sketch): the estimator twin of [[fPercentile]], and the form that
    * actually runs at 100 TB — the sketch is a mergeable, bounded-size
    * aggregation buffer (here accuracy 10000 ⇒ ε = 1e-4), so only
    * O(1/ε) state crosses the exchange instead of the full sorted group
    * the exact percentile needs.
    *
    * Registered in the invariant-oracle form (replaces the r3 no-oracle
    * entry): the sketch VALUE has no cross-engine oracle, but GK's actual
    * contract — the returned element's rank is within ε·n of p·n — is
    * checkable in-query. For each group and percentile p the second pass
    * counts rows strictly below / at-or-below the sketch's answer v; the
    * rank interval [count(<v)+1, count(≤v)] must intersect
    * [p·n − εn − 1, p·n + εn + 1] (±1 absorbs the p·(n−1) interpolation
    * convention at the ends). The oracle emits the same group counts with
    * all-true bounds, so a sketch drifting out of its guarantee fails the
    * driver compare. (This is the rank-space form r3's ADVICE asked for —
    * a rank-accurate answer can be arbitrarily far in VALUE space on
    * sparse columns, so no value bound appears here.) */
  def fApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val approx = li.groupBy(col("l_returnflag")).agg(
      expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("ap25"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
      expr("approx_percentile(l_extendedprice, 0.75, 10000)").as("ap75"),
      expr("approx_percentile(l_quantity, 0.5, 10000)").as("aq50"))
    def below(c: String, v: String) =
      sum((col(c) < col(v)).cast("long"))
    def atMost(c: String, v: String) =
      sum((col(c) <= col(v)).cast("long"))
    def rankOk(lo: Column, hi: Column, p: Double): Column = {
      val n = count(lit(1)).cast("double")
      val eps = n * lit(1e-4) + lit(1.0)
      (lo <= n * lit(p) + eps) && (hi >= n * lit(p) - eps)
    }
    li.join(broadcast(approx), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        rankOk(below("l_extendedprice", "ap25"), atMost("l_extendedprice", "ap25"), 0.25).as("p25_ok"),
        rankOk(below("l_extendedprice", "ap50"), atMost("l_extendedprice", "ap50"), 0.50).as("p50_ok"),
        rankOk(below("l_extendedprice", "ap75"), atMost("l_extendedprice", "ap75"), 0.75).as("p75_ok"),
        rankOk(below("l_quantity", "aq50"), atMost("l_quantity", "aq50"), 0.50).as("qty_p50_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** The raw sketch values — the user-facing estimator API (what a
    * dashboard actually reads); the registered query above wraps it in the
    * oracle-able rank-invariant form. */
  def fApproxPercentileRaw(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("approx_percentile(l_extendedprice, 0.25, 10000)"), 4).as("price_p25"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4).as("price_p50"),
        round(expr("approx_percentile(l_extendedprice, 0.75, 10000)"), 4).as("price_p75"),
        round(expr("approx_percentile(l_quantity, 0.5, 10000)"), 4).as("qty_p50"))
      .orderBy(col("l_returnflag"))

  /** Mergeable quantile sketches across epochs — the rank-query twin of
    * rel_q34's HLL pattern, built on the native
    * [[graft.functions.QuantileSketchAgg]] family because Spark ships no
    * persistable quantile-sketch column (approx_percentile's GK buffer
    * lives and dies inside one query; the DataSketches surface covers
    * only HLL). At 100 TB each ingest epoch persists its own ~KB sketch;
    * quantile_merge unions them WITHOUT re-reading the epochs' rows.
    *
    * Invariant-oracle form (the sketch VALUE has no cross-engine
    * oracle): alongside the exact percentiles (value-checked against
    * DuckDB percentile_cont), the query re-scans lineitem once to
    * measure each estimate's actual rank and asserts |rank − q| ≤ 5% —
    * 2.5× the k=256 hierarchy's worst-case bound at this n — for BOTH
    * the directly-built sketch and the per-month-merged one. A sketch
    * or merge that drifts out of guarantee fails the driver compare.
    */
  def fQuantileSketchEpochs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.{quantile_merge, quantile_sketch, quantile_value}
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_extendedprice").cast("double").as("price"), col("l_shipdate"))
    val merged = li
      .groupBy(date_trunc("month", col("l_shipdate")).as("epoch"))
      .agg(quantile_sketch(col("price")).as("sk"))
      .agg(quantile_merge(col("sk")).as("msk"))
    val direct = li.agg(quantile_sketch(col("price")).as("dsk"))
    // exact percentiles by distributed rank selection (identical doubles
    // to percentile(price, array(...)) — see GlobalRank.exactPercentiles):
    // the single-buffer OpenHashMap-of-every-distinct-price aggregate was
    // this query's dominant cost AND its one non-scalable stage
    val exact = GlobalRank.exactPercentiles(li, col("price"),
      Seq(0.25, 0.5, 0.75, 0.95), spark.sparkContext.defaultParallelism)
    val ests = direct.crossJoin(exact).crossJoin(merged).select(
      round(col("p0"), 4).as("price_p25"),
      round(col("p1"), 4).as("price_p50"),
      round(col("p2"), 4).as("price_p75"),
      round(col("p3"), 4).as("price_p95"),
      quantile_value(col("dsk"), 0.25).as("d25"),
      quantile_value(col("dsk"), 0.50).as("d50"),
      quantile_value(col("dsk"), 0.75).as("d75"),
      quantile_value(col("dsk"), 0.95).as("d95"),
      quantile_value(col("msk"), 0.25).as("m25"),
      quantile_value(col("msk"), 0.50).as("m50"),
      quantile_value(col("msk"), 0.75).as("m75"),
      quantile_value(col("msk"), 0.95).as("m95"))
    // rank-verification pass: one more scan, estimates broadcast
    val n = count(lit(1)).cast("double")
    def rankOk(est: String, q: Double): Column =
      (abs(sum((col("price") <= col(est)).cast("long")).cast("double") / n - lit(q))
        <= lit(0.05)).as(est + "_ok")
    li.crossJoin(broadcast(ests))
      .groupBy(col("price_p25"), col("price_p50"), col("price_p75"), col("price_p95"))
      .agg(count(lit(1)).as("n_rows"),
        rankOk("d25", 0.25), rankOk("d50", 0.50), rankOk("d75", 0.75), rankOk("d95", 0.95),
        rankOk("m25", 0.25), rankOk("m50", 0.50), rankOk("m75", 0.75), rankOk("m95", 0.95))
  }

  /** Lateral expansion: posexplode flattens each document's token array to
    * (pos, token) rows — the Generate operator. Row count multiplies by
    * ~|tokens|, so at scale this runs AFTER any document-level filter
    * (here the doc_id bound) and never before a join. */
  def fExplode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .orderBy(col("doc_id"), col("pos"))

  /** Argmax/argmin aggregates (max_by / min_by): per market segment, the
    * order that carries the extreme price. Ties on the raw price would
    * make the picked key engine-dependent, so the ordering value is
    * de-tied deterministically: cents·10⁷ + orderkey (prices have 2
    * decimals ⇒ round(price·100) is exact; orderkey < 10⁷ keeps the
    * packing collision-free). Same partial+final shape as min/max — the
    * argmax state is one (value, key) pair per group per partition. */
  def fMinMaxBy(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val tieKey = round(col("o_totalprice") * 100).cast("long") * lit(10000000L) +
      col("o_orderkey")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("tie_key", tieKey)
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("o_orderkey"), col("tie_key")).as("priciest_order"),
        min_by(col("o_orderkey"), col("tie_key")).as("cheapest_order"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(min(col("o_totalprice")), 2).as("min_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** Fixed-width histogram + percent-of-total: bin = ⌊price/50k⌋, share in
    * ppm against a broadcast 1-row total (the tfidf N pattern — no
    * driver-side count, no whole-frame window). The binning agg is
    * partial+final on ~|bins| keys; everything downstream operates on the
    * bin-sized aggregate. floor-ppm, not round — no half-way ties. */
  def fHistogram(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val total = o.agg(count(lit(1)).as("total"))
    o.select(floor(col("o_totalprice") / 50000).cast("long").as("price_bin"))
      .groupBy(col("price_bin"))
      .agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(total))
      .select(col("price_bin"), col("n_orders"),
        floor(col("n_orders").cast("double") / col("total") * lit(1e6))
          .cast("long").as("share_ppm"))
      .orderBy(col("price_bin"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_histogram" -> fHistogram,
    "fn_minmax_by" -> fMinMaxBy,
    "fn_string" -> fString,
    "fn_date" -> fDate,
    "fn_math" -> fMath,
    "fn_array" -> fArray,
    "fn_map" -> fMap,
    "fn_json" -> fJson,
    "fn_stats" -> fStats,
    "fn_regression" -> fRegression,
    "fn_percentile" -> fPercentile,
    "fn_approx_percentile" -> fApproxPercentile,
    "fn_quantile_sketch_epochs" -> fQuantileSketchEpochs,
    "fn_explode" -> fExplode
  )

  val oracles: Map[String, String] = Map(
    "fn_histogram" ->
      """WITH b AS (
        |  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bin,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |t AS (SELECT count(*) AS total FROM orders)
        |SELECT price_bin, n_orders,
        |  CAST(floor(CAST(n_orders AS DOUBLE) / t.total * 1e6) AS BIGINT) AS share_ppm
        |FROM b CROSS JOIN t ORDER BY price_bin""".stripMargin,
    "fn_minmax_by" ->
      """WITH j AS (
        |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000000 + o.o_orderkey AS tie_key
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT c_mktsegment,
        |  arg_max(o_orderkey, tie_key) AS priciest_order,
        |  arg_min(o_orderkey, tie_key) AS cheapest_order,
        |  round(max(o_totalprice), 2) AS max_price,
        |  round(min(o_totalprice), 2) AS min_price
        |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "fn_string" ->
      """SELECT c_custkey,
        |  upper(c_name) AS upper_name,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  concat_ws('|', c_mktsegment, c_name) AS tagged,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS digitless
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mth,
        |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_before_2002
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 4) AS net,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  round(ln(l_extendedprice + 1), 6) AS price_ln,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
        |  round(abs(l_discount - 0.05), 4) AS disc_dev,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  list_contains(words, 'spark') AS has_spark,
        |  array_to_string(words[1:3], ' ') AS first3,
        |  list_sort(words)[1] AS first_sorted,
        |  CAST(len(list_distinct(words)) AS INTEGER) AS n_distinct_words
        |FROM t ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  2 AS n_keys
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,
    "fn_regression" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "fn_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  round(stddev_samp(l_extendedprice), 4) AS price_stddev,
        |  round(stddev_pop(l_quantity), 6) AS qty_stddev_pop,
        |  round(avg(l_discount), 6) AS avg_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // GK rank-invariant form: group counts + all-true bounds (the sketch
    // value itself has no cross-engine oracle)
    "fn_approx_percentile" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS qty_p50_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // MRL/KLL rank-invariant form: exact percentiles value-checked, the
    // direct and epoch-merged sketch estimates asserted within 5% rank
    // error in-query (no cross-engine oracle exists for the sketch value)
    "fn_quantile_sketch_epochs" ->
      """SELECT
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p25,
        |  round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p50,
        |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p75,
        |  round(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p95,
        |  count(*) AS n_rows,
        |  TRUE AS d25_ok, TRUE AS d50_ok, TRUE AS d75_ok, TRUE AS d95_ok,
        |  TRUE AS m25_ok, TRUE AS m50_ok, TRUE AS m75_ok, TRUE AS m95_ok
        |FROM lineitem""".stripMargin,
    "fn_percentile" ->
      """SELECT l_returnflag,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p25,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p50,
        |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p75,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS qty_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "fn_explode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE doc_id < 10)
        |SELECT doc_id,
        |  CAST(unnest(range(len(words))) AS INTEGER) AS pos,
        |  unnest(words) AS word
        |FROM t ORDER BY doc_id, pos""".stripMargin
  )
}
