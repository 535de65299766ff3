package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.schema.Tables

/** Event-stream analytics in batch form over `events` — the same logical
  * operations the Structured Streaming path ([[graft.stream.StreamSync]])
  * runs incrementally: tumbling-window aggregation, latest-state
  * materialization per key (the CDC upsert-compaction pattern the
  * reference's append-only sink never does), and gap-based sessionization.
  */
object Events {

  /** Tumbling 1-hour windows per event type (batch form of the streaming
    * windowed agg; epoch-aligned so window.start == date_trunc('hour')). */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sliding 1-hour windows every 15 minutes (overlap factor 4): the
    * Expand-style ×4 row replication happens map-side; one exchange on the
    * window start aggregates — same shape as the streaming sliding window
    * with watermark-bounded state. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes")
        .getField("start").as("window_start"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("window_start"))

  /** Latest-state materialization: one row per user — the newest event by
    * (ts, event_id). At scale: single hash-partition shuffle on user_id. */
  def latestState(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
              round(col("value"), 4).as("value"), col("ts"))
      .orderBy(col("user_id"))
  }

  /** Gap-based sessionization (30-min inactivity): lag + cumulative-sum of
    * session starts, then sessions per user. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull, 0)
          .when(unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg((sum(col("new_sess")) + 1).cast("long").as("n_sessions"),
           count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Native session_window sessionization in batch form — the same
    * operator the streaming path runs ([[graft.stream.StreamSync
    * .sessionCounts]]), here over the full history: per-user sessions
    * merge while events are within the 30-min gap; `end` is Spark's
    * last-event + gap convention. Complements [[sessionize]] (the
    * lag/cumsum composition): same partitioning (one hash exchange on
    * user_id), but the session assignment happens inside the native
    * SessionWindow aggregate instead of a window+groupBy pair. */
  def sessionWindowBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** As-of join: each `click` matched to the same user's latest
    * prior-or-simultaneous `purchase` (left as-of). Spark has no ASOF
    * operator; the scale-correct composition is union-the-sides + one
    * window per user carrying the last purchase payload forward
    * (`last(..., ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT) —
    * a single hash-partition shuffle on user_id, no range-join row
    * explosion, no per-row probe. Purchases sort before clicks at equal
    * ts so a same-instant purchase is visible (ASOF `>=` semantics). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"),
        lit(null).cast("long").as("p_event_id"),
        lit(null).cast("timestamp").as("p_ts"),
        lit(null).cast("double").as("p_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id"),
        col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .select(col("user_id"), col("ts"), col("side"), col("event_id"),
        last(col("p_event_id"), ignoreNulls = true).over(w).as("purchase_id"),
        last(col("p_ts"), ignoreNulls = true).over(w).as("purchase_ts"),
        last(col("p_value"), ignoreNulls = true).over(w).as("purchase_value"))
      .filter(col("side") === 1)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("purchase_id"), col("purchase_ts"),
        col("purchase_value"))
      .orderBy(col("click_id"))
  }

  /** Same as-of semantics through the NATIVE operator ([[graft.plans.AsOf]]):
    * marker → analyzer rule → custom logical node → strategy → co-partitioned
    * single-pass merge exec. One hash exchange per side + per-partition sort,
    * O(1) merge state — vs the composed variant's full-width union carried
    * through its window sort. Shares `ev_asof_join`'s DuckDB ASOF oracle. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    graft.plans.AsOf.join(clicks, purchases,
        Seq(col("user_id")), Seq(col("p_user")), col("ts"), col("p_ts"))
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("p_event_id").as("purchase_id"),
        col("p_ts").as("purchase_ts"), col("p_value").as("purchase_value"))
      .orderBy(col("click_id"))
  }

  /** The native operator's other two modes in one oracled query —
    * `toleranceMicros` + INNER ([[graft.plans.AsOfJoinExec]] supports both;
    * r3 oracled only left-outer/no-tolerance): each click joined to the
    * same user's latest prior-or-simultaneous purchase no older than 30
    * minutes, clicks with no in-tolerance purchase dropped. DuckDB states
    * the same semantics as ASOF (inner) JOIN + an age predicate — ASOF
    * picks the latest prior row first, then the predicate rejects stale
    * matches, exactly the exec's tolerance check on its held row. */
  def asofJoinTolerance(spark: SparkSession, dir: String,
                        toleranceMinutes: Int = 30): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    graft.plans.AsOf.join(clicks, purchases,
        Seq(col("user_id")), Seq(col("p_user")), col("ts"), col("p_ts"),
        joinType = "inner",
        toleranceMicros = Some(toleranceMinutes * 60L * 1000000L))
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("p_event_id").as("purchase_id"),
        col("p_ts").as("purchase_ts"), col("p_value").as("purchase_value"))
      .orderBy(col("click_id"))
  }

  /** Bounded-interval (range) join: purchases within 30 minutes AFTER each
    * click, per user. A naive range join explodes (every click × every
    * purchase per user); the scale composition buckets time into
    * window-sized slots and replicates only the SMALL side (each purchase
    * to its own and the previous bucket, ×2), so the equi-join on
    * (user_id, bucket) bounds candidates to adjacent slots and the exact
    * interval predicate filters inside the join. One keyed shuffle, no
    * row explosion beyond ×2. The oracle states the same semantics as a
    * plain inequality join — algorithm differs, result must not. */
  def rangeJoin(spark: SparkSession, dir: String, windowMinutes: Int = 30): DataFrame = {
    val ev = Tables.events(spark, dir)
    val win = windowMinutes * 60L * 1000000L // microseconds
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"),
        floor(unix_micros(col("ts")) / win).cast("long").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"),
        floor(unix_micros(col("ts")) / win).cast("long").as("pb"))
      .withColumn("bucket", explode(array(col("pb") - 1, col("pb"))))
      .drop("pb")
    clicks.join(purchases,
        clicks("user_id") === purchases("p_user") &&
          clicks("bucket") === purchases("bucket") &&
          col("p_ts") >= col("click_ts") &&
          unix_micros(col("p_ts")) - unix_micros(col("click_ts")) <= win,
        "left")
      .groupBy(col("click_id"), col("user_id"), col("click_ts"))
      .agg(count(col("p_value")).as("n_purchases"),
           round(coalesce(sum(col("p_value")), lit(0.0)), 2).as("purchase_value"))
      .orderBy(col("click_id"))
  }

  /** Ordered funnel over the signup cohort: first signup → first click
    * after it → first purchase after that click, per user; `stage` is how
    * far the user got (1–3). Each step is a keyed min-aggregate + left
    * join on user_id — one partitioning reused across all three steps (no
    * per-step reshuffle at scale), no window over the raw event stream,
    * and the event table is filtered by type BEFORE any join. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan + ONE user-keyed exchange (was: six scans of the events
    // table through a chain of per-stage self-joins — at scale, five
    // redundant corpus reads and three extra corpus shuffles). Each
    // user's stage timestamps fold from its collected per-type event
    // times: t_click = first click at/after signup, t_purchase = first
    // purchase at/after that click — same chained-min semantics, null
    // when a stage never happens. Per-user arrays are |that user's
    // events|-sized — the bounded-fanout assumption every per-user
    // funnel already makes.
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type").isin("signup", "click", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        collect_list(when(col("event_type") === "click", col("ts"))).as("clicks"),
        collect_list(when(col("event_type") === "purchase", col("ts"))).as("purchases"))
      .filter(col("t_signup").isNotNull)
      .withColumn("t_click",
        array_min(filter(col("clicks"), c => c >= col("t_signup"))))
      .withColumn("t_purchase",
        array_min(filter(col("purchases"), p => p >= col("t_click"))))
      .select(col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"),
        (lit(1) + col("t_click").isNotNull.cast("int") +
          col("t_purchase").isNotNull.cast("int")).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Conversion-window funnel — [[funnel]] with per-stage TIME BOUNDS,
    * the form product analytics actually ships (an unbounded funnel calls
    * a purchase two years after signup a conversion): the click must land
    * within `clickHours` of signup and the purchase within
    * `purchaseHours` of that click. Same dataflow as the unbounded form —
    * per-stage min-aggregation after a user-keyed equi-join; the window
    * is one more predicate inside the join, so candidate rows per user
    * SHRINK and the scale posture only improves. */
  def windowedFunnel(spark: SparkSession, dir: String,
                     clickHours: Int = 48, purchaseHours: Int = 48): DataFrame = {
    // same one-scan/one-exchange fold as [[funnel]]; the conversion
    // window is two more predicates inside the per-user array filters
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type").isin("signup", "click", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        collect_list(when(col("event_type") === "click", col("ts"))).as("clicks"),
        collect_list(when(col("event_type") === "purchase", col("ts"))).as("purchases"))
      .filter(col("t_signup").isNotNull)
      .withColumn("t_click",
        array_min(filter(col("clicks"), c => c >= col("t_signup") &&
          c <= col("t_signup") + expr(s"INTERVAL $clickHours HOURS"))))
      .withColumn("t_purchase",
        array_min(filter(col("purchases"), p => p >= col("t_click") &&
          p <= col("t_click") + expr(s"INTERVAL $purchaseHours HOURS"))))
      .select(col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"),
        (lit(1) + col("t_click").isNotNull.cast("int") +
          col("t_purchase").isNotNull.cast("int")).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention matrix: users grouped by first-active day, counted
    * on each later active day (day_offset 0, 1, 2, …). Two keyed aggs —
    * distinct (user, day) activity and min-day cohort — joined on
    * user_id, then one count-distinct per (cohort, offset) cell. The raw
    * event stream collapses to per-user-per-day rows before anything
    * joins, so the matrix agg sees |users|·|days| rows, not |events|. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val active = ev.select(col("user_id"),
      date_trunc("day", col("ts")).as("day")).distinct()
    val cohort = active.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Per-(user, event_type) value anomalies: z-score each event against
    * its own group's distribution, keep |z| ≥ 2.5. One keyed aggregate
    * builds the (mean, stddev) stats table (map-side partials), which
    * joins back on the same key — at scale the stats side is
    * |users × types| rows, so the join reuses the aggregation's hash
    * partitioning and the raw stream shuffles once. The monitoring /
    * data-quality primitive over the CDC event stream.
    *
    * Oracle note: row MEMBERSHIP filters on a float threshold, so a z
    * within accumulation-order drift (~1e-12 relative) of `zMin` could in
    * principle differ across engines; measured on every testdata sf the
    * nearest |z| sits ≥1e-4 from the boundary — 8 orders of magnitude of
    * margin — and a continuous z has measure zero at the boundary under
    * regeneration. */
  def anomalies(spark: SparkSession, dir: String, zMin: Double = 2.5): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.groupBy(col("user_id"), col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
    val z = (col("value") - col("mu")) / col("sd")
    ev.join(stats, Seq("user_id", "event_type"))
      .filter(col("sd").isNotNull && col("sd") > 0 && abs(z) >= zMin)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value"), round(z, 4).as("z"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_anomaly" -> ((s, d) => anomalies(s, d)),
    "ev_retention" -> retention,
    "ev_funnel" -> funnel,
    "ev_funnel_windowed" -> ((s, d) => windowedFunnel(s, d)),
    "ev_range_join" -> ((s, d) => rangeJoin(s, d)),
    "ev_tumbling" -> tumbling,
    "ev_sliding" -> sliding,
    "ev_latest_state" -> latestState,
    "ev_sessionize" -> sessionize,
    "ev_session_window" -> sessionWindowBatch,
    "ev_asof_join" -> asofJoin,
    "ev_asof_join_native" -> asofJoinNative,
    "ev_asof_join_tolerance" -> ((s, d) => asofJoinTolerance(s, d))
  )

  val oracles: Map[String, String] = Map(
    // same stats join replayed; avg/stddev_samp parity at round-4 is the
    // fn_stats precedent
    "ev_anomaly" ->
      """WITH s AS (SELECT user_id, event_type, avg("value") AS mu,
        |             stddev_samp("value") AS sd
        |           FROM events GROUP BY user_id, event_type)
        |SELECT e.event_id, e.user_id, e.event_type,
        |  round(e."value", 4) AS value,
        |  round((e."value" - s.mu) / s.sd, 4) AS z
        |FROM events e JOIN s USING (user_id, event_type)
        |WHERE s.sd IS NOT NULL AND s.sd > 0
        |  AND abs((e."value" - s.mu) / s.sd) >= 2.5
        |ORDER BY event_id""".stripMargin,
    "ev_retention" ->
      """WITH active AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM active GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(datediff('day', c.cohort_day, a.day) AS INTEGER) AS day_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY c.cohort_day, datediff('day', c.cohort_day, a.day)
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "ev_funnel" ->
      """WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.t_signup
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.t_click
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT s.user_id, s.t_signup, c.t_click, p.t_purchase,
        |  CAST(1 + (c.t_click IS NOT NULL)::INT + (p.t_purchase IS NOT NULL)::INT
        |       AS INTEGER) AS stage
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |       LEFT JOIN p ON s.user_id = p.user_id
        |ORDER BY s.user_id""".stripMargin,
    // same funnel with 48h conversion windows on each stage
    "ev_funnel_windowed" ->
      """WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN s ON e.user_id = s.user_id
        |        AND e.ts >= s.t_signup
        |        AND e.ts <= s.t_signup + INTERVAL 48 HOUR
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |        AND e.ts >= c.t_click
        |        AND e.ts <= c.t_click + INTERVAL 48 HOUR
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT s.user_id, s.t_signup, c.t_click, p.t_purchase,
        |  CAST(1 + (c.t_click IS NOT NULL)::INT + (p.t_purchase IS NOT NULL)::INT
        |       AS INTEGER) AS stage
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |       LEFT JOIN p ON s.user_id = p.user_id
        |ORDER BY s.user_id""".stripMargin,
    // DuckDB's native ASOF JOIN is the reference semantics for the engine's
    // union+window composition (event timestamps are unique, so the match
    // is deterministic on both sides)
    "ev_asof_join" ->
      """SELECT l.event_id AS click_id, l.user_id, l.ts AS click_ts,
        |  r.event_id AS purchase_id, r.ts AS purchase_ts,
        |  r."value" AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY click_id""".stripMargin,
    "ev_asof_join_native" ->
      """SELECT l.event_id AS click_id, l.user_id, l.ts AS click_ts,
        |  r.event_id AS purchase_id, r.ts AS purchase_ts,
        |  r."value" AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY click_id""".stripMargin,
    // inner ASOF picks the latest prior purchase, then the age predicate
    // rejects stale matches — the exec's tolerance check on its held row
    "ev_asof_join_tolerance" ->
      """SELECT l.event_id AS click_id, l.user_id, l.ts AS click_ts,
        |  r.event_id AS purchase_id, r.ts AS purchase_ts,
        |  r."value" AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |WHERE epoch_us(l.ts) - epoch_us(r.ts) <= 30 * 60 * 1000000
        |ORDER BY click_id""".stripMargin,
    "ev_range_join" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |  count(p."value") AS n_purchases,
        |  round(coalesce(sum(p."value"), 0), 2) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts >= c.ts
        |  AND epoch_us(p.ts) - epoch_us(c.ts) <= 30 * 60 * 1000000
        |GROUP BY c.event_id, c.user_id, c.ts
        |ORDER BY click_id""".stripMargin,
    "ev_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, round(sum("value"), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    // each event belongs to exactly 4 of the 15-min-slide 1-hour windows;
    // window_start = 15-min epoch floor minus i*15min, i in 0..3
    "ev_sliding" ->
      """WITH w AS (
        |  SELECT make_timestamp(((epoch_us(ts) // 900000000) - i) * 900000000)
        |           AS window_start, "value"
        |  FROM events, unnest(generate_series(0, 3)) AS t(i))
        |SELECT window_start, count(*) AS n, round(sum("value"), 2) AS sum_value
        |FROM w GROUP BY window_start ORDER BY window_start""".stripMargin,
    "ev_latest_state" ->
      """SELECT user_id, event_id, event_type, round("value", 4) AS value, ts FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events) t
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,
    // gap-merge replay: session id from the lag/cumsum composition; end
    // is Spark's last-event + gap convention
    "ev_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |              > 1800 * 1000000 THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "ev_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 0
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |              > 1800 * 1000000 THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM events)
        |SELECT user_id, CAST(sum(new_sess) + 1 AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
