package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AsOf, AsOfJoinExec}

/** Pins the native as-of join stack (marker → rule → logical node →
  * strategy → merge exec): value semantics against hand-built fixtures and
  * the composed window variant, inner/tolerance modes, null handling, and
  * the physical plan shape (AsOfJoinExec fed by hash exchange + sort on
  * each side — the SortMergeJoin-class scale posture).
  */
class PlansSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "plans-spec")
  val sf = "/root/testdata/sf0.001"

  import java.sql.Timestamp
  private def t(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))

  private def fixture() = {
    import spark.implicits._
    val left = Seq(
      (101L, 1L, t(20)), (103L, 1L, t(30)), (104L, 1L, t(5)), (105L, 2L, t(50)))
      .toDF("click_id", "user_id", "ts")
    val right = Seq(
      (100L, 1L, t(10), 5.0), (102L, 1L, t(30), 7.0), (200L, 3L, t(1), 9.0))
      .toDF("p_event_id", "p_user", "p_ts", "p_value")
    (left, right)
  }

  test("native as-of: latest prior-or-equal match, null when none") {
    val (left, right) = fixture()
    val got = AsOf.join(left, right, Seq(col("user_id")), Seq(col("p_user")),
        col("ts"), col("p_ts"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // click@20 → purchase@10; click@30 → same-instant purchase@30 (>= semantics);
    // click@5 → none; user 2 → none
    assert(got == Map(101L -> 100L, 103L -> 102L, 104L -> -1L, 105L -> -1L))
  }

  test("native as-of: inner drops unmatched; tolerance bounds the lookback") {
    val (left, right) = fixture()
    val inner = AsOf.join(left, right, Seq(col("user_id")), Seq(col("p_user")),
        col("ts"), col("p_ts"), joinType = "inner")
      .collect().map(_.getLong(0)).toSet
    assert(inner == Set(101L, 103L))
    // 5-second tolerance: click@20 is 10 s after purchase@10 → no match;
    // click@30 matches the same-instant purchase (gap 0).
    val tol = AsOf.join(left, right, Seq(col("user_id")), Seq(col("p_user")),
        col("ts"), col("p_ts"), toleranceMicros = Some(5L * 1000000L))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(tol == Map(101L -> -1L, 103L -> 102L, 104L -> -1L, 105L -> -1L))
  }

  test("native as-of: null keys and null times never match") {
    import spark.implicits._
    val left = Seq((1L, Option(7L), Option(t(20))), (2L, None, Option(t(20))),
        (3L, Option(7L), None))
      .toDF("id", "user_id", "ts")
    val right = Seq((10L, Option(7L), Option(t(10))), (11L, None, Option(t(1))),
        (12L, Option(7L), None))
      .toDF("rid", "r_user", "r_ts")
    val got = AsOf.join(left, right, Seq(col("user_id")), Seq(col("r_user")),
        col("ts"), col("r_ts"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // only the non-null (key, time) pair matches; null-key / null-time left
    // rows survive as unmatched (left outer), never joined to null-key rows
    assert(got == Map(1L -> 10L, 2L -> -1L, 3L -> -1L))
  }

  test("native as-of ≡ composed union+window variant on real events (sf0.001)") {
    val native = graft.ops.Events.asofJoinNative(spark, sf)
    val composed = graft.ops.Events.asofJoin(spark, sf)
    assert(native.schema.fieldNames.toSeq == composed.schema.fieldNames.toSeq)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("plan shape: AsOfJoinExec with one hash exchange + sort per side") {
    val df = graft.ops.Events.asofJoinNative(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ")) // AsOfJoinExec renders as "AsOfJoin"
    // each side: Exchange hashpartitioning(user key) then Sort (key, time)
    assert("hashpartitioning\\((user_id|p_user)".r.findAllIn(plan).length >= 2)
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts >= 2, s"expected per-side sorts in:\n$plan")
    // rows actually flow through the custom exec
    assert(df.count() > 0)
  }
}
