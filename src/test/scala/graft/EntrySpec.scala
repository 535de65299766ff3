package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every registered query
  * runs and returns a readable result at sf0.001; every oracle key has a
  * matching query.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "entry-spec")
  val sf = "/root/testdata/sf0.001"

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("only the known estimator/hash-family queries lack oracles") {
    // every new operator must ship with a DuckDB oracle unless it is
    // genuinely un-replayable (engine-internal hash families, HLL); keep
    // this list in sync deliberately, not by omission
    val allowed = Set("dedup_minhash_candidates", "dedup_minhash_signatures",
      "dedup_simhash_pairs", "rel_q16_approx_distinct", "fn_approx_percentile")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == allowed,
      s"unexpected oracle-less queries: ${unoracled -- allowed}")
  }

  test("every query runs and is non-empty at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
