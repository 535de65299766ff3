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

  test("every registered query carries a DuckDB oracle") {
    // r4: the former estimator/hash-family allowlist (HLL, GK sketch,
    // MinHash/SimHash internals) is gone — those queries now register in
    // invariant-oracle form (exact values + bound booleans / planted-twin
    // containment), so 100% of the surface is driver-checkable.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"oracle-less queries: $unoracled")
  }

  test("every query runs and is non-empty at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
