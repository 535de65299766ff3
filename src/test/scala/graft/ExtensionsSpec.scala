package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions registered through SparkSessionExtensions are
  * callable from plain SQL. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // other suites may have built a session without extensions in this JVM;
    // clear so getOrCreate constructs a fresh one with ours injected
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("extensions-spec")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("vec_cosine via SQL") {
    val r = spark.sql(
      "SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))," +
        " array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-9)
  }

  test("simhash64 / minhash_signature / rolling_hash via SQL") {
    val row = spark.sql(
      """SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS sh,
        |       size(minhash_signature(array(xxhash64('a')), 16, 7)) AS msz,
        |       rolling_hash('abc') AS rh""".stripMargin).head()
    assert(!row.isNullAt(0))
    assert(row.getAs[Int]("msz") == 16)
    assert(row.getAs[Long]("rh") ==
      (('a'.toLong * 1000003L + 'b'.toLong) * 1000003L + 'c'.toLong))
  }

  test("big_endian_decimal via SQL") {
    val d = spark.sql("SELECT big_endian_decimal(unbase64('MDk=')) AS d").head().getDecimal(0)
    assert(d == new java.math.BigDecimal("123.45"))
  }
}
