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

  test("shingle_hashes via SQL equals the built-in HOF composition") {
    val row = spark.sql(
      """WITH d AS (SELECT 'the quick brown fox jumps over the lazy dog' AS t)
        |SELECT shingle_hashes(t) AS fast,
        |       transform(array_distinct(transform(
        |         sequence(0, size(split(t, ' ')) - 3),
        |         i -> concat_ws(' ', slice(split(t, ' '), i + 1, 3)))),
        |         s -> xxhash64(s)) AS slow
        |FROM d""".stripMargin).head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    // short doc (< k words) -> empty shingle set
    val short = spark.sql("SELECT size(shingle_hashes('one two')) AS s").head().getInt(0)
    assert(short == 0)
  }

  test("shingles via SQL equals the built-in HOF composition") {
    val row = spark.sql(
      """WITH d AS (SELECT 'a b c a b c d' AS t)
        |SELECT shingles(t) AS fast,
        |       array_distinct(transform(
        |         sequence(0, size(split(t, ' ')) - 3),
        |         i -> concat_ws(' ', slice(split(t, ' '), i + 1, 3)))) AS slow
        |FROM d""".stripMargin).head()
    assert(row.getSeq[String](0) == row.getSeq[String](1))
  }

  test("zvalue via SQL equals the HOF interleave and is codegen'd") {
    val got = spark.sql(
      """SELECT x, y, zvalue(x, y, 8) AS z,
        |  aggregate(sequence(0, 7), 0L, (acc, i) ->
        |    acc + shiftleft(shiftright(x, i) & 1, 2*i + 1)
        |        + shiftleft(shiftright(y, i) & 1, 2*i)) AS z_hof
        |FROM VALUES (0L, 0L), (255L, 0L), (0L, 255L), (170L, 85L), (7L, 200L)
        |  AS t(x, y)""".stripMargin).collect()
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"native zvalue must equal the HOF fold: $r")
    }
    // known value: full x bits at odd positions = 0b10101...10 = 0xAAAA
    assert(got.find(r => r.getLong(0) == 255L && r.getLong(1) == 0L)
      .get.getLong(2) == 0xAAAAL)
    // the "*(n)" stage prefix marks whole-stage-codegen participation; a
    // CodegenFallback expression would break the projection out of it
    val plan = spark.sql("SELECT zvalue(id, id) FROM range(10)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"zvalue must stay in codegen:\n$plan")
  }

  test("big_endian_decimal via SQL") {
    val d = spark.sql("SELECT big_endian_decimal(unbase64('MDk=')) AS d").head().getDecimal(0)
    assert(d == new java.math.BigDecimal("123.45"))
  }
}
