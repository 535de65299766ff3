package graft.connector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Sessions
import graft.table.SnapshotLog

/** Randomized WALK over a bucketed table — the adversarial guard for the
  * storage-partitioned-join machinery: a seeded random sequence of
  * inserts, COW updates, COW deletes and OPTIMIZEs against a declared
  * bucket layout, with a driver-side model map as the oracle. After
  * EVERY step:
  *
  *  1. the table's contents equal the model (maintenance and the layout
  *     may only change the plan);
  *  2. an SPJ-enabled join against a co-bucketed REFERENCE table equals
  *     the model join — this is the assertion that matters most: a
  *     wrong KeyGroupedPartitioning report doesn't crash, it silently
  *     DROPS MATCHES, so only a content check through an actual
  *     SPJ-planned join can catch a proof gone bad;
  *  3. whenever the scan reports key-grouped partitioning, every
  *     row-bearing kept file records a singleton bucket id (the
  *     manifest proof is self-consistent).
  *
  * The walk is deterministic (fixed seed) so a failure replays. */
class BucketWalkSpec extends AnyFunSuite {

  lazy val spark = Sessions.local("4", "bucket-walk")

  test("random insert/update/delete/optimize walk keeps the SPJ proof honest") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bwalk").toString
    spark.conf.set("spark.sql.catalog.gbw",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbw.warehouse", base)
    val n = 4
    // the co-bucketed reference side: keys 0..199, value = key * 7
    spark.range(0, 200).selectExpr("id AS k", "id * 7 AS r")
      .write.format("graft").option("bucketBy", s"$n,k").save(s"$base/ref")
    // the walked table starts empty but DECLARED (CREATE + props)
    spark.sql(s"CREATE TABLE gbw.t (k BIGINT, v BIGINT) " +
      s"PARTITIONED BY (bucket($n, k))")
    val model = scala.collection.mutable.Map.empty[Long, Long]
    val rnd = new scala.util.Random(20260816L)

    def checkStep(step: Int, op: String): Unit = {
      // 1. contents == model
      val got = spark.sql("SELECT k, v FROM gbw.t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === model.toMap, s"step $step ($op): contents diverged")
      // 2. the SPJ-planned join == model join (the silent-drop guard)
      val prevB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.sql(
          """SELECT t.k, t.v, ref.r FROM gbw.t t
            |JOIN gbw.ref ref ON t.k = ref.k""".stripMargin).collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
        val expect = model.toMap.collect {
          case (k, v) if k >= 0 && k < 200 => k -> ((v, k * 7)) }
        assert(joined === expect,
          s"step $step ($op): SPJ join dropped or invented matches " +
            s"(got ${joined.size}, want ${expect.size})")
      } finally {
        prevB.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      }
      // 3. if the scan claims the layout, the manifest proof holds
      new GraftScanBuilder(spark, s"$base/t").build() match {
        case b: GraftV2BatchScan
            if b.outputPartitioning().isInstanceOf[
              org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning] =>
          val key = SnapshotLog.filesAt(spark, s"$base/t")
            .filter(f => f.kind == "data" && f.rows > 0)
          key.foreach { f =>
            val ids = f.parts.collectFirst {
              case (kk, vs) if kk.startsWith("bucket(") => vs }
            assert(ids.exists(_.size == 1),
              s"step $step ($op): reported layout but file ${f.path} " +
                s"records ${ids.getOrElse(Nil)}")
          }
        case _ => () // Unknown is always safe
      }
    }

    for (step <- 0 until 24) {
      val op = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 =>
          // insert a batch of (possibly repeated-later) keys
          val ks = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(250).toLong)
            .distinct.filterNot(model.contains)
          if (ks.nonEmpty) {
            ks.foreach(k => model(k) = k * 2)
            spark.sql("INSERT INTO gbw.t VALUES " +
              ks.map(k => s"($k, ${k * 2})").mkString(", "))
          }
          "insert"
        case 4 | 5 | 6 =>
          // COW update of a random residue class
          val m = 1 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          model.keys.toSeq.filter(k => Math.floorMod(k, m.toLong) == r)
            .foreach(k => model(k) = model(k) + 1)
          spark.sql(s"UPDATE gbw.t SET v = v + 1 WHERE pmod(k, $m) = $r")
          "update"
        case 7 | 8 =>
          // COW delete of a random key band
          val lo = rnd.nextInt(250)
          val hi = lo + rnd.nextInt(40)
          model.keys.toSeq.filter(k => k >= lo && k < hi)
            .foreach(model.remove)
          spark.sql(s"DELETE FROM gbw.t WHERE k >= $lo AND k < $hi")
          "delete"
        case _ =>
          spark.sql("OPTIMIZE gbw.t")
          "optimize"
      }
      checkStep(step, op)
    }
    // the walked table must have actually accumulated and mutated state
    assert(model.nonEmpty, "walk degenerated to an empty table")
  }
}
