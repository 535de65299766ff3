package graft.tools

import graft.Sessions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-probe for the r15 optimization round: time labelled
  * sub-plans of expensive queries in isolation (same session settings as
  * Bench). Usage: runMain graft.tools.OptProbe <sfDir> <probe> [...]
  */
object OptProbe {
  def time(name: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"PROBE $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  /** noop-sink timing (guide §1.4): computes EVERY column, defeating the
    * count()-pruning that hides aggregate cost. */
  def timeNoop(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"PROBE $name: noop in ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes = args.drop(1).toSet
    val spark = Sessions.local(appName = "graft-optprobe")
    spark.range(1000).selectExpr("sum(id)").count() // warm-up
    def want(p: String) = probes.isEmpty || probes.contains(p)
    import graft.schema.Tables

    if (want("quantile")) {
      import graft.functions.GraftFunctions.{quantile_merge, quantile_sketch}
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("price"), col("l_shipdate"))
      (1 to 2).foreach { pass =>
        time(s"q.exact_percentile p$pass")(
          li.agg(expr("percentile(price, array(0.25, 0.5, 0.75, 0.95))")).count())
        time(s"q.direct_sketch p$pass")(
          li.agg(quantile_sketch(col("price"))).count())
        time(s"q.month_sketch_merge p$pass")(
          li.groupBy(date_trunc("month", col("l_shipdate")).as("epoch"))
            .agg(quantile_sketch(col("price")).as("sk"))
            .agg(quantile_merge(col("sk"))).count())
        time(s"q.rank_pass p$pass")(
          li.agg(sum((col("price") <= 1000.0).cast("long")), count(lit(1))).count())
        val lip = Tables.parallelized(li)
        time(s"q.exact_percentile_par p$pass")(
          lip.agg(expr("percentile(price, array(0.25, 0.5, 0.75, 0.95))")).count())
        time(s"q.direct_sketch_par p$pass")(
          lip.agg(quantile_sketch(col("price"))).count())
        time(s"q.month_sketch_merge_par p$pass")(
          lip.groupBy(date_trunc("month", col("l_shipdate")).as("epoch"))
            .agg(quantile_sketch(col("price")).as("sk"))
            .agg(quantile_merge(col("sk"))).count())
      }
    }

    if (want("qparts")) {
      import graft.functions.GraftFunctions.{quantile_merge, quantile_sketch, quantile_value}
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("price"), col("l_shipdate"))
      (1 to 3).foreach { pass =>
        val merged = li
          .groupBy(date_trunc("month", col("l_shipdate")).as("epoch"))
          .agg(quantile_sketch(col("price")).as("sk"))
          .agg(quantile_merge(col("sk")).as("msk"))
        val direct = li.agg(
          quantile_sketch(col("price")).as("dsk"),
          expr("percentile(price, array(0.25, 0.5, 0.75, 0.95))").as("exact"))
        val ests = direct.crossJoin(merged).select(
          round(element_at(col("exact"), 1), 4).as("price_p25"),
          quantile_value(col("dsk"), 0.25).as("d25"),
          quantile_value(col("msk"), 0.25).as("m25"))
        timeNoop(s"q.exact_only p$pass")(
          li.agg(expr("percentile(price, array(0.25, 0.5, 0.75, 0.95))").as("exact")))
        timeNoop(s"q.sketch_only p$pass")(li.agg(quantile_sketch(col("price")).as("dsk")))
        timeNoop(s"q.combined_direct p$pass")(direct)
        timeNoop(s"q.month_merge p$pass")(merged)
        timeNoop(s"q.ests p$pass")(ests)
        timeNoop(s"q.final_literal p$pass")(
          li.crossJoin(broadcast(spark.range(1).select(lit(1000.0).as("price_p25"))))
            .groupBy(col("price_p25"))
            .agg(count(lit(1)), sum((col("price") <= col("price_p25")).cast("long"))))
        val pl = Tables.parallelized(li)
        timeNoop(s"q.exact_only_par p$pass")(
          pl.agg(expr("percentile(price, array(0.25, 0.5, 0.75, 0.95))").as("exact")))
        timeNoop(s"q.month_merge_par p$pass")(
          pl.groupBy(date_trunc("month", col("l_shipdate")).as("epoch"))
            .agg(quantile_sketch(col("price")).as("sk"))
            .agg(quantile_merge(col("sk")).as("msk")))
      }
    }

    if (want("qmonth")) {
      import graft.functions.GraftFunctions.{quantile_merge, quantile_sketch}
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("price"), col("l_shipdate"))
      (1 to 3).foreach { pass =>
        timeNoop(s"m.trunc_count p$pass")(
          li.groupBy(date_trunc("month", col("l_shipdate")).as("epoch"))
            .agg(count(lit(1))))
        timeNoop(s"m.longdiv_count p$pass")(
          li.groupBy((unix_micros(col("l_shipdate").cast("timestamp")) / lit(86400000000L)).as("epoch"))
            .agg(count(lit(1))))
        timeNoop(s"m.trunc_sketch p$pass")(
          li.groupBy(date_trunc("month", col("l_shipdate")).as("epoch"))
            .agg(quantile_sketch(col("price")).as("sk"))
            .agg(quantile_merge(col("sk"))))
        timeNoop(s"m.global_sketch p$pass")(li.agg(quantile_sketch(col("price"))))
      }
    }

    if (want("qrank")) {
      import org.apache.spark.sql.expressions.Window
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("price"))
      val qs = Seq(0.25, 0.5, 0.75, 0.95)
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        val parts = spark.sparkContext.defaultParallelism
        val exch = li.filter(col("price").isNotNull).repartitionByRange(parts, col("price"))
        val offs = exch.groupBy(spark_partition_id().as("_pid")).agg(count(lit(1)).as("_cnt"))
          .select(col("_pid"),
            coalesce(sum(col("_cnt")).over(Window.orderBy(col("_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("_off"),
            sum(col("_cnt")).over(Window.orderBy(lit(1))
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("_n"))
        val ranked = exch.sortWithinPartitions(col("price"))
          .withColumn("_mid", monotonically_increasing_id())
          .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
          .join(broadcast(offs), "_pid")
          .withColumn("_rank", col("_off") + col("_mid").bitwiseAND(lit((1L << 33) - 1)))
        def pos(q: Double) = (col("_n") - lit(1L)).cast("double") * lit(q)
        val keep = qs.map(q => col("_rank") === floor(pos(q)) ||
          col("_rank") === ceil(pos(q))).reduce(_ || _)
        val aggs = qs.zipWithIndex.flatMap { case (q, i) => Seq(
          max(when(col("_rank") === floor(pos(q)), col("price"))).as(s"_lo$i"),
          max(when(col("_rank") === ceil(pos(q)), col("price"))).as(s"_hi$i"),
          max(pos(q)).as(s"_pos$i")) }
        val out = ranked.filter(keep)
          .agg(aggs.head, aggs.tail: _*)
          .select(qs.indices.map { i =>
            val (lo, hi, p) = (col(s"_lo$i"), col(s"_hi$i"), col(s"_pos$i"))
            when(lo === hi, lo)
              .otherwise((ceil(p).cast("double") - p) * lo +
                (p - floor(p).cast("double")) * hi).as(s"p$i")
          }: _*)
        val row = out.collect()(0)
        println(f"PROBE rank.percentiles p$pass: ${(System.nanoTime() - t0) / 1e9}%.3f s -> $row")
        val t1 = System.nanoTime()
        val ref = li.agg(expr("percentile(price, array(0.25, 0.5, 0.75, 0.95))")).collect()(0)
        println(f"PROBE rank.reference p$pass: ${(System.nanoTime() - t1) / 1e9}%.3f s -> $ref")
      }
    }

    if (want("rankcheck")) {
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
      val r = graft.ops.GlobalRank.ranked(ev, Seq(col("tus"), col("event_id")),
        spark.sparkContext.defaultParallelism)
      val chk = r.agg(count(lit(1)).as("n"),
        countDistinct(col("_rank")).as("nd"),
        min(col("_rank")).as("mn"), max(col("_rank")).as("mx"),
        max(col("_n")).as("N")).collect()(0)
      println(s"PROBE rankcheck: $chk")
      val nt = graft.ops.GlobalRank.ntileRanked(ev, Seq(col("tus"), col("event_id")), 64,
        spark.sparkContext.defaultParallelism)
      val b = nt.groupBy(col("file_id")).count()
        .agg(count(lit(1)), min("count"), max("count"), min("file_id"), max("file_id")).collect()(0)
      println(s"PROBE ntilecheck: $b")
      val evc = ev.localCheckpoint(true)
      val ntc = graft.ops.GlobalRank.ntileRanked(evc, Seq(col("tus"), col("event_id")), 64,
        spark.sparkContext.defaultParallelism)
      val bc = ntc.groupBy(col("file_id")).count()
        .agg(count(lit(1)), min("count"), max("count"), min("file_id"), max("file_id")).collect()(0)
      println(s"PROBE ntilecheck-ckpt: $bc")
      val rc = graft.ops.GlobalRank.ranked(evc, Seq(col("tus"), col("event_id")),
        spark.sparkContext.defaultParallelism)
        .agg(count(lit(1)), countDistinct(col("_rank")), min(col("_rank")),
          max(col("_rank")), max(col("_n"))).collect()(0)
      println(s"PROBE rankcheck-ckpt: $rc")
      println("PROBE zq: " + graft.llm.Curation.zorderLayout(spark, dir).collect().mkString("; "))
    }

    if (want("containment")) {
      (1 to 3).foreach { pass =>
        val sh0 = Tables.parallelized(Tables(spark, dir, "documents"))
          .select(col("doc_id"), graft.llm.TextOps.shingles(col("text")).as("sh"))
          .filter(size(col("sh")) > 0)
        val t0 = System.nanoTime()
        val sh = sh0.localCheckpoint(true)
        println(f"PROBE c.checkpoint p$pass: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        val postings = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        timeNoop(s"c.postings p$pass")(postings)
        val rare = postings.groupBy(col("g"))
          .agg(count(lit(1)).as("df")).filter(col("df") <= 50).select(col("g"))
        timeNoop(s"c.rare p$pass")(rare)
        val capped = postings.join(rare, "g")
        timeNoop(s"c.capped p$pass")(capped)
        val shared = capped.as("a")
          .join(capped.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_shared"))
        timeNoop(s"c.shared p$pass")(shared)
        timeNoop(s"c.full p$pass")(graft.llm.Dedup.containment(spark, dir))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
    }

    if (want("text")) {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(spark, dir, "documents")
      (1 to 3).foreach { pass =>
        timeNoop(s"t.tfidf_asis p$pass")(graft.llm.TextOps.tfidfTopK(spark, dir))
        // variant: checkpoint tf
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
          .localCheckpoint(true)
        val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val score = col("tf") * log(col("n_docs").cast("double") / col("df"))
        timeNoop(s"t.tfidf_ckpt p$pass")(
          tf.join(broadcast(dfr), "token")
            .crossJoin(broadcast(nDocs))
            .withColumn("rk", row_number().over(
              Window.partitionBy(col("doc_id")).orderBy(score.desc, col("token"))))
            .filter(col("rk") <= 3)
            .select(col("doc_id"), col("rk"), col("token"), round(score, 6).as("tfidf"))
            .orderBy(col("doc_id"), col("rk")))
        timeNoop(s"t.bm25_asis p$pass")(graft.llm.TextOps.bm25TopK(spark, dir))
        // tokenize-only floor
        timeNoop(s"t.tokenize p$pass")(
          docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
            .filter(col("token") =!= "")
            .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
        // parallelized tokenize
        timeNoop(s"t.tokenize_par p$pass")(
          Tables.parallelized(docs).select(col("doc_id"),
            explode(split(col("text"), " ")).as("token"))
            .filter(col("token") =!= "")
            .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
    }

    if (want("lsh")) {
      import graft.functions.GraftFunctions
      import graft.llm.TextOps
      (1 to 3).foreach { pass =>
        val docs = Tables.parallelized(Tables(spark, dir, "documents"))
        val t0 = System.nanoTime()
        val sigs = docs
          .select(col("doc_id"),
            GraftFunctions.minhash_signature(TextOps.shingleHashes(col("text")), 128).as("sig"))
          .filter(col("sig").isNotNull)
          .localCheckpoint(true)
        println(f"PROBE l.signatures p$pass: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        val t1 = System.nanoTime()
        val sh = docs
          .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
          .localCheckpoint(true)
        println(f"PROBE l.shingles p$pass: ${(System.nanoTime() - t1) / 1e9}%.3f s")
        timeNoop(s"l.jaccard_full p$pass")(graft.llm.Dedup.ngramJaccard(spark, dir))
        timeNoop(s"l.minhash_cands p$pass")(graft.llm.Dedup.minhashCandidates(spark, dir))
        timeNoop(s"l.keepers p$pass")(graft.llm.Dedup.resolveKeepers(spark, dir))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
    }

    if (want("zplan")) {
      // the at-scale (distributed-rank) plan of cur_zorder_layout — the
      // adaptive guard takes the window path on the tiny local fixture,
      // so force the distributed path to pin its plan shape
      spark.conf.set("graft.rank.distributedMinBytes", "0")
      println(s"===== cur_zorder_layout (distributed path) =====")
      graft.llm.Curation.zorderLayout(spark, dir).explain("formatted")
      spark.conf.unset("graft.rank.distributedMinBytes")
    }

    if (want("qfull")) {
      val lst = new org.apache.spark.scheduler.SparkListener {
        val jobs = scala.collection.mutable.Map.empty[Int, Long]
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs(j.jobId) = j.time
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          println(f"PROBE-JOB ${j.jobId} ${(j.time - jobs.getOrElse(j.jobId, j.time)) / 1e3}%.3f s")
      }
      spark.sparkContext.addSparkListener(lst)
      (1 to 3).foreach { pass =>
        time(s"q.full p$pass")(
          graft.ops.Functions.fQuantileSketchEpochs(spark, dir).count())
      }
    }

    spark.stop()
  }
}
