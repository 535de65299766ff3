package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Curation

/** Invariant tests for the corpus-curation operators (their value-level
  * correctness is DuckDB-oracled; these pin the semantic properties the
  * oracle can't see — determinism, bucket shape, eval-set exclusion).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "curation-spec")
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("logistic quality model: 1/L-step descent is monotone, beats majority") {
    val m = graft.llm.Curation.qualityModelFit(spark, sf)
    assert(m.history.nonEmpty && m.history.size <= 30)
    // the Lipschitz step size makes every iteration decrease the loss
    val losses = m.history.map(_.loss)
    losses.zip(losses.drop(1)).foreach { case (a, b) =>
      assert(b <= a + 1e-9, s"loss increased: $a -> $b in ${m.history}")
    }
    assert(m.history.last.gradNorm <= m.history.head.gradNorm)
    assert(m.weights.length == 4 && m.weights.forall(w => !w.isNaN && !w.isInfinity))
    assert(m.nPos + m.nNeg > 0)
    // a fitted model can never do worse than predicting the majority class
    // on its own training set (it starts AT the prior and descends)
    assert(m.accuracy >= m.majority - 1e-9,
      s"accuracy ${m.accuracy} below majority ${m.majority}")
  }

  test("temperature mixture flattens toward small sources; novelty starts total") {
    val t = Curation.mixtureTemperature(spark, sf).collect()
    assert(t.length == 20)
    assert(math.abs(t.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-4)
    // α < 1 compresses ratios: below-average sources boost ≥ 1,
    // above-average ones ≤ 1 (monotone flattening, never inversion)
    val mean = 1.0 / t.length
    t.foreach { r =>
      val (share, boost) = (r.getAs[Double]("actual_share"), r.getAs[Double]("boost"))
      if (share < mean - 1e-9) assert(boost >= 1.0, s"small source must boost: $r")
      if (share > mean + 1e-9) assert(boost <= 1.0, s"big source must shrink: $r")
    }
    val nv = Curation.ngramNovelty(spark, sf).collect()
    assert(nv.length == 20)
    val first = nv.find(_.getAs[Int]("epoch") == 0).get
    assert(first.getAs[Long]("novelty_ppm") == 1000000L,
      "every gram of the first epoch is new by definition")
    nv.foreach(r => assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_grams")))
  }

  test("weighted sample: deterministic, TakeOrdered plan, biased toward weight") {
    val df = Curation.sampleWeighted(spark, sf)
    val a = df.collect()
    val b = Curation.sampleWeighted(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "content-addressed draw must be reproducible")
    assert(a.length == 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"must not global-sort:\n$plan")
    // E-S with w = n_chars: the sample over-represents long documents
    // (deterministic for the fixed corpus + hash)
    val corpus = Curation.splitAssign(spark, sf).count() // |docs|
    val corpusMean = graft.schema.Tables(spark, sf, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val sampleMean = a.map(_.getAs[Long]("n_chars")).sum.toDouble / a.length
    assert(a.length < corpus, "sample must be proper")
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("z-order layout skips on the narrow dim where ingest order cannot") {
    val rows = Curation.zorderLayout(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("scan_user"),
         r.getAs[Long]("scan_time"), r.getAs[Long]("scan_both")))
      .toMap
    val (nf, ingU, _, ingB) = rows("ingest")
    val (nfz, zU, zT, zB) = rows("zorder")
    assert(nf == 64 && nfz == 64)
    // ingest order carries no user locality: every file hits the user range
    assert(ingU == nf, "time-sorted files should all intersect the user range")
    // z-order must skip most files on the user predicate AND keep real
    // time skipping — the multi-dimensional locality the curve exists for
    assert(zU <= nf / 2, s"z-order should skip >= half the files on user, scanned $zU")
    assert(zT <= nf / 2, s"z-order should keep time skipping, scanned $zT")
    assert(zB <= math.min(zU, zT) && ingB <= nf)
  }

  test("split assignment is deterministic, total, and 3-way") {
    val a = Curation.splitAssign(spark, sf).collect()
    val b = Curation.splitAssign(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "same corpus must yield identical splits")
    val bySplit = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit.values.sum == a.length)
    // 12/2/2 hex-bucket design: train strictly dominates the other splits
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("scrub redacts emails/urls/digit-runs and is idempotent on clean text") {
    val df = Seq(
      (1L, "contact me at a.b@example.com or https://x.org/p?q=1 ref 123456"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("curation_scrub_probe")
    // same regex chain as Curation.scrub, applied to a crafted frame
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^ ]+"
    val digits = "[0-9]{4,}"
    val out = df.select($"doc_id",
      regexp_count($"text", lit(email)).as("n_emails"),
      regexp_count($"text", lit(url)).as("n_urls"),
      regexp_count($"text", lit(digits)).as("n_num"),
      regexp_replace(regexp_replace(regexp_replace($"text", email, "<EMAIL>"),
        url, "<URL>"), digits, "<NUM>").as("clean"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Int]("n_emails") == 1)
    assert(out(0).getAs[Int]("n_urls") == 1)
    assert(out(0).getAs[Int]("n_num") == 1)
    assert(out(0).getAs[String]("clean") ==
      "contact me at <EMAIL> or <URL> ref <NUM>")
    assert(out(1).getAs[String]("clean") == "no pii here at all")
  }

  test("repetition fractions are well-formed probabilities") {
    val rows = Curation.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getAs[Double]("top_word_fraction")
      val dup = r.getAs[Double]("dup_word_fraction")
      val big = r.getAs[Double]("top_bigram_fraction")
      assert(top > 0 && top <= 1, s"top_word_fraction $top")
      assert(dup >= 0 && dup < 1, s"dup_word_fraction $dup")
      assert(big > 0 && big <= 1, s"top_bigram_fraction $big")
      // a doc's most frequent word is at least as common as uniform
      // (fractions are rounded to 4 decimals, hence the epsilon)
      assert(top * r.getAs[Long]("n_words") >= 1.0 - 1e-3)
    }
  }

  test("decontamination excludes the eval set and self-flags clones of it") {
    val rows = Curation.decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % 97 != 0), "eval docs must not be scored")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0)
      assert(r.getAs[Boolean]("contaminated") == (n >= Curation.ContaminationThreshold))
    }
  }

  test("pipeline summary conserves rows across the composed stages") {
    val summary = Curation.pipelineSummary(spark, sf).collect()
    assert(summary.nonEmpty)
    val total = summary.map(_.getAs[Long]("n_docs")).sum
    // never more docs out than in, and the quality gate plus dedup keep a
    // sane majority of the synthetic corpus
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total <= corpus && total > 0)
    // splits present and disjoint by construction
    val splits = summary.map(_.getAs[String]("split")).distinct.sorted
    assert(splits.forall(Set("train", "val", "test")))
  }

  test("stratified sample takes at most k per stratum, deterministically") {
    val k = 5
    val rows = Curation.sampleStratified(spark, sf, k).collect()
    assert(rows.nonEmpty)
    val perSource = rows.groupBy(_.getAs[String]("source"))
    perSource.values.foreach { g =>
      assert(g.length <= k)
      assert(g.map(_.getAs[Int]("rk")).sorted.sameElements(1 to g.length))
    }
    val again = Curation.sampleStratified(spark, sf, k).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("bottom-k sample has the prefix property and plans as TakeOrdered") {
    val k100 = Curation.sampleBottomK(spark, sf, 100).collect()
      .map(_.getAs[Long]("doc_id"))
    val k50 = Curation.sampleBottomK(spark, sf, 50).collect()
      .map(_.getAs[Long]("doc_id"))
    // prefix property: growing k extends the sample, never reshuffles it
    assert(k50.toSeq == k100.take(50).toSeq)
    // uniform-sample mergeability: bottom-50 of (bottom-50 of evens ∪
    // bottom-50 of odds) == bottom-50 of the whole corpus — two corpora's
    // samples merge into a sample of their union without re-reading either
    // (the bottom-k sketch property)
    val docs = graft.schema.Tables(spark, sf, "documents")
    def bottomOf(half: org.apache.spark.sql.DataFrame) = half
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":bottomk"))).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(50)
    val mergedTop = bottomOf(docs.filter(col("doc_id") % 2 === 0))
      .unionAll(bottomOf(docs.filter(col("doc_id") % 2 === 1)))
      .orderBy(col("h"), col("doc_id")).limit(50)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(mergedTop.toSeq == k50.toSeq)
    // the scale contract: per-partition top-k + single k·P merge, never a
    // global sort of the corpus
    val plan = Curation.sampleBottomK(spark, sf, 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("mixture plan shares sum to 1 and sample rates are capped") {
    val rows = Curation.mixturePlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Double]("actual_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")
    rows.foreach { r =>
      val rate = r.getAs[Double]("sample_rate")
      assert(rate > 0 && rate <= 1.0)
      assert(r.getAs[Double]("expected_docs") <= r.getAs[Long]("n_docs") + 0.5)
    }
  }
}
