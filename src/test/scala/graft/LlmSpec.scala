package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions._
import graft.llm.{Dedup, Similarity, TextOps}

/** Property tests for the LLM-data operators whose internals a SQL oracle
  * can't express: MinHash estimate quality, LSH recall, SimHash locality,
  * IVF recall vs brute force, fingerprint determinism.
  */
class LlmSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4", "llm-spec")
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("IVF assignment plan is a narrow scan→project (no exchange, no window)") {
    val plan = Similarity.assignClusters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle the corpus:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not window-sort the corpus:\n$plan")
  }

  test("IVF cluster-sizes plan scans only the embedding column") {
    val qe = Similarity.ivfClusterSizes(spark, sf).queryExecution
    val scans = qe.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scans.contains("embedding") && !scans.contains("label"),
      s"scan should prune to the embedding column:\n$scans")
  }

  test("minhash est_jaccard tracks exact jaccard on LSH candidates") {
    val est = Dedup.minhashCandidates(spark, sf)
      .select($"doc_a", $"doc_b", $"est_jaccard")
    val exact = Dedup.ngramJaccard(spark, sf, threshold = 0.0)
      .select($"doc_a", $"doc_b", $"jaccard")
    val joined = est.join(exact, Seq("doc_a", "doc_b")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      val j = r.getAs[Double]("jaccard")
      assert(math.abs(e - j) < 0.2, s"pair ${r.get(0)}-${r.get(1)}: est=$e exact=$j")
    }
  }

  test("incremental dedup: admissions consistent with the batch pair graph") {
    val inc = Dedup.incremental(spark, sf).collect()
    assert(inc.nonEmpty)
    // output covers exactly the new-batch slice
    assert(inc.forall(_.getAs[Long]("doc_id") % 10 >= 8))
    val dups = inc.filter(_.getAs[Boolean]("is_dup"))
    // every flagged dup names an earlier-in-ingest-order keeper at >= 0.8
    dups.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val of = r.getAs[Long]("dup_of")
      assert(of % 10 < 8 || of < id, s"dup_of $of not earlier than $id")
      assert(r.getAs[Double]("jaccard") >= 0.8)
    }
    // agreement with the batch pipeline: a new doc paired above threshold
    // in the full pair graph with an earlier doc must be flagged here
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val expectDup = pairs.collect {
      case (n, o) if n % 10 >= 8 && (o % 10 < 8 || o < n) => n
    }.toSet
    val flagged = dups.map(_.getAs[Long]("doc_id")).toSet
    assert(expectDup == flagged,
      s"batch graph says $expectDup, incremental flagged $flagged")
  }

  test("incremental dedup plan: corpus probed by keys, never self-joined wide") {
    val plan = Dedup.incremental(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no all-pairs scan:\n$plan")
  }

  test("hard negatives: cross-label only, descending, broadcast anchors") {
    val hn = Similarity.hardNegatives(spark, sf).collect()
    assert(hn.nonEmpty)
    hn.foreach(r => assert(r.getAs[Int]("anchor_label") != r.getAs[Int]("neg_label")))
    hn.groupBy(_.getAs[Long]("anchor_id")).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
    }
    val plan = Similarity.hardNegatives(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"anchors must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not be shuffled for the anchor join:\n$plan")
  }

  test("PQ code table refreshes when the corpus is regenerated in-session") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pqstale").toString
    val dim = 64
    def writeCorpus(closeId: Long): Unit = {
      val q = Array.tabulate(dim)(i => math.sin(i + 1).toFloat)
      val rows = (0L until 40L).map { id =>
        val v =
          if (id == 0L) q
          else if (id == closeId) q.map(x => x * 0.99f) // planted near-dup
          else Array.tabulate(dim)(i => math.cos(3.7 * (i + 1) * (id + 2)).toFloat)
        (id, v.toSeq, s"l$id")
      }
      spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
        .repartition(1).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    }
    writeCorpus(closeId = 7L)
    val first = Similarity.pqTopK(spark, tmp).collect()
    assert(first.head.getAs[Long]("vec_id") == 7L,
      s"planted near-dup must win: ${first.take(3).mkString(";")}")
    // regenerate the corpus at the same path: the session-cached code
    // table and codebook are keyed on the source fingerprint, so the
    // next query must rebuild against the NEW vectors, not serve stale
    // codes (VERDICT r6 item 5)
    writeCorpus(closeId = 23L)
    val second = Similarity.pqTopK(spark, tmp).collect()
    assert(second.head.getAs[Long]("vec_id") == 23L,
      s"stale PQ codes served after regeneration: ${second.take(3).mkString(";")}")
  }

  test("BPE fit matches an independent reference trainer; encode round-trips") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    // the classic Sennrich et al. worked example's corpus shape
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest"))
    spark.createDataFrame(docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // independent single-threaded reference trainer (the textbook
    // formulation: word types + counts, argmax pair, merge everywhere)
    def naive(corpus: Seq[String], steps: Int): Seq[(String, String, Long)] = {
      var words: Map[Vector[String], Long] = corpus
        .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .map { case (w, n) => (w.map(_.toString).toVector :+ "</w>") -> n }
      (1 to steps).flatMap { _ =>
        val pairCounts = words.toSeq.flatMap { case (syms, n) =>
          syms.zip(syms.drop(1)).map(p => p -> n)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (pairCounts.isEmpty) None
        else {
          val ((l, r), f) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
          words = words.toSeq.map { case (syms, n) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> n
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          Some((l, r, f))
        }
      }
    }
    val expected = naive(docs.map(_._2), 8)
    val got = TextOps.bpeFit(spark, tmp, nMerges = 8).merges
      .map(m => (m.left, m.right, m.freq))
    assert(got == expected, s"got $got\nexpected $expected")
    // the first merges of this corpus are hand-checkable: 'es' (9 = 6+3),
    // then 'est' (9), then 'est</w>' (9)
    assert(got.take(3) == Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)))
    // encode: detokenizing reproduces the normalized text exactly
    val model = TextOps.bpeFit(spark, tmp, nMerges = 8)
    val enc = TextOps.bpeEncode(spark, tmp, model).collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    docs.foreach { case (id, t) =>
      val (tokens, n) = enc(id)
      assert(n == tokens.size)
      assert(tokens.mkString("").replace("</w>", " ").trim == t.toLowerCase)
      // trained tokens compress: fewer tokens than characters+markers
      assert(n < t.count(_ != ' ') + t.split(" ").length)
    }
    // more merges never inflate the token count
    val n0 = TextOps.bpeEncode(spark, tmp, TextOps.BpeModel(Seq.empty))
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    val n8 = TextOps.bpeEncode(spark, tmp, model)
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(n8 < n0)
  }

  test("containment finds a planted sub-document that Jaccard would miss") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 21).map(i => s"w$i").mkString(" ") // 19 of 38 shingles
    spark.createDataFrame(Seq(
        (1L, words, "en", "src0", words.length.toLong),
        (2L, excerpt, "en", "src0", excerpt.length.toLong),
        (3L, (100 to 140).map(i => s"v$i").mkString(" "), "en", "src0", 100L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.containment(spark, tmp).collect()
      .map(r => (r.getAs[Long]("inner_doc"), r.getAs[Long]("outer_doc"),
        r.getAs[Double]("containment")))
    assert(got.contains((2L, 1L, 1.0)),
      s"excerpt must be detected as contained in the base doc, got ${got.mkString(";")}")
    assert(!got.exists(_._1 == 3L), "the unrelated doc must not match")
    // the same pair's symmetric Jaccard (19/38 = 0.5) is far below the 0.8
    // near-dup threshold — the class this directed operator exists for
    assert(Dedup.ngramJaccard(spark, tmp).collect().isEmpty)
  }

  test("source drift: KL is non-negative and total over sources") {
    val rows = TextOps.sourceDrift(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getAs[Double]("kl_divergence") >= 0.0,
      s"KL must be >= 0: $r"))
  }

  test("bm25: positive non-increasing scores, bounded hits, TakeOrdered plan") {
    val df = TextOps.bm25TopK(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[Double]("bm25") > 0)
      val hits = r.getAs[Long]("n_terms_hit")
      assert(hits >= 1 && hits <= 3)
    }
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"top-k must not global-sort:\n$plan")
  }

  test("LSH finds the planted near-duplicates (exact jaccard >= 0.9 pairs)") {
    val found = Dedup.ngramJaccard(spark, sf, threshold = 0.9).count()
    assert(found > 0, "expected planted near-dup pairs at jaccard >= 0.9")
  }

  test("simhash: identical docs get identical hashes; near-dups land close") {
    val sim = Dedup.simhashPairs(spark, sf, maxHamming = 10)
    val pairs = sim.collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 10))
  }

  test("span coverage: bounds hold and exact-dup docs are fully boilerplate") {
    val cov = Dedup.spanCoverage(spark, sf).collect()
    assert(cov.nonEmpty)
    cov.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_boiler"))
      assert(b >= 0 && b <= n, s"doc ${r.get(0)}: n_boiler=$b outside [0, $n]")
      if (n > 0) {
        val ppm = r.getAs[Long]("boiler_ppm")
        assert(ppm == math.floor(b.toDouble / n * 1e6).toLong)
      } else assert(r.isNullAt(r.fieldIndex("boiler_ppm")))
    }
    // exact semantics pinned on a controlled corpus: duplicated text ⇒
    // every gram has df >= 2 ⇒ coverage exactly 1e6 ppm; unique text
    // sharing no 5-gram ⇒ 0; a 4-word doc has no grams ⇒ null ppm
    val tmp = java.nio.file.Files.createTempDirectory("spancov").toString
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, a, "en", "web", a.length.toLong),
        (2L, a, "en", "web", a.length.toLong),
        (3L, "one two three four five six seven", "en", "web", 34L),
        (4L, "just four words here", "en", "web", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val syn = Dedup.spanCoverage(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(syn(1L).getAs[Long]("boiler_ppm") == 1000000L)
    assert(syn(2L).getAs[Long]("boiler_ppm") == 1000000L)
    assert(syn(3L).getAs[Long]("boiler_ppm") == 0L)
    assert(syn(4L).getAs[Long]("n_grams") == 0L &&
      syn(4L).isNullAt(syn(4L).fieldIndex("boiler_ppm")))
  }

  test("resolve_keepers: components collapse to their min doc_id") {
    val rows = Dedup.resolveKeepers(spark, sf).collect()
    assert(rows.nonEmpty)
    val keepers = rows.filter(!_.getAs[Boolean]("is_dup")).map(_.getAs[Long]("doc_id")).toSet
    // every row's keeper is a non-dup member of the output, and is the
    // smallest id the row can reach (keeper <= doc_id by min-label fixpoint)
    rows.foreach { r =>
      assert(keepers.contains(r.getAs[Long]("keeper")))
      assert(r.getAs[Long]("keeper") <= r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("is_dup") == (r.getAs[Long]("doc_id") != r.getAs[Long]("keeper")))
    }
    // keepers are exactly the docs that keep themselves
    val pairDocs = Dedup.ngramJaccard(spark, sf)
      .select($"doc_a").union(Dedup.ngramJaccard(spark, sf).select($"doc_b"))
      .distinct().count()
    assert(rows.length.toLong == pairDocs)
  }

  test("ivf top-k recall vs brute force >= 0.5 at nprobe=4/16") {
    val brute = Similarity.bruteForceTopK(spark, sf).select($"vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(spark, sf).select($"vec_id").as[Long].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("kmeans fit: objective non-increasing, assignment fixpoint, trained beats seeded IVF") {
    // at fixture scale the "bounded training sample" is the whole corpus
    // (the sample exists to bound cost at 100 TB, not to starve 16 cells
    // of ~30 points each); tol=0 disables the objective-flatline stop so
    // the STRICT assignment fixpoint is what's being proven
    val fit = Similarity.kmeansFit(spark, sf, maxIters = 15,
      trainSampleMod = 1, tol = 0.0)
    assert(fit.converged)
    // spherical-Lloyd invariant: Σ(1 − cos) never increases
    fit.history.map(_.objective).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"objective rose: $a -> $b\n${fit.history}")
      case _ =>
    }
    // reaches an assignment fixpoint within the iteration budget
    assert(fit.history.last.nChanged == 0L,
      s"no fixpoint after ${fit.history.size} iters: ${fit.history}")
    // trained centroids: k cells, every centroid finite and non-degenerate
    assert(fit.centroids.length == 16)
    assert(fit.centroids.forall { case (_, c) =>
      c.forall(x => !x.isNaN && !x.isInfinite) && c.exists(_ != 0.0) })

    // trained-IVF must recall at least as well as the seeded stand-in,
    // aggregated over a spread of query ids (per-query ties are fine)
    val queryIds = Seq(0L, 3L, 7L, 11L, 19L, 27L, 33L, 41L, 55L, 63L)
    def recallSum(top: Long => Set[Long]): (Int, Int) = {
      var hit = 0; var tot = 0
      queryIds.foreach { q =>
        val brute = Similarity.bruteForceTopK(spark, sf, q)
          .select($"vec_id").as[Long].collect().toSet
        val got = top(q)
        hit += (brute & got).size; tot += brute.size
      }
      (hit, tot)
    }
    val (seedHit, _) = recallSum(q =>
      Similarity.ivfTopK(spark, sf, q).select($"vec_id").as[Long].collect().toSet)
    val (trainHit, trainTot) = recallSum(q =>
      Similarity.ivfTopKModel(spark, sf, fit.centroids, q)
        .select($"vec_id").as[Long].collect().toSet)
    assert(trainHit >= seedHit,
      s"trained IVF recall $trainHit/$trainTot below seeded $seedHit/$trainTot")
  }

  test("pq plan: map-side encode+score, no exchange before the top-k") {
    val plan = Similarity.pqTopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected per-partition top-k:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"PQ encode/score must not shuffle the corpus:\n$plan")
  }

  test("pq adc: deterministic, ascending, and measured recall vs exact L2") {
    val pq = Similarity.pqTopK(spark, sf).collect()
    val pq2 = Similarity.pqTopK(spark, sf).collect()
    assert(pq.map(_.toString).sameElements(pq2.map(_.toString)), "PQ must be deterministic")
    val dists = pq.map(_.getAs[Double]("adc_dist"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b }, "ADC ranking must ascend")
    // exact L2 top-10 in-engine (PQ approximates L2, so that — not cosine —
    // is the right recall reference)
    val emb = graft.schema.Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val l2 = aggregate(
      zip_with(col("embedding"), col("q_emb"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val exact = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), l2.as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & pq.map(_.getLong(0)).toSet).size.toDouble / exact.size
    // fixture-quality note, not a quantizer guarantee: 16 codewords per
    // subspace seeded from random vectors over a near-random corpus is a
    // COARSE quantizer (same regime as rp-lsh's 0.4 above); the oracle pins
    // the exact encode/ADC arithmetic, this pins the measured floor
    assert(recall >= 0.1, s"PQ recall@10 $recall below the measured fixture floor")
  }

  test("rp-lsh: recall vs brute force and real pruning at the default radius") {
    val bf = Similarity.bruteForceTopK(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val rp = Similarity.rpTopK(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (bf & rp).size.toDouble / bf.size
    assert(recall >= 0.4, s"rp-lsh recall $recall too low")
    // the Hamming-radius filter must genuinely prune (this corpus's
    // neighbors are near the random regime — see rpTopK scaladoc)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val candidates = Similarity.rpTopK(spark, sf, k = Int.MaxValue).count()
    assert(candidates < n / 2, s"radius admits $candidates of $n — no pruning")
  }

  test("rp-lsh signature plan is map-side (no exchange before the bucket agg)") {
    val plan = Similarity.rpBucketSizes(spark, sf)
      .queryExecution.executedPlan.toString
    // signatures are literal-plane projections: nothing but the agg's
    // partial→final exchange and the presentation sort may appear
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected agg+sort exchanges only:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"signature computation must be join- and window-free:\n$plan")
  }

  test("embedding near-dup: top-k bucketed pairs, descending cosine, a<b") {
    val rows = Dedup.embeddingNearDup(spark, sf).collect()
    assert(rows.length == 20)
    val cosines = rows.map(_.getAs[Double]("cosine"))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
  }

  test("semantic dedup: conservation, and drops recheck against brute force") {
    val rep = Dedup.semantic(spark, sf).collect()
    val total = rep.map(_.getAs[Long]("n_vectors")).sum
    assert(total == spark.read.parquet(s"$sf/embeddings.parquet").count())
    rep.foreach { r =>
      assert(r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_vectors"))
    }
    // independent driver-side recheck: a vector is dropped iff some
    // lower-id vector in its cluster is >= tau close (double-accumulating
    // cosine, same arithmetic as VecCosine)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = Similarity.assignClusters(spark, sf)
      .select($"vec_id", $"embedding", $"centroid_id").collect()
      .map(r => (r.getAs[Int]("centroid_id"), r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).toArray))
      .groupBy(_._1)
    val expectedDrops = byCluster.map { case (cid, vs) =>
      val sorted = vs.sortBy(_._2)
      cid -> sorted.count { case (_, id, v) =>
        sorted.exists { case (_, id2, v2) => id2 < id && cos(v2, v) >= 0.3 }
      }.toLong
    }
    rep.foreach { r =>
      assert(r.getAs[Long]("n_dropped") ==
        expectedDrops(r.getAs[Int]("centroid_id")),
        s"cluster ${r.getAs[Int]("centroid_id")}")
    }
  }

  test("ivf clusters cover all vectors exactly once") {
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val assigned = Similarity.ivfClusterSizes(spark, sf)
      .agg(sum($"n_vectors")).head().getLong(0)
    assert(assigned == total)
  }

  test("vec_cosine agrees with a reference implementation") {
    val df = Seq((Array(1f, 0f, 1f), Array(1f, 1f, 0f))).toDF("a", "b")
    val got = df.select(vec_cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(got - 0.5) < 1e-9)
    val self = df.select(vec_cosine($"a", $"a")).head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-9)
  }

  test("rolling-hash fingerprint is deterministic and shift-sensitive") {
    val a = Seq("the quick brown fox").toDF("t").select(rolling_hash($"t")).head().getLong(0)
    val b = Seq("the quick brown fox").toDF("t").select(rolling_hash($"t")).head().getLong(0)
    val c = Seq("quick brown fox the").toDF("t").select(rolling_hash($"t")).head().getLong(0)
    assert(a == b && a != c)
  }

  test("minhash signature deterministic across evaluations") {
    val s1 = Dedup.minhashSignatures(spark, sf).collect().map(_.toString)
    val s2 = Dedup.minhashSignatures(spark, sf).collect().map(_.toString)
    assert(s1.sameElements(s2))
  }

  test("k-means step: full cover, consistent cluster sizes") {
    val rows = llm.Similarity.kmeansStep(spark, sf).collect()
    val dims = rows.map(_.getAs[Int]("dim")).distinct.sorted
    assert(dims.head == 0 && dims.last == 63)
    // every (cluster, dim) cell has the SAME n_assigned within a cluster,
    // and cluster sizes sum to the corpus size for each dim
    val byCluster = rows.groupBy(_.getAs[Int]("centroid_id"))
    byCluster.values.foreach { g =>
      assert(g.map(_.getAs[Long]("n_assigned")).distinct.length == 1)
    }
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val perDim = rows.filter(_.getAs[Int]("dim") == 0).map(_.getAs[Long]("n_assigned")).sum
    assert(perDim == corpus)
  }

  test("embedding norms are positive and bound max_abs") {
    val rows = llm.Similarity.embeddingNorms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l2 = r.getAs[Double]("l2_norm")
      val maxAbs = r.getAs[Double]("max_abs")
      assert(l2 > 0 && maxAbs > 0)
      // any single |component| can't exceed the L2 norm (up to rounding)
      assert(maxAbs <= l2 + 1e-3, s"max_abs $maxAbs > l2 $l2")
      assert(r.getAs[Int]("dim") == 64)
    }
  }

  test("int8 quantization: codes within range, max component saturates") {
    val rows = llm.Similarity.quantizeInt8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("scale") > 0)
      assert(math.abs(r.getAs[Int]("q0")) <= 127)
      // the per-vector max element quantizes to exactly ±127 by construction
      assert(r.getAs[Int]("n_saturated") >= 1)
    }
  }

  test("tf-idf ranks a stratum-unique token above corpus-wide fillers") {
    val rows = llm.TextOps.tfidfTopK(spark, sf, 3).collect()
    assert(rows.nonEmpty)
    // scores are non-increasing within each doc's ranked list
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      val byRk = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("tfidf"))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }

  test("langid is deterministic and total") {
    val df = TextOps.langId(spark, sf)
    assert(df.filter($"predicted_lang".isNull).count() == 0)
    assert(df.count() == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("frame sampling covers every payload at the configured stride") {
    val frameBytes = 64
    val stride = 4
    val frames = llm.Multimodal.frameSample(spark, sf, frameBytes, stride).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", octet_length($"text".cast("binary")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (docId, fs) =>
      val nChunks = (lens(docId) + frameBytes - 1) / frameBytes
      assert(fs.length == (nChunks + stride - 1) / stride, s"doc $docId frame count")
      fs.foreach { f =>
        assert(f.getAs[Int]("offset") % (frameBytes * stride) == 0)
        assert(f.getAs[Int]("n_bytes") > 0 && f.getAs[Int]("n_bytes") <= frameBytes)
      }
    }
    // stub decode is deterministic across evaluations
    val again = llm.Multimodal.frameSample(spark, sf, frameBytes, stride).collect()
    assert(frames.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("real PNG decode recovers the generative pixels (features + resize + meta)") {
    // independent of the DuckDB oracle: recompute the expected statistics
    // directly from the formula here and demand the decoded ones match
    def px(id: Long, x: Int, y: Int, a: Long, bx: Long, by: Long): Long =
      (id * a + x * bx + y * by) % 256
    val feats = llm.Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length == spark.read.parquet(s"$sf/documents.parquet").count())
    feats.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = ((16 + id % 17).toInt, (16 + id % 13).toInt)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val pts = for (y <- 0 until h; x <- 0 until w) yield (x, y)
      assert(r.getAs[Long]("sum_r") == pts.map { case (x, y) => px(id, x, y, 31, 7, 13) }.sum)
      assert(r.getAs[Long]("sum_g") == pts.map { case (x, y) => px(id, x, y, 17, 11, 3) }.sum)
      assert(r.getAs[Long]("sum_b") == pts.map { case (x, y) => px(id, x, y, 23, 5, 19) }.sum)
      assert(r.getAs[Long]("xmom_r") == pts.map { case (x, y) => x * px(id, x, y, 31, 7, 13) }.sum)
      assert(r.getAs[Long]("ymom_r") == pts.map { case (x, y) => y * px(id, x, y, 31, 7, 13) }.sum)
    }
    val rz = llm.Multimodal.resize(spark, sf).collect().take(5)
    rz.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = ((16 + id % 17).toInt, (16 + id % 13).toInt)
      val expected = (for (j <- 0 until 8; i <- 0 until 8) yield {
        val (xs, xe, ys, ye) = (i * w / 8, (i + 1) * w / 8, j * h / 8, (j + 1) * h / 8)
        val block = for (y <- ys until ye; x <- xs until xe) yield px(id, x, y, 31, 7, 13)
        block.sum / block.length
      }).mkString(",")
      assert(r.getAs[String]("resized_csv") == expected, s"doc $id resize")
    }
    val meta = llm.Multimodal.imageMeta(spark, sf).collect()
    assert(meta.forall(_.getAs[String]("mime") == "image/png"))
  }

  test("r5 query plan shapes: no corpus shuffle where the docs promise none") {
    // BPE pairs: map-side zip_with extraction + TakeOrdered — a
    // position-window implementation would shuffle every token
    val bpe = llm.TextOps.bpeMergeCandidates(spark, sf)
      .queryExecution.executedPlan.toString
    assert(bpe.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$bpe")
    assert(!bpe.contains("Window"), "pair extraction must not use a window")
    // unigram LM scoring: the vocab table broadcasts back onto the tokens
    val ul = llm.TextOps.unigramLogprob(spark, sf)
      .queryExecution.executedPlan.toString
    assert(ul.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$ul")
    // centroid outliers: the |labels|·d model broadcasts, vectors stay put
    val co = llm.Similarity.centroidOutliers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(co.contains("BroadcastHashJoin"), s"centroids must broadcast:\n$co")
  }

  test("real WAV decode recovers the generative waveform's signal stats") {
    def pcm(id: Long, i: Int): Int =
      (((id * 131 + i.toLong * (37 + id % 7)) % 2048) - 1024).toInt
    val feats = llm.Multimodal.audioFeatures(spark, sf).collect()
    assert(feats.length == spark.read.parquet(s"$sf/documents.parquet").count())
    feats.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = (800 + (id % 7) * 100).toInt
      val samples = (0 until n).map(pcm(id, _))
      // a real RIFF header parse: rate from the container, count from data
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Long]("n_samples") == n)
      assert(r.getAs[Int]("peak_abs") == samples.map(math.abs).max)
      assert(r.getAs[Long]("sum_sq") == samples.map(s => s.toLong * s).sum)
      assert(r.getAs[Long]("zero_crossings") ==
        samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    }
  }
}
