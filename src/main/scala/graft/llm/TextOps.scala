package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.schema.Tables

/** Text-analysis operators over the `documents` table: quality statistics,
  * token counting (whitespace + BPE-ish regex), n-gram language ID, and
  * document fingerprinting. All per-row map-side work — no shuffle except
  * the final deterministic presentation sort — so the operators scale
  * linearly with input splits.
  */
object TextOps {

  /** Word-shingle array (k-grams of whitespace tokens) as a Column —
    * shared by dedup and fingerprint ops. Native one-pass expression
    * ([[graft.functions.Shingles]]); see [[shingleHashes]] for why the
    * built-in higher-order composition is quadratic per document. */
  def shingles(text: Column, k: Int = 3): Column =
    GraftFunctions.shingles(text, k)

  /** Hashed shingle set (xxhash64 per shingle) — input to MinHash/SimHash.
    * Native one-pass expression ([[graft.functions.ShingleHashes]]): the
    * equivalent built-in composition is interpreted (higher-order functions
    * don't codegen) and re-evaluates split() per element — O(words²) string
    * churn per document on the dedup hot path. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    GraftFunctions.shingle_hashes(text, k)

  /** Per-document quality stats: lengths, word counts, mean word length,
    * stopword ratio, uppercase/whitespace ratios. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val words = split(col("text"), " ")
    d.select(
      col("doc_id"), col("lang"),
      length(col("text")).as("n_chars"),
      size(words).as("n_words"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") / size(words), 4)
        .as("mean_word_len"),
      round(size(filter(words, w => w.isin("the", "a"))).cast("double") / size(words), 4)
        .as("stopword_ratio"),
      size(array_distinct(words)).as("n_unique_words"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens vs a BPE-ish regex segmentation
    * (letter runs / digit runs / single other-symbols). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
          .as("bpe_ish_tokens"))
      .orderBy(col("doc_id"))

  /** N-gram-heuristic language ID: score each candidate language by marker
    * token hits and take the deterministic argmax. The marker lists are a
    * stand-in lexicon (the synthetic corpus shares one vocabulary across
    * langs); the mechanics — map-side scoring, no shuffle, argmax via
    * greatest-struct — are the production shape. No SQL oracle (lexicon
    * heuristic); pinned by LlmSpec determinism tests.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "es" -> Seq("la", "el", "los", "de"),
      "de" -> Seq("der", "die", "das", "und"),
      "fr" -> Seq("le", "les", "des", "et"),
      "zh" -> Seq("de5", "shi4", "le5", "he2"))
    val words = split(col("text"), " ")
    // struct(score, -ord) argmax via greatest(): deterministic tie-break
    // toward the first-listed language.
    val scored = markers.zipWithIndex.map { case ((lg, ms), i) =>
      struct(
        size(filter(words, w => w.isin(ms: _*))).as("score"),
        lit(-i).as("ord"),
        lit(lg).as("lang"))
    }
    // ONE greatest() evaluation per row: the five marker filter()
    // lambdas are interpreted (no codegen/CSE), so projecting two fields
    // from two copies ran the whole scan twice per row
    val best = greatest(scored: _*)
    Tables(spark, dir, "documents")
      .withColumn("_best", best)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
              col("_best").getField("lang").as("predicted_lang"),
              col("_best").getField("score").as("marker_hits"))
      .orderBy(col("doc_id"))
  }

  /** Whole-document fingerprint: polynomial rolling hash over the
    * normalized (lowercased, space-collapsed) text — custom native
    * expression [[graft.functions.RollingHash]]. Golden-pinned in tests
    * AND oracled: the Karp–Rabin recurrence (h·base + codeunit mod 2^64)
    * is reproduced in DuckDB with HUGEINT arithmetic. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        GraftFunctions.rolling_hash(
          regexp_replace(lower(col("text")), "\\s+", " ")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** Quality-filter pipeline: per-document keep/drop decision with the
    * first failing rule as the reason — the gate a training-data pipeline
    * runs before tokenization. Pure map-side predicates; at scale the
    * filter co-locates with the scan and feeds the keep-branch downstream
    * without a shuffle. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(words).as("n_words"),
        round(size(array_distinct(words)).cast("double") / size(words), 4).as("unique_ratio"))
      .withColumn("drop_reason",
        when(col("n_words") < 20, "too_short")
          .when(col("n_words") > 5000, "too_long")
          .when(col("unique_ratio") < 0.35, "repetitive")
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
      .orderBy(col("doc_id"))
  }

  /** Per-language corpus statistics with exact percentiles (partial+final
    * agg; the percentile state is per-group, merged across partitions). */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .select(col("lang"), size(words).as("n_words"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_tokens"),
        round(avg(col("n_words")), 4).as("avg_tokens"),
        round(percentile(col("n_words"), lit(0.5)), 4).as("p50_tokens"),
        round(percentile(col("n_words"), lit(0.9)), 4).as("p90_tokens"))
      .orderBy(col("lang"))
  }

  /** GROUPED quantile sketches: per-source document-length quantiles via
    * one [[graft.functions.QuantileSketchAgg]] buffer PER GROUP — the
    * shape corpus monitoring runs at 100 TB, where [[corpusStats]]'s
    * exact `percentile` would buffer every group's values in one reducer
    * while the sketch keeps O(k·log n) doubles per group across the
    * exchange. Same invariant-oracle form as `fn_quantile_sketch_epochs`,
    * per group: exact percentiles value-checked against DuckDB, the
    * sketch estimates rank-verified within 5% in-query via a broadcast-
    * back second pass (the fApproxPercentile pattern).
    */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.{quantile_sketch, quantile_value}
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars").cast("double").as("len"))
    val ests = docs.groupBy(col("source")).agg(
        quantile_sketch(col("len")).as("sk"),
        expr("percentile(len, array(0.5, 0.9))").as("exact"))
      .select(col("source"),
        round(element_at(col("exact"), 1), 4).as("len_p50"),
        round(element_at(col("exact"), 2), 4).as("len_p90"),
        quantile_value(col("sk"), 0.5).as("e50"),
        quantile_value(col("sk"), 0.9).as("e90"))
    docs.join(broadcast(ests), "source")
      .groupBy(col("source"), col("len_p50"), col("len_p90"))
      .agg(count(lit(1)).as("n_docs"),
        (abs(avg((col("len") <= col("e50")).cast("long")) - 0.5) <= 0.05).as("p50_ok"),
        (abs(avg((col("len") <= col("e90")).cast("long")) - 0.9) <= 0.05).as("p90_ok"))
      .orderBy(col("source"))
  }

  /** Unigram language-model scoring: train the LM from the corpus itself
    * (token → count, one keyed agg), then score every document by its
    * mean token log-probability — the classic cheap quality/fluency
    * signal for pretraining curation (gibberish and boilerplate land in
    * the tails). Two passes over the tokens, both with map-side combine;
    * the vocab-sized count table broadcasts back, so document text
    * crosses no exchange. At 100 TB the LM table is exactly the
    * [[vocabTopK]] aggregate a pipeline already maintains.
    */
  def unigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    // the |vocab|-row count table is read twice (the broadcast join and
    // its own total); checkpointing it stops the corpus re-tokenizing
    // per consumer — the sourceDrift pattern
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    toks.join(broadcast(counts), "token")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("cnt").cast("double") / col("n_total"))), 6)
          .as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** One BPE training iteration's candidate scoring: corpus-wide counts
    * of ADJACENT token pairs, top-k as the next merge candidates — the
    * inner loop of byte-pair-encoding tokenizer training (Sennrich et
    * al. 2016, public) expressed as a query. Pairs are extracted
    * map-side with zip_with over the split array (no per-token window,
    * no position shuffle); the only exchange carries (pair, count)
    * partials with map-side combine, and the top-k is TakeOrdered over
    * the pair aggregate. Iterating = re-running with the merged vocab
    * applied, exactly how a distributed BPE trainer loops.
    */
  def bpeMergeCandidates(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val ws = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .select(explode(zip_with(
        slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("token"), col("p.b").as("next"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"), col("next"))
      .limit(k)
  }

  /** Corpus vocabulary heavy hitters: top-k tokens by frequency — the
    * tokenizer-vocab / stopword-mining primitive. explode is map-side; the
    * token group-by does partial (map-side combine) + final aggregation, so
    * only per-partition distinct tokens cross the exchange, and the top-k
    * is TakeOrdered over the ~|vocab| aggregate, never a global sort of
    * occurrences. */
  def vocabTopK(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Heavy-hitter tokens via the native Misra–Gries sketch
    * ([[graft.functions.MisraGriesAgg]]) with the frequent-items GUARANTEE
    * as the oracle: every token with exact frequency > n/(k+1) must appear
    * among the sketch's ≤k candidates, so emitting (exact heavy hitters ⋈
    * sketch candidates) makes the driver's row compare the containment
    * check — a sketch that loses a guaranteed item comes back a row short.
    * Exact counts ride along so values are pinned too.
    *
    * 100 TB posture: the sketch pass moves only ≤k-entry buffers across
    * its exchange (vs the full vocab for exact counting); the exact-count
    * side here exists to STATE the invariant and would be dropped in
    * production (or run rarely as an audit). */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 32): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val cands = toks
      .agg(GraftFunctions.heavy_hitters(col("token"), k).as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c.item").as("token"))
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val exactHH = exact
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("total"))))
      .filter(col("n") > col("total") / (k + 1))
    exactHH.join(cands, Seq("token")) // inner: a missed guaranteed item drops a row
      .select(col("token"), col("n"))
      .orderBy(col("n").desc, col("token"))
  }

  /** Per-document TF-IDF top terms — the keyword/topic-signal primitive.
    * Dataflow: explode tokens (map-side, after any doc filter) → tf per
    * (doc, term) with map-side combine → df per term over the ~|vocab|
    * aggregate → idf joins BACK as a broadcast (vocab is small relative to
    * the corpus; a 100 TB corpus has a bounded vocabulary) → per-doc
    * ranking window shuffles only (doc, term, score) triples. The corpus
    * text itself crosses no exchange. N (total docs) rides along as a
    * broadcast 1-row aggregate, not a driver-side count. */
  def tfidfTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // tf feeds both the df aggregate and the scored join: materialize it
    // once (the SparkEntry multi-consumer checkpoint discipline) — the
    // un-checkpointed plan re-tokenized the corpus per consumer (measured
    // ~2× this query's cost; AQE exchange reuse does not bridge the two
    // differently-pruned subtrees)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val score = col("tf") * log(col("n_docs").cast("double") / col("df"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(score.desc, col("token"))))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("token"), round(score, 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Text normalization ahead of tokenization: lowercase, strip
    * non-alphanumerics, collapse whitespace, trim. Map-side projection;
    * emits the normalized text plus before/after lengths so shrinkage is
    * auditable. */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).as("n_chars_raw"),
        length(norm).as("n_chars_norm"),
        md5(norm).as("norm_md5"),
        substring(norm, 1, 40).as("norm_prefix"))
      .orderBy(col("doc_id"))
  }

  /** Token-distribution entropy per document — the information-density
    * quality signal (low entropy ⇒ repetitive/templated text; with
    * [[qualityFilter]]'s unique_ratio it covers both tails). Computed as
    * H = ln(n) − (Σ tf·ln tf)/n so one tf aggregation feeds everything —
    * no second pass for the total. Shuffles carry (doc_id, token) counts
    * only. */
  def entropy(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(
          log(sum(col("tf")).cast("double")) -
            sum(col("tf").cast("double") * log(col("tf").cast("double"))) /
              sum(col("tf")).cast("double"),
          6).as("token_entropy"))
      .orderBy(col("doc_id"))

  /** BM25 keyword retrieval — rank documents for a term query with the
    * Okapi scoring function (Lucene's idf variant; k1 = 1.2, b = 0.75).
    * Dataflow mirrors [[tfidfTopK]]: one (doc, term) tf aggregation
    * feeds per-term df and per-doc length; the 3-term query hits it as a
    * broadcast semi-filter so only matching (doc, term) rows survive;
    * corpus-level scalars (N, avgdl) ride along as broadcast 1-row
    * aggregates; the final top-k is a TakeOrdered over per-doc sums —
    * the corpus text never crosses an exchange. */
  def bm25TopK(spark: SparkSession, dir: String,
               terms: Seq[String] = Seq("join", "stream", "window"),
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // three consumers (dl, df, the scored join) — one materialization,
    // same rationale as [[tfidfTopK]]
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val df = tf.filter(col("token").isin(terms: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val termScore = idf * (col("tf") * (k1 + 1.0)) /
      (col("tf") + (lit(1.0) - b + col("dl") / col("avgdl") * b) * k1)
    tf.filter(col("token").isin(terms: _*))
      .join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(termScore), 6).as("bm25"),
           count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Count–Min token-frequency sketches, built per source epoch with
    * Spark's built-in `count_min_sketch` aggregate and unioned with the
    * native [[graft.functions.CmsMergeAgg]] — the incremental pattern
    * where each ingest partition persists ONE KB-scale sketch and
    * corpus-wide point-frequency queries never re-read rows. Invariants,
    * in-query and oracled (the rel_q34 HLL pattern, but CMS merge is
    * EXACT — counters sum elementwise, so merged == direct bit-for-bit):
    *   - merge_exact: estimate from the merged per-source sketches equals
    *     the estimate from one directly-built sketch, per query token;
    *   - no_undercount: estimate ≥ true count (structural CMS guarantee);
    *   - within_bound: estimate ≤ true + eps·N (deterministic for the
    *     fixed seed + data; holds at the sketch's 99% confidence).
    * True counts are exact and DuckDB-replayable; the booleans must all
    * come back true. */
  def cmsEpochs(spark: SparkSession, dir: String,
                eps: Double = 0.001,
                queryTokens: Seq[String] = Seq("join", "scan", "stream", "table", "the"))
      : DataFrame = {
    import graft.functions.GraftFunctions.{cms_merge, cms_estimate}
    val tok = Tables(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    def cms(c: Column) = count_min_sketch(c, lit(eps), lit(0.99), lit(42))
    val perSource = tok.groupBy(col("source")).agg(cms(col("token")).as("sk"))
    val merged = perSource.agg(cms_merge(col("sk")).as("msk"))
    val direct = tok.agg(cms(col("token")).as("dsk"),
      count(lit(1)).as("n_tokens"))
    val exact = tok.filter(col("token").isin(queryTokens: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("true_n"))
    exact.crossJoin(broadcast(merged)).crossJoin(broadcast(direct))
      .select(col("token"), col("true_n"),
        (cms_estimate(col("msk"), col("token")) ===
          cms_estimate(col("dsk"), col("token"))).as("merge_exact"),
        (cms_estimate(col("dsk"), col("token")) >= col("true_n")).as("no_undercount"),
        (cms_estimate(col("dsk"), col("token")) <=
          col("true_n") + ceil(col("n_tokens") * eps)).as("within_bound"))
      .orderBy(col("token"))
  }

  /** Per-source distribution DRIFT vs the corpus: KL(source ‖ corpus)
    * over the unigram distributions — the observability signal that
    * catches a source whose content shifted (scraper broke, language
    * flipped, spam flood) before it pollutes a training mix. Every
    * source's tokens are a subset of the corpus's, so the divergence
    * needs no smoothing and is exact. One (source, token) count feeds
    * both distributions (the corpus side re-aggregates from the same
    * partials); the per-source sum shuffles (source, token) counts only
    * — corpus text never crosses an exchange. */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    // one corpus scan: the (source, token) table is ~|sources|·|vocab|
    // rows (tiny); materializing it eagerly keeps the three derived
    // aggregates (corpus counts, per-source totals, grand total) from
    // each re-exploding the corpus (the un-checkpointed plan ran the
    // token explosion four times)
    val st = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("n_st"))
      .localCheckpoint(true)
    val corpus = st.groupBy(col("token")).agg(sum(col("n_st")).as("n_t"))
    val totals = st.groupBy(col("source")).agg(sum(col("n_st")).as("n_s"))
    val nAll = corpus.agg(sum(col("n_t")).as("n_all"))
    val ps = col("n_st").cast("double") / col("n_s")
    val pc = col("n_t").cast("double") / col("n_all")
    st.join(broadcast(corpus), "token")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(nAll))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
           round(sum(ps * log(ps / pc)), 6).as("kl_divergence"))
      .orderBy(col("source"))
  }

  final case class BpeMerge(step: Int, left: String, right: String,
                            merged: String, freq: Long)
  final case class BpeModel(merges: Seq[BpeMerge])

  /** Word-type table shared by the BPE trainer: lowercased
    * whitespace-split words folded to (symbols, count). Training on word
    * TYPES is the classic Sennrich formulation and the scale lever — the
    * type table grows ~sublinearly with the corpus (Heaps' law), so every
    * trainer iteration runs over |vocab| rows no matter how many
    * documents fed it; the corpus is read exactly once. */
  private def bpeWordTypes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(concat(split(col("word"), ""), array(lit("</w>"))).as("syms"),
        col("n"))

  /** Merge every left-to-right non-overlapping (a, b) adjacency in the
    * symbol array — one BPE apply pass as a single codegen-planned
    * aggregate fold (no UDF). `get` (not element_at) keeps the
    * empty-accumulator probe NULL-safe under ANSI mode; the greedy
    * skip ("aaa" → [aa, a]) falls out of the fold because the merged
    * tail no longer equals `a`. */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(x === lit(b) && get(acc, size(acc) - 1) === lit(a),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Full BPE tokenizer TRAINING in-engine (Sennrich, Haddow & Birch
    * 2016, public) — the loop [[bpeMergeCandidates]] is one candidate
    * scan of: per step, count adjacent symbol pairs over the word-type
    * table weighted by word count, take the single most frequent pair
    * (ties broken lexicographically so the fit is deterministic), and
    * merge it everywhere. Integer arithmetic end to end — no float
    * trajectory, so the whole merge sequence is deterministic given the
    * corpus.
    *
    * Per-iteration plan: one map-side zip_with pair explode over the
    * |word types| table, one (pair → Σn) partial+final aggregate, and a
    * 1-row TakeOrdered — only (pair, count) partials cross the exchange.
    * The table is eagerly localCheckpoint'ed each round (plans stay
    * shallow; the previous round's blocks are freed by RDD id, the
    * [[Dedup.resolveKeepers]] hygiene). The iteration count is the
    * target vocab size — a constant, not a function of data size. */
  def bpeFit(spark: SparkSession, dir: String, nMerges: Int = 12): BpeModel = {
    val sc = spark.sparkContext
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(true)
      (out, sc.getPersistentRDDs.keySet.toSet.diff(before))
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    var (words, blocks) = checkpointed(bpeWordTypes(spark, dir))
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      step += 1
      val sz = size(col("syms"))
      val top = words
        .select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), greatest(sz - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(sz - 1, lit(0))),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(step, l, r, l + r, f)
        val (next, nextBlocks) =
          checkpointed(words.withColumn("syms", mergePair(col("syms"), l, r)))
        free(blocks); words = next; blocks = nextBlocks
      }
    }
    free(blocks)
    BpeModel(merges.toSeq)
  }

  /** Session memo of the trained tokenizer, keyed on the documents
    * source fingerprint (the [[Similarity]] pqCodeTable staleness
    * discipline): one fit per (session, corpus state); a regenerated
    * corpus rebuilds. */
  private val bpeCache =
    scala.collection.concurrent.TrieMap.empty[String, BpeModel]
  def bpeFitCached(spark: SparkSession, dir: String,
                   nMerges: Int = 12): BpeModel =
    bpeCache.getOrElseUpdate(
      s"${Tables.fingerprint(spark, dir, "documents")}|$nMerges",
      bpeFit(spark, dir, nMerges))

  /** Apply a trained merge list to the corpus: per document, words →
    * char symbols → the merge sequence in training order → token stream.
    * Genuinely imperative per-row work (each merge pass mutates the
    * symbol sequence the next pass reads), so this is the documented
    * mapPartitions case — the model rides the closure (KB-scale), the
    * pass is map-side with zero shuffle, and rows never leave their
    * partition. */
  def bpeEncode(spark: SparkSession, dir: String,
                model: BpeModel): DataFrame = {
    import spark.implicits._
    val merges = model.merges.map(m => (m.left, m.right, m.merged))
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"), lower(col("text")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val tokens = text.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
            var syms = (w.map(_.toString) :+ "</w>").toArray
            merges.foreach { case (a, b, m) =>
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                  out += m; i += 2
                } else { out += syms(i); i += 1 }
              }
              syms = out.toArray
            }
            syms
          }.toSeq
          (id, tokens, tokens.size)
        }
      }.toDF("doc_id", "tokens", "n_tokens")
    toks
  }

  /** [[bpeFit]] as a driver-verifiable query, in the repo's
    * invariant-oracle form ([[Similarity.kmeansFitReport]] precedent) —
    * but with an EXACT anchor: BPE's first merge is plain SQL (the
    * argmax character pair over weighted word types), so the oracle
    * recomputes it independently while pinning the loop's structural
    * guarantees as booleans:
    *  - `freq_monotone`: the chosen pair's frequency never increases
    *    step over step (a new pair (x, ab) can occur at most count(ab)
    *    times, and count(ab) was the maximal count when ab was chosen);
    *  - `vocab_ok`: merged tokens are distinct and each equals
    *    left||right;
    *  - `parts_known`: every merge operand is a base symbol (single
    *    char or the </w> end-of-word marker) or an earlier merge's
    *    output — the property that makes the merge list a decodable
    *    tokenizer. */
  def bpeFitReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ms = bpeFitCached(spark, dir).merges
    val vocabOk = ms.nonEmpty &&
      ms.forall(m => m.merged == m.left + m.right) &&
      ms.map(_.merged).distinct.size == ms.size
    val partsKnown = ms.zipWithIndex.forall { case (m, i) =>
      val earlier = ms.take(i).map(_.merged).toSet
      Seq(m.left, m.right).forall(p =>
        p.length == 1 || p == "</w>" || earlier.contains(p))
    }
    val freqMonotone = ms.zip(ms.drop(1)).forall { case (x, y) => y.freq <= x.freq }
    // a corpus with no repeatable adjacency fits ZERO merges — report it
    // (vocab_ok already false) instead of crashing on ms.head
    val first = ms.headOption
    Seq((ms.size, first.map(_.left).orNull, first.map(_.right).orNull,
      first.map(_.freq).getOrElse(0L),
      vocabOk, partsKnown, freqMonotone))
      .toDF("n_merges", "first_left", "first_right", "first_freq",
        "vocab_ok", "parts_known", "freq_monotone")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_fit" -> ((s, d) => bpeFitReport(s, d)),
    "text_source_drift" -> ((s, d) => sourceDrift(s, d)),
    "text_cms_epochs" -> ((s, d) => cmsEpochs(s, d)),
    "text_bm25_topk" -> ((s, d) => bm25TopK(s, d)),
    "text_entropy" -> entropy,
    "text_tfidf_topk" -> ((s, d) => tfidfTopK(s, d)),
    "text_normalize" -> normalize,
    "text_vocab_topk" -> ((s, d) => vocabTopK(s, d)),
    "text_heavy_hitters" -> ((s, d) => heavyHitters(s, d)),
    "text_stats" -> stats,
    "text_tokens" -> tokens,
    "text_langid" -> langId,
    "text_fingerprint" -> fingerprint,
    "text_quality_filter" -> qualityFilter,
    "text_corpus_stats" -> corpusStats,
    "text_length_quantiles" -> lengthQuantiles,
    "text_unigram_logprob" -> unigramLogprob,
    "text_bpe_merge_candidates" -> ((s, d) => bpeMergeCandidates(s, d))
  )

  val oracles: Map[String, String] = Map(
    // exact first-merge anchor (argmax weighted char pair, same
    // freq-desc/lexicographic tie-break) + the loop's structural
    // invariants pinned true; integer arithmetic, so no float tolerance
    "text_bpe_fit" ->
      """WITH w AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
        |           FROM documents),
        |wn AS (SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY word),
        |pr AS (SELECT substr(word, i, 1) AS l,
        |         CASE WHEN i = len(word) THEN '</w>'
        |              ELSE substr(word, i + 1, 1) END AS r,
        |         n
        |       FROM wn, unnest(generate_series(1, len(word))) AS t(i)),
        |top AS (SELECT l, r, sum(n) AS freq FROM pr GROUP BY l, r
        |        ORDER BY freq DESC, l, r LIMIT 1)
        |SELECT CAST(12 AS INTEGER) AS n_merges, l AS first_left,
        |  r AS first_right, CAST(freq AS BIGINT) AS first_freq,
        |  true AS vocab_ok, true AS parts_known, true AS freq_monotone
        |FROM top""".stripMargin,
    // same unigram distributions, same ln ratio sum (subset property of
    // per-source vocab means no smoothing on either side)
    "text_source_drift" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |st AS (SELECT source, token, count(*) AS n_st FROM tok
        |       WHERE token <> '' GROUP BY source, token),
        |c AS (SELECT token, sum(n_st) AS n_t FROM st GROUP BY token),
        |t AS (SELECT source, sum(n_st) AS n_s FROM st GROUP BY source),
        |a AS (SELECT sum(n_t) AS n_all FROM c)
        |SELECT st.source, CAST(max(t.n_s) AS BIGINT) AS n_tokens,
        |  round(sum((CAST(st.n_st AS DOUBLE) / t.n_s) *
        |            ln((CAST(st.n_st AS DOUBLE) / t.n_s) /
        |               (CAST(c.n_t AS DOUBLE) / a.n_all))), 6) AS kl_divergence
        |FROM st JOIN c USING (token) JOIN t USING (source), a
        |GROUP BY st.source ORDER BY st.source""".stripMargin,
    // exact true counts replayed; the sketch invariants (exact merge,
    // no-undercount, eps-bound) are asserted in-query and must be true
    "text_cms_epochs" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents)
        |SELECT token, count(*) AS true_n,
        |  TRUE AS merge_exact, TRUE AS no_undercount, TRUE AS within_bound
        |FROM tok
        |WHERE token IN ('join', 'scan', 'stream', 'table', 'the')
        |GROUP BY token ORDER BY token""".stripMargin,
    // full Okapi BM25 replay: same tf/df/dl/avgdl, Lucene idf variant,
    // k1=1.2 b=0.75; ln parity with Spark's log holds at round-6 (the
    // text_unigram_logprob precedent)
    "text_bm25_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> ''
        |       GROUP BY doc_id, token),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |df AS (SELECT token, count(*) AS df FROM tf
        |       WHERE token IN ('join', 'stream', 'window') GROUP BY token),
        |s AS (SELECT tf.doc_id,
        |        ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |          (tf.tf * (1.2 + 1.0)) /
        |          (tf.tf + (1.0 - 0.75 + dl.dl / st.avgdl * 0.75) * 1.2) AS ts
        |      FROM tf JOIN df USING (token) JOIN dl USING (doc_id), st)
        |SELECT doc_id, round(sum(ts), 6) AS bm25, count(*) AS n_terms_hit
        |FROM s GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
    // grouped-sketch invariant form: exact per-group percentiles
    // value-checked; the sketch rank bounds asserted in-query
    "text_length_quantiles" ->
      """SELECT source,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 4) AS len_p50,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 4) AS len_p90,
        |  count(*) AS n_docs, TRUE AS p50_ok, TRUE AS p90_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "text_unigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tk AS (SELECT doc_id, token FROM t WHERE token <> ''),
        |c AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token),
        |n AS (SELECT count(*) AS n_total FROM tk)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(CAST(cnt AS DOUBLE) / n_total)), 6) AS avg_logprob
        |FROM tk JOIN c USING (token), n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // adjacent pairs replayed by list index; same tie-break order
    "text_bpe_merge_candidates" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT ws[i] AS token, ws[i + 1] AS next
        |      FROM w, unnest(generate_series(1, len(ws) - 1)) AS u(i))
        |SELECT token, next, count(*) AS n
        |FROM p GROUP BY token, next
        |ORDER BY n DESC, token, next LIMIT 20""".stripMargin,
    "text_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> ''
        |       GROUP BY doc_id, token)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(ln(CAST(sum(tf) AS DOUBLE)) -
        |        sum(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE))) / sum(tf), 6)
        |    AS token_entropy
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // tf, N, df are integers, so tf·ln(N/df) is computed from identical
    // operands in both engines — scores (and thus ranks) agree exactly
    "text_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> ''
        |       GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |r AS (SELECT tf.doc_id, tf.token, tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS score,
        |        row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) DESC, tf.token) AS rk
        |      FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, token, round(score, 6) AS tfidf
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "text_normalize" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |       ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_raw,
        |  CAST(length(norm) AS INTEGER) AS n_chars_norm,
        |  md5(norm) AS norm_md5,
        |  substring(norm, 1, 40) AS norm_prefix
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_vocab_topk" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    // the Misra-Gries guarantee: exact heavy hitters (> n/(k+1)) must all
    // be sketch candidates — the engine emits exactHH ⋈ candidates, so
    // this exact-HH oracle row-matches iff containment holds
    "text_heavy_hitters" ->
      """WITH t AS (SELECT token
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token <> ''),
        |c AS (SELECT token, count(*) AS n FROM t GROUP BY token),
        |tot AS (SELECT count(*) AS total FROM t)
        |SELECT token, n FROM c, tot WHERE n > total / 33.0
        |ORDER BY n DESC, token""".stripMargin,
    // the engine's wrapping-long Karp–Rabin recurrence, replayed with
    // HUGEINT mod-2^64 arithmetic and folded back to signed BIGINT
    // (code-unit == codepoint holds: the corpus is ASCII)
    "text_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(0::HUGEINT,
        |        list_transform(range(1, length(norm) + 1),
        |          i -> CAST(unicode(norm[i]) AS HUGEINT))),
        |      (acc, c) -> (acc * 1000003 + c) % 18446744073709551616::HUGEINT) AS m
        |  FROM n)
        |SELECT doc_id,
        |  CAST(CASE WHEN m >= 9223372036854775808::HUGEINT
        |            THEN m - 18446744073709551616::HUGEINT ELSE m END AS BIGINT) AS fingerprint
        |FROM h ORDER BY doc_id""".stripMargin,
    // lexicon argmax is deterministic and SQL-expressible: the cascading
    // CASE fires on the FIRST language reaching the global max score —
    // exactly the engine's greatest(struct(score, -ord)) tie-break
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
        |s AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(words, w -> w IN ('the','a','and','of'))) AS INTEGER) AS s_en,
        |  CAST(len(list_filter(words, w -> w IN ('la','el','los','de'))) AS INTEGER) AS s_es,
        |  CAST(len(list_filter(words, w -> w IN ('der','die','das','und'))) AS INTEGER) AS s_de,
        |  CAST(len(list_filter(words, w -> w IN ('le','les','des','et'))) AS INTEGER) AS s_fr,
        |  CAST(len(list_filter(words, w -> w IN ('de5','shi4','le5','he2'))) AS INTEGER) AS s_zh
        |  FROM t)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang,
        |  CAST(greatest(s_en, s_es, s_de, s_fr, s_zh) AS INTEGER) AS marker_hits
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      """WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id, lang,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(words), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(words, w -> w = 'the' OR w = 'a')) AS DOUBLE) / len(words), 4) AS stopword_ratio,
        |  CAST(len(list_distinct(words)) AS INTEGER) AS n_unique_words
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |          len(string_split(text, ' ')), 4) AS unique_ratio
        |  FROM documents),
        |d AS (
        |  SELECT *, CASE WHEN n_words < 20 THEN 'too_short'
        |                 WHEN n_words > 5000 THEN 'too_long'
        |                 WHEN unique_ratio < 0.35 THEN 'repetitive'
        |            END AS drop_reason
        |  FROM t)
        |SELECT doc_id, lang, n_words, unique_ratio, drop_reason,
        |  drop_reason IS NULL AS keep
        |FROM d ORDER BY doc_id""".stripMargin,
    "text_corpus_stats" ->
      """WITH t AS (SELECT lang, len(string_split(text, ' ')) AS n_words FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_tokens,
        |  round(avg(n_words), 4) AS avg_tokens,
        |  round(quantile_cont(n_words, 0.5), 4) AS p50_tokens,
        |  round(quantile_cont(n_words, 0.9), 4) AS p90_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin
  )
}
