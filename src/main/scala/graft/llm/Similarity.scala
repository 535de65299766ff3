package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.vec_cosine
import graft.schema.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * - Brute-force top-k: the correctness baseline. Cosine runs in the
  *   whole-stage-codegen'd [[graft.functions.VecCosine]] expression; the
  *   query vector rides along as a broadcast (a literal-free cross join of
  *   a 1-row dimension), and top-k is TakeOrderedAndProject — per-partition
  *   heap + driver merge of k rows, never a global sort.
  * - IVF: the scale path. Vectors are assigned to their nearest centroid
  *   once (map-side against a broadcast centroid set); a query probes only
  *   `nprobe` clusters ⇒ scan cost drops by ~nClusters/nprobe. [[ivfTopK]]
  *   uses the deterministic first-16 seeding (the oracle-able baseline);
  *   [[kmeansFit]] trains centroids to convergence in-engine (spherical
  *   Lloyd on a bounded sample) and [[ivfTopKModel]] probes the trained
  *   model — recall of trained ≥ seeded is pinned in LlmSpec.
  */
object Similarity {

  /** Exact cosine top-k for one query vector (vec_id = `queryId`). */
  def bruteForceTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        vec_cosine(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("cosine"), 6).as("cosine"))
  }

  /** Cluster assignment: nearest centroid per vector, computed entirely
    * map-side. The centroid set is a MODEL, not data (nClusters × dim
    * floats, a few KB): it is collected once and inlined as array literals,
    * so every vector scores all centroids inside one codegen'd projection —
    * the corpus is never replicated, shuffled, or window-sorted. (The
    * previous formulation ran row_number() over a ×nClusters-replicated
    * corpus: a full exchange of 16× the data, fatal at 100 TB.)
    * Deterministic argmax tie-break toward the lowest centroid id via
    * greatest(struct(sim, -id, id)). */
  def assignClusters(spark: SparkSession, dir: String, nClusters: Int = 16): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val centroids: Array[(Int, Array[Float])] = emb.filter(col("vec_id") < nClusters)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val scored = centroids.map { case (cid, vec) =>
      struct(
        vec_cosine(col("embedding"), typedLit(vec)).as("sim"),
        lit(-cid).as("ord"),
        lit(cid).as("centroid_id"))
    }
    // deliberately NOT repartitioned here: assignment is a narrow
    // scan→project; consumers that fan out CPU-heavy work afterwards
    // (the near-dup pair join) widen with Tables.parallelized themselves
    emb.select(col("vec_id"), col("label"), col("embedding"),
      greatest(scored.toIndexedSeq: _*).getField("centroid_id").as("centroid_id"))
  }

  /** Cluster population histogram (diagnostic + oracle-free smoke). */
  def ivfClusterSizes(spark: SparkSession, dir: String): DataFrame =
    assignClusters(spark, dir)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("centroid_id"))

  /** IVF approximate top-k: probe the query's `nprobe` nearest clusters
    * only. Recall vs brute force is pinned in LlmSpec. */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10,
              nprobe: Int = 4, nClusters: Int = 16): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < nClusters)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("centroid_id"), vec_cosine(col("c_emb"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id"))
    assignClusters(spark, dir, nClusters)
      .join(broadcast(probed), "centroid_id")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        vec_cosine(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("cosine"), 6).as("cosine"))
  }

  /** Batched retrieval: exact per-query top-k for a SET of query vectors
    * in one corpus pass — the production shape (a query batch arrives,
    * the corpus is scored once, results fan back per query). The query
    * batch is broadcast (batches are KBs, corpora are TBs); only the
    * (query_id, vec_id, cosine) triple reaches the ranking window's
    * shuffle, partitioned by query_id. */
  def batchTopK(spark: SparkSession, dir: String, k: Int = 5,
                queryStride: Int = 100): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val queryBatch = emb.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    Tables.parallelized(emb).crossJoin(broadcast(queryBatch))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        vec_cosine(col("embedding"), col("q_emb")).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Embedding hygiene stats: dimension, L2 norm, mean component, max
    * |component| per vector — the pre-index sanity pass (catch zero /
    * denormalized / broken vectors before building an ANN index). Pure
    * map-side higher-order-function arithmetic; every element is cast to
    * double BEFORE multiplication so the accumulation matches the oracle's
    * DOUBLE[] arithmetic bit-for-bit. */
  def embeddingNorms(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding")
    val sumSq = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val sumV = aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double"))
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        size(v).as("dim"),
        round(sqrt(sumSq), 4).as("l2_norm"),
        round(sumV / size(v), 6).as("mean_val"),
        round(array_max(transform(v, x => abs(x))).cast("double"), 6).as("max_abs"))
      .orderBy(col("vec_id"))
  }

  /** Symmetric int8 quantization preview: per-vector scale = max|v|/127,
    * q_i = round(v_i/scale) ∈ [−127, 127] (no clamp needed — the scale is
    * the vector's own max). Emits scalar digests (first code, code sum,
    * saturated count) rather than the int8 array itself, keeping the
    * output hashable for the driver while pinning every element through
    * the sum. Map-side only — the quantizer is a projection, applied
    * before vectors ever reach an index build or shuffle (4× less traffic
    * than float32 at 100 TB). */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding")
    val scale = array_max(transform(v, x => abs(x))).cast("double") / lit(127.0)
    Tables(spark, dir, "embeddings")
      .withColumn("scale", scale)
      .withColumn("qv", transform(v, x => round(x.cast("double") / col("scale")).cast("int")))
      .select(col("vec_id"),
        round(col("scale"), 8).as("scale"),
        element_at(col("qv"), 1).as("q0"),
        aggregate(col("qv"), lit(0L), (acc, q) => acc + q.cast("long")).as("q_sum"),
        size(filter(col("qv"), q => abs(q) === 127)).as("n_saturated"))
      .orderBy(col("vec_id"))
  }

  /** One Lloyd (k-means) update step for the IVF centroids: assign every
    * vector map-side (zero corpus shuffle, see [[assignClusters]]), then
    * average per (cluster, dimension). This is the training loop the
    * deterministic first-16 seeding stands in for — expressed as a query,
    * it shows the full k-means fit is runnable in-engine: iterate
    * assignment→mean with the new centroids re-broadcast each round.
    * Output is (centroid, dim, mean) rows — 16×64 scalars, not arrays, so
    * the driver compare can hash it and the exchange carries k·d partial
    * sums, never vectors. */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    assignClusters(spark, dir)
      .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("mean_val"),
           count(lit(1)).as("n_assigned"))
      .orderBy(col("centroid_id"), col("dim"))

  /** One iteration's diagnostics from [[kmeansFit]]. `objective` is
    * Σ(1 − cos(v, c_assigned)) under the model the iteration ASSIGNED
    * with; `nChanged` counts vectors whose assignment differs from the
    * previous iteration's (−1 on the first, where there is no previous). */
  final case class KmeansIter(iter: Int, nChanged: Long, objective: Double)
  /** `converged` = the loop stopped on its own criterion (assignment
    * fixpoint, or relative objective improvement below `tol` — the
    * standard Lloyd stopping rule; the long assignment tail on a large
    * sample can flip single points for tens of iterations after the
    * objective has flatlined), not on the iteration cap. */
  final case class KmeansModel(centroids: Array[(Int, Array[Double])],
                               history: Seq[KmeansIter], converged: Boolean)

  /** Full SPHERICAL k-means fit to convergence, in-engine — the training
    * loop [[kmeansStep]] is one step of, closing the "deterministic
    * first-16 seeding stands in for a k-means fit" caveat. Assignment is
    * by cosine, so the correct Lloyd update is the mean of
    * direction-NORMALIZED members (Dhillon & Modha 2001, public):
    * cos(v,c) = (v/‖v‖)·(c/‖c‖), so Σ_i cos(v_i,c) is maximized by
    * c ∝ Σ_i v_i/‖v_i‖ — with that update the objective
    * Σ(1 − cos) is provably non-increasing and assignments reach a
    * fixpoint (both pinned in LlmSpec).
    *
    * Scale shape per iteration: ONE corpus pass. The current AND previous
    * models ride as literals inside a single codegen'd projection (so
    * `nChanged` costs nothing extra); the pass aggregates per
    * (cluster, dim) normalized-component sums — k·d + k rows cross the
    * exchange, never a vector — and the driver folds those KBs into the
    * next model. Empty clusters keep their previous centroid. Stops at
    * assignment fixpoint (nChanged = 0) or `maxIters`. */
  def kmeansFit(spark: SparkSession, dir: String, nClusters: Int = 16,
                maxIters: Int = 10, trainSampleMod: Int = 4,
                tol: Double = 1e-3): KmeansModel = {
    val emb = Tables(spark, dir, "embeddings")
    // Train on a deterministic 1/trainSampleMod corpus sample — the
    // standard ANN-training posture (Faiss/ScaNN train coarse quantizers
    // on a bounded sample regardless of corpus size), which is what keeps
    // the fit O(sample) while the INDEX stays O(corpus): assignment of
    // the full corpus happens once, outside this loop.
    val train = if (trainSampleMod <= 1) emb
      else emb.filter(col("vec_id") % trainSampleMod === 0)
    // init = the deterministic first-k sample (the old stand-in, now just
    // the seeding; KB-scale model fetch)
    val seed: Array[(Int, Array[Double])] = emb.filter(col("vec_id") < nClusters)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    // re-number centroids 0..k-1 so ids are stable across iterations
    var model: Array[Array[Double]] = seed.map(_._2)
    var prev: Array[Array[Double]] = model
    val history = scala.collection.mutable.ArrayBuffer.empty[KmeansIter]
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      iter += 1
      val assignCur = assignExpr(model)
      val assignPrev = assignExpr(prev)
      val stats = train
        .select(normalizedVec(col("embedding")).as("vn"))
        // field extraction happens BEFORE the generator projection: a
        // posexplode in the same select re-analyzes the lambda-bearing
        // structs with placeholder field names (colN) and getField fails;
        // Catalyst collapses the adjacent projections regardless
        .select(
          assignCur.getField("centroid_id").as("cid"),
          assignCur.getField("sim").as("sim"),
          (assignCur.getField("centroid_id") =!=
            assignPrev.getField("centroid_id")).as("changed"),
          col("vn"))
        .select(col("cid"), col("sim"), col("changed"),
          posexplode(col("vn")).as(Seq("dim", "xn")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("xn")).as("sx"), count(lit(1)).as("n"),
          // row-level terms counted once via the dim-0 slice of the explode
          sum(when(col("dim") === 0, lit(1.0) - col("sim"))).as("obj0"),
          sum(when(col("dim") === 0 && col("changed"), 1L)
            .otherwise(0L)).as("chg0"))
        .collect() // k·d rows of scalars — model-scale, documented fetch
      val next = Array.tabulate(nClusters)(c => model(c).clone())
      var objective = 0.0
      var nChanged = 0L
      val counts = Array.fill(nClusters)(0L)
      stats.foreach { r =>
        val (c, d) = (r.getAs[Int]("cid"), r.getAs[Int]("dim"))
        next(c)(d) = r.getAs[Double]("sx") / r.getAs[Long]("n")
        if (d == 0) {
          counts(c) = r.getAs[Long]("n")
          objective += Option(r.getAs[java.lang.Double]("obj0")).map(_.doubleValue).getOrElse(0.0)
          nChanged += r.getAs[Long]("chg0")
        }
      }
      (0 until nClusters).foreach(c => if (counts(c) == 0L)
        next(c) = model(c)) // empty cluster: carry the centroid forward
      val prevObjective = history.lastOption.map(_.objective)
      history += KmeansIter(iter,
        if (iter == 1) -1L else nChanged, objective)
      converged = (iter > 1 && nChanged == 0L) ||
        prevObjective.exists(po => po - objective <= tol * po)
      prev = model
      model = next
    }
    KmeansModel(model.zipWithIndex.map { case (c, i) => (i, c) },
      history.toSeq, converged)
  }

  /** The embedding scaled to unit length in one projection — computed
    * ONCE per row so the per-centroid scoring below is a bare dot
    * product (cos(v,c) = v̂·ĉ), instead of re-deriving ‖v‖ inside every
    * centroid's struct. */
  private def normalizedVec(v: Column): Column = {
    val nv = sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    transform(v, x => x.cast("double") / nv)
  }

  /** Map-side nearest-centroid argmax over an inlined double-precision
    * model — the [[assignClusters]] posture generalized to trained
    * centroids. Operates on a pre-normalized `vn` column
    * ([[normalizedVec]]); centroids are normalized driver-side, so each
    * cell costs one zip_with fold. Returns the (sim, ord, centroid_id)
    * struct so callers can read both the winning id and its similarity. */
  private def assignExpr(model: Array[Array[Double]]): Column = {
    val scored = model.zipWithIndex.map { case (c, cid) =>
      val normC = math.sqrt(c.map(x => x * x).sum)
      val cn = c.map(_ / normC)
      val dot = aggregate(
        zip_with(col("vn"), typedLit(cn.toSeq), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      struct(dot.as("sim"), lit(-cid).as("ord"), lit(cid).as("centroid_id"))
    }
    greatest(scored.toIndexedSeq: _*)
  }

  /** IVF top-k over an arbitrary (e.g. TRAINED) centroid model. The probe
    * is decided entirely on the driver — the model and the query vector
    * are both local KBs, so choosing the nprobe nearest cells costs zero
    * Spark jobs — and the corpus pass is one CODEGEN'D
    * assign+filter+score projection feeding TakeOrdered, riding the
    * native [[graft.functions.VecCosine]] like [[assignClusters]] (the
    * HOF fold composition is CodegenFallback — interpreted per row, ~10×
    * slower over the corpus; centroids are float-cast for it, which
    * moves cell boundaries by float-rounding only — the training loop
    * itself stays double). At 100 TB with a cell-partitioned layout
    * ([[graft.stream.StreamSync]]'s vector index) the same probe list
    * becomes partition pruning. */
  def ivfTopKModel(spark: SparkSession, dir: String,
                   model: Array[(Int, Array[Double])], queryId: Long = 0L,
                   k: Int = 10, nprobe: Int = 4): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qvec: Array[Float] = emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    def cosLocal(a: Array[Float], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val probed = model.sortBy { case (cid, c) => (-cosLocal(qvec, c), cid) }
      .take(nprobe).map(_._1).toSet
    val scored = model.sortBy(_._1).map { case (cid, c) =>
      struct(vec_cosine(col("embedding"), typedLit(c.map(_.toFloat))).as("sim"),
        lit(-cid).as("ord"), lit(cid).as("centroid_id"))
    }
    emb.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), col("embedding"),
        greatest(scored.toIndexedSeq: _*).getField("centroid_id").as("centroid_id"))
      .filter(col("centroid_id").isInCollection(probed))
      .select(col("vec_id"), col("label"),
        vec_cosine(col("embedding"), typedLit(qvec)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("cosine"), 6).as("cosine"))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH — the second ANN scale
    * path beside IVF. Plane j's components are ±1 by the parity of the
    * first hex digit of md5("j_d"): deterministic, seedless, and exactly
    * replayable in SQL (DuckDB md5 agrees byte-for-byte), which is what
    * makes the whole family oracle-able. Planes are a MODEL (nBits × dim
    * doubles, ~KB) inlined as literals, so signatures are one codegen'd
    * map-side projection — the corpus is never shuffled to be signed. */
  private def rpPlanes(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (j, d) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${j}_${d}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
    }

  /** nBits-bit signature: bit j set iff v · plane_j ≥ 0. Elements cast to
    * double before multiply-accumulate so DuckDB DOUBLE[] replay agrees. */
  private def rpSignature(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(aggregate(zip_with(v, typedLit(p.toSeq), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  val RpBits = 16

  /** Signature-bucket histogram (the LSH twin of [[ivfClusterSizes]]):
    * bucket = exact 16-bit signature. At scale, batch ANN joins corpus and
    * queries on this key (plus multiprobe neighbors) — only (vec_id, sig)
    * pairs ever cross an exchange. */
  def rpBucketSizes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(rpSignature(col("embedding"), rpPlanes(RpBits, 64)).as("signature"))
      .groupBy(col("signature")).agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("signature"))

  /** LSH approximate top-k for one query: candidates = vectors whose
    * signature is within `maxHamming` bits of the query's (P(a bit
    * differs) = angle/π, so near neighbors land close in Hamming space),
    * verified with exact codegen'd cosine. The signature scan is a
    * map-side filter over 2-byte sigs + broadcast query — the corpus is
    * pruned to P(Binomial(16, angle/π) ≤ maxHamming) before any cosine
    * is computed. Radius tuning is the recall knob: on corpora with true
    * near-duplicates (cosine ≥ 0.8 ⇒ expected Hamming ≤ ~3) a tight
    * radius gives both high recall and ~100× pruning; this synthetic
    * corpus's nearest neighbors sit at cosine ≈ 0.3–0.5 (near the random
    * regime), so the default radius 6 trades ~4× pruning for ~0.4
    * recall@10 — measured, and pinned alongside IVF's recall in LlmSpec. */
  def rpTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10,
             maxHamming: Int = 6): DataFrame = {
    val planes = rpPlanes(RpBits, 64)
    val sigs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        rpSignature(col("embedding"), planes).as("sig"))
    val q = sigs.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("sig").as("q_sig"))
    sigs.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("hamming", bit_count(col("sig").bitwiseXOR(col("q_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("vec_id"), col("label"), col("hamming").cast("int").as("hamming"),
        vec_cosine(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("hamming"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Product quantization (PQ) ANN — the third scale path beside IVF and
    * random-hyperplane LSH, and the one that compresses the CORPUS: each
    * 64-dim float vector (256 B) becomes M=8 one-byte codes (8 B, 32×),
    * one code per 8-dim subspace = the argmin codeword of that subspace's
    * codebook. A query never touches raw corpus vectors: it precomputes an
    * M×K table of query↔codeword distances (ADC — asymmetric distance
    * computation), and each corpus vector scores as Σ_s adc[s][code_s] —
    * M table lookups instead of a 64-dim float loop.
    *
    * Determinism/oracle: codebooks are the first K=16 vectors' sub-slices
    * (the same "deterministic sample stands in for the k-means fit"
    * seeding as IVF — [[kmeansStep]] is the trainer the seeding stands in
    * for, run per subspace); codeword ties break to the lowest code. That
    * makes encode + ADC fully replayable in DuckDB SQL.
    *
    * Scale posture: the codebook and ADC table are a MODEL (M·K·8 doubles,
    * ~KB) inlined as literals, and the codes are computed ONCE at ingest
    * ([[pqCodeTable]], the 32×-compressed representation PQ exists for)
    * — the query reads ONLY (vec_id, label, codes), never a raw corpus
    * vector: M array lookups per row, zero shuffle before the top-k
    * (TakeOrdered). At 100 TB the raw-embedding scan this replaces is the
    * dominant cost; the code table is 32× smaller. */

  /** Codebook model: sub-slice c of seed vector k per subspace — the
    * deterministic stand-in for a per-subspace k-means fit ([[kmeansStep]]
    * is the trainer). KB-scale collect, documented model fetch. */
  private def pqCodebook(spark: SparkSession, dir: String, subspaces: Int,
                         subDim: Int, codebookSize: Int): Array[Array[Array[Double]]] = {
    val seeds: Map[Int, Array[Double]] =
      Tables(spark, dir, "embeddings").filter(col("vec_id") < codebookSize)
        .select(col("vec_id").cast("int"), col("embedding"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    Array.tabulate(subspaces, codebookSize)((s, c) =>
      seeds(c).slice(s * subDim, (s + 1) * subDim))
  }

  /** Ingest-time PQ encode, materialized once per (session, source dir):
    * each vector's M argmin codewords (ties → lowest code) land in an
    * `array<int>` column (production packs them into M bytes — same
    * information, 8 B/vector). One map-side compiled pass over the corpus,
    * zero shuffle; every later PQ query reads codes, not vectors. */
  /** Staleness key for the materialized code table: source dir + the
    * (name, length, mtime) set of the embeddings parquet parts, hashed.
    * Regenerating the corpus mid-session changes the fingerprint, so the
    * next PQ query rebuilds codes instead of serving stale ones (the
    * poor-man's snapshot id of a table that has no
    * [[graft.table.SnapshotLog]]). */
  private def embeddingsFingerprint(spark: SparkSession, dir: String): String =
    graft.schema.Tables.fingerprint(spark, dir, "embeddings")

  private def pqCodeTable(spark: SparkSession, dir: String, subspaces: Int,
                          subDim: Int, codebookSize: Int): DataFrame = {
    val tbl = s"graft_pqcodes_${embeddingsFingerprint(spark, dir)}"
    if (!spark.catalog.tableExists(tbl)) {
      val codebook = pqCodebook(spark, dir, subspaces, subDim, codebookSize)
      def subCode(s: Int): Column = {
        val slce = slice(col("embedding"), s * subDim + 1, subDim)
        val scored = (0 until codebookSize).map { c =>
          val d = aggregate(
            zip_with(slce, typedLit(codebook(s)(c).toSeq),
              (x, cw) => (x.cast("double") - cw) * (x.cast("double") - cw)),
            lit(0.0), (acc, x) => acc + x)
          struct((-d).as("nd"), lit(-c).as("ord"), lit(c).as("code"))
        }
        greatest(scored: _*).getField("code") // max(-dist) = min dist; ties → lowest code
      }
      val base = java.nio.file.Files.createTempDirectory("graft-pq").toString
      Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          array((0 until subspaces).map(subCode): _*).as("codes"))
        .write.format("parquet").option("path", s"$base/$tbl")
        .mode("overwrite").saveAsTable(tbl)
    }
    spark.table(tbl)
  }

  def pqTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10,
             subspaces: Int = 8, subDim: Int = 8, codebookSize: Int = 16): DataFrame = {
    val codebook = pqCodebook(spark, dir, subspaces, subDim, codebookSize)
    val qvec: Array[Double] = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).toArray.map(_.toDouble)
    // adc[s][k] = ||q_s − cb[s][k]||² — the per-query model, inlined
    val adc = Array.tabulate(subspaces, codebookSize) { (s, c) =>
      qvec.slice(s * subDim, (s + 1) * subDim)
        .zip(codebook(s)(c)).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val dist = (0 until subspaces)
      .map(s => element_at(typedLit(adc(s).toSeq),
        element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    pqCodeTable(spark, dir, subspaces, subDim, codebookSize)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), round(dist, 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(k)
  }

  /** Retrieval + rerank, the two-stage production search shape: ANN
    * retrieval pulls kRetrieve candidates by embedding cosine, then the
    * rerank stage joins ONLY those candidates (broadcast — k rows, never
    * the corpus) against the document store by key and re-scores with a
    * text-quality prior (cosine × unique-token ratio). The corpus is
    * touched once by retrieval; rerank cost is O(k). vec_id ↔ doc_id is
    * the testdata's cross-modal key. Score is floor-ppm of a product of
    * values both engines already agree on bit-for-bit (rounded cosine,
    * small-int ratio) — no rounding ties. */
  def retrieveRerank(spark: SparkSession, dir: String, queryId: Long = 0L,
                     kRetrieve: Int = 50, k: Int = 10): DataFrame = {
    val cands = bruteForceTopK(spark, dir, queryId, kRetrieve)
      .select(col("vec_id"), col("cosine"))
    val words = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .join(broadcast(cands), col("doc_id") === col("vec_id"))
      .withColumn("unique_ratio",
        size(array_distinct(words)).cast("double") / size(words))
      .select(col("doc_id"), col("lang"), col("cosine"),
        round(col("unique_ratio"), 4).as("unique_ratio"),
        floor(col("cosine") * col("unique_ratio") * lit(1e6))
          .cast("long").as("rerank_ppm"))
      .orderBy(col("rerank_ppm").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-class centroid outliers — embedding-space QA for a labeled
    * corpus (mislabeled / off-distribution members surface as the vectors
    * least similar to their own class centroid). Centroids are built
    * relationally (posexplode → per-(label, dim) mean → re-assembled
    * array), then the |labels|·d table broadcasts back and every
    * vector's cosine-to-own-centroid is a map-side zip_with fold — the
    * corpus never shuffles, mirroring the IVF/k-means model-broadcast
    * posture. Bottom-k per label via one window over (label, cosine).
    */
  def centroidOutliers(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col("embedding")
    val cent = Tables(spark, dir, "embeddings")
      .select(col("label"), posexplode(v).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p.getField("m")).as("cvec"))
    val dot = aggregate(zip_with(v, col("cvec"), (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    val nv = sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nc = sqrt(aggregate(col("cvec"), lit(0.0), (acc, x) => acc + x * x))
    Tables(spark, dir, "embeddings")
      .join(broadcast(cent), "label")
      .select(col("label"), col("vec_id"), (dot / (nv * nc)).as("cos_raw"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("cos_raw"), col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("label"), col("rk"), col("vec_id"),
        round(col("cos_raw"), 6).as("cosine"))
      .orderBy(col("label"), col("rk"))
  }

  /** Maximum-inner-product top-k (MIPS) — the recommendation/retrieval
    * scoring mode where vector NORM carries signal (popularity, quality
    * priors baked into magnitudes), so cosine's normalization is wrong by
    * design. Same scale posture as [[bruteForceTopK]]: broadcast 1-row
    * query, one codegen'd map-side dot pass, per-partition top-k heap via
    * TakeOrdered. (At scale MIPS reduces to cosine-ANN by augmenting
    * each vector with sqrt(M² − ‖x‖²); this exact form is that
    * reduction's recall baseline.) */
  def dotTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val dot = aggregate(
      zip_with(col("embedding"), col("q_emb"), (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), dot.as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("dot"), 6).as("dot"))
  }

  /** Hard-negative mining for contrastive / embedding training: for each
    * anchor (every `queryStride`-th vector), the top-k most-similar
    * vectors with a DIFFERENT label — the negatives that sit closest to
    * the decision boundary and carry the most gradient signal. Anchors
    * are a model-scale set (|corpus|/stride rows) broadcast to the
    * corpus; cosines are computed map-side in one codegen'd projection
    * and the per-anchor top-k is taken by the bounded-heap
    * [[graft.functions.TopKByAgg]] with partial aggregation, so only
    * ≤k (cosine, negative) pairs per anchor PER PARTITION cross the one
    * exchange — never the |corpus|×|anchors| cross-label rows, and the
    * corpus is never self-joined. At 100 TB the anchor batch rides
    * the same IVF/RP bucketing as [[ivfTopK]] to prune the scan; the
    * brute-force form here is the exact baseline that variant must
    * recall-match. */
  def hardNegatives(spark: SparkSession, dir: String, k: Int = 5,
                    queryStride: Int = 100): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val anchors = emb.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
        col("embedding").as("a_emb"))
    Tables.parallelized(emb).crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"), col("vec_id"),
        col("label").as("neg_label"),
        vec_cosine(col("embedding"), col("a_emb")).as("cosine"))
      // ord (cosine, -vec_id) breaks ties exactly like the window idiom's
      // ORDER BY cosine DESC, vec_id ASC
      .groupBy(col("anchor_id"), col("anchor_label"))
      .agg(graft.functions.GraftFunctions.topk_by(
        struct(col("cosine"), (-col("vec_id")).as("neg_id")),
        struct(col("vec_id"), col("neg_label"), col("cosine")), k).as("top"))
      .select(col("anchor_id"), col("anchor_label"), posexplode(col("top")))
      .select(col("anchor_id"), (col("pos") + 1).cast("int").as("rk"),
        col("col.vec_id").as("vec_id"), col("anchor_label"),
        col("col.neg_label").as("neg_label"),
        round(col("col.cosine"), 6).as("cosine"))
      .orderBy(col("anchor_id"), col("rk"))
  }

  /** [[kmeansFit]] as a driver-verifiable query, in the repo's
    * invariant-oracle form (the fn_approx_percentile / HLL precedent):
    * the raw trajectory is float-iteration-dependent (summation order can
    * move the last ulp), so the QUERY aggregates the fit's guarantees —
    * spherical-Lloyd objective monotonically non-increasing, assignment
    * fixpoint reached within budget, full k cells — into booleans the
    * oracle pins true. The full per-iteration trace stays available via
    * [[kmeansFitTrace]] and is invariant-checked in LlmSpec. */
  def kmeansFitReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fit = kmeansFitCached(spark, dir)
    val objs = fit.history.map(_.objective)
    val monotone = objs.zip(objs.drop(1)).forall { case (a, b) => b <= a + 1e-9 }
    Seq((fit.centroids.length, fit.converged, monotone))
      .toDF("k", "converged", "monotone")
  }

  def kmeansFitTrace(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kmeansFitCached(spark, dir).history
      .map(h => (h.iter, h.nChanged, BigDecimal(h.objective)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("iter", "n_changed", "objective")
  }

  /** Trained-IVF as a driver-verifiable query, same invariant form: the
    * exact top-k membership depends on the float fit, so the QUERY runs
    * trained-IVF against the in-engine brute-force truth and emits the
    * recall contract (k results, recall ≥ 0.5 at nprobe=4/16 — the same
    * floor the seeded path pins in LlmSpec). */
  def trainedIvfReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fit = kmeansFitCached(spark, dir)
    // k-row collects: model-scale results, not corpus data
    val trained = ivfTopKModel(spark, dir, fit.centroids)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val brute = bruteForceTopK(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recallOk = (trained & brute).size >= brute.size / 2
    Seq((10, trained.size, recallOk)).toDF("k", "n_results", "recall_ok")
  }

  /** Session memo of the trained model, keyed on the same source
    * fingerprint as [[pqCodeTable]]: the fit runs once per (session,
    * corpus state), every consumer (trace query, trained-IVF query,
    * repeated bench passes) reuses the KB-scale result, and a regenerated
    * corpus invalidates it. */
  private val kmeansCache =
    scala.collection.concurrent.TrieMap.empty[String, KmeansModel]
  def kmeansFitCached(spark: SparkSession, dir: String, nClusters: Int = 16,
                      maxIters: Int = 10, trainSampleMod: Int = 4,
                      tol: Double = 1e-3): KmeansModel =
    // EVERY hyperparameter is in the key: two fits differing only in
    // sample fraction or tolerance must not share a cached model
    kmeansCache.getOrElseUpdate(
      s"${embeddingsFingerprint(spark, dir)}|$nClusters|$maxIters|$trainSampleMod|$tol",
      kmeansFit(spark, dir, nClusters, maxIters, trainSampleMod, tol))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_kmeans_fit" -> ((s, d) => kmeansFitReport(s, d)),
    "sim_ivf_trained_topk" -> ((s, d) => trainedIvfReport(s, d)),
    "sim_dot_topk" -> ((s, d) => dotTopK(s, d)),
    "sim_hard_negatives" -> ((s, d) => hardNegatives(s, d)),
    "sim_centroid_outliers" -> ((s, d) => centroidOutliers(s, d)),
    "sim_retrieve_rerank" -> ((s, d) => retrieveRerank(s, d)),
    "sim_pq_topk" -> ((s, d) => pqTopK(s, d)),
    "sim_rp_bucket_sizes" -> rpBucketSizes,
    "sim_rp_topk" -> ((s, d) => rpTopK(s, d)),
    "sim_kmeans_step" -> kmeansStep,
    "sim_embedding_norms" -> embeddingNorms,
    "sim_quantize_int8" -> quantizeInt8,
    "sim_bruteforce_topk" -> ((s, d) => bruteForceTopK(s, d)),
    "sim_ivf_topk" -> ((s, d) => ivfTopK(s, d)),
    "sim_ivf_cluster_sizes" -> ivfClusterSizes,
    "sim_batch_topk" -> ((s, d) => batchTopK(s, d))
  )

  /** Brute-force cosine is SQL-expressible in DuckDB via
    * list_cosine_similarity (agrees with the engine's double-accumulating
    * loop to well past the rounded 6 decimals). */
  /** Shared SQL for the random-hyperplane replay: planes from md5 parity,
    * dots in ascending-dimension order (list_sum matches the engine's
    * left-fold), signature = Σ 2^j over non-negative dots. */
  private val rpSigSql: String =
    """p AS (SELECT j, list_transform(generate_series(0, 63),
      |        d -> CASE WHEN strpos('13579bdf', substring(md5(j || '_' || d), 1, 1)) > 0
      |                  THEN 1.0 ELSE -1.0 END) AS s
      |      FROM generate_series(0, 15) AS t(j)),
      |e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |dots AS (SELECT e.vec_id, p.j,
      |        list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * p.s[i])) AS dot
      |      FROM e CROSS JOIN p),
      |sigs AS (SELECT vec_id,
      |        CAST(sum(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS INTEGER) AS sig
      |      FROM dots GROUP BY vec_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // invariant oracles: the engine computes the fit/recall guarantees as
    // booleans from its own results; the oracle pins the contract
    "sim_kmeans_fit" ->
      "SELECT CAST(16 AS INTEGER) AS k, true AS converged, true AS monotone",
    "sim_ivf_trained_topk" ->
      "SELECT CAST(10 AS INTEGER) AS k, CAST(10 AS INTEGER) AS n_results, true AS recall_ok",
    // ascending-dimension double-accumulating dot product — same fold
    // order as the engine's zip_with/aggregate composition
    "sim_dot_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  round(list_sum(list_transform(generate_series(1, len(e.embedding)),
        |    i -> CAST(e.embedding[i] AS DOUBLE) * q.q_emb[i])), 6) AS dot
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY list_sum(list_transform(generate_series(1, len(e.embedding)),
        |    i -> CAST(e.embedding[i] AS DOUBLE) * q.q_emb[i])) DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    // per-anchor cross-label top-k replayed with list_cosine_similarity
    // (double-accumulating, same order as the engine's fold)
    "sim_hard_negatives" ->
      """WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label,
        |        CAST(embedding AS DOUBLE[]) AS a_emb
        |      FROM embeddings WHERE vec_id % 100 = 0),
        |sc AS (SELECT a.anchor_id, a.anchor_label, e.vec_id,
        |        e.label AS neg_label,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), a.a_emb) AS c
        |      FROM embeddings e CROSS JOIN a
        |      WHERE e.label <> a.anchor_label),
        |r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
        |        ORDER BY c DESC, vec_id) AS rk FROM sc)
        |SELECT anchor_id, CAST(rk AS INTEGER) AS rk, vec_id, anchor_label,
        |  neg_label, round(c, 6) AS cosine
        |FROM r WHERE rk <= 5 ORDER BY anchor_id, rk""".stripMargin,
    // per-(label, dim) means re-listed in dim order; cosine replayed with
    // list_cosine_similarity (double-accumulating, same as the engine)
    "sim_centroid_outliers" ->
      """WITH d AS (
        |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |         generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cm AS (SELECT label, dim, avg(x) AS m FROM d GROUP BY label, dim),
        |cent AS (SELECT label, list(m ORDER BY dim) AS cvec FROM cm GROUP BY label),
        |sc AS (SELECT e.label, e.vec_id,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS cos_raw
        |      FROM embeddings e JOIN cent c USING (label)),
        |r AS (SELECT label, vec_id, cos_raw,
        |        row_number() OVER (PARTITION BY label ORDER BY cos_raw, vec_id) AS rk
        |      FROM sc)
        |SELECT label, CAST(rk AS INTEGER) AS rk, vec_id,
        |  round(cos_raw, 6) AS cosine
        |FROM r WHERE rk <= 5 ORDER BY label, rk""".stripMargin,
    "sim_retrieve_rerank" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT e.vec_id,
        |        round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb), 6) AS cosine
        |      FROM embeddings e, q WHERE e.vec_id <> 0
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id
        |      LIMIT 50),
        |d AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        |r AS (SELECT d.doc_id, d.lang, c.cosine,
        |        CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ur
        |      FROM d JOIN c ON d.doc_id = c.vec_id)
        |SELECT doc_id, lang, cosine, round(ur, 4) AS unique_ratio,
        |  CAST(floor(cosine * ur * 1e6) AS BIGINT) AS rerank_ppm
        |FROM r ORDER BY rerank_ppm DESC, doc_id LIMIT 10""".stripMargin,
    // PQ replay: codebook from the first-16 seeds' sub-slices, per-vector
    // argmin code per subspace (ties to lowest code via row_number), ADC
    // table from the query, score = sum of per-subspace lookups
    "sim_pq_topk" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (SELECT s.s, c.c, list_transform(generate_series(1, 8),
        |         i -> e.v[s.s * 8 + i]) AS cw
        |       FROM generate_series(0, 7) AS s(s)
        |       CROSS JOIN generate_series(0, 15) AS c(c)
        |       JOIN e ON e.vec_id = c.c),
        |codes AS (
        |  SELECT vec_id, s, c AS code FROM (
        |    SELECT e.vec_id, cb.s, cb.c,
        |      row_number() OVER (PARTITION BY e.vec_id, cb.s
        |        ORDER BY list_sum(list_transform(generate_series(1, 8),
        |          i -> (e.v[cb.s * 8 + i] - cb.cw[i]) ^ 2)) ASC, cb.c ASC) AS rk
        |    FROM e CROSS JOIN cb) t WHERE rk = 1),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |adc AS (SELECT cb.s, cb.c,
        |    list_sum(list_transform(generate_series(1, 8),
        |      i -> (q.qv[cb.s * 8 + i] - cb.cw[i]) ^ 2)) AS d
        |  FROM cb CROSS JOIN q),
        |dist AS (SELECT codes.vec_id, round(sum(adc.d), 6) AS adc_dist
        |  FROM codes JOIN adc ON adc.s = codes.s AND adc.c = codes.code
        |  GROUP BY codes.vec_id)
        |SELECT dist.vec_id, e.label, dist.adc_dist
        |FROM dist JOIN e ON e.vec_id = dist.vec_id
        |WHERE dist.vec_id <> 0
        |ORDER BY dist.adc_dist, dist.vec_id LIMIT 10""".stripMargin,
    "sim_rp_bucket_sizes" ->
      s"""WITH $rpSigSql
         |SELECT sig AS signature, count(*) AS n_vectors
         |FROM sigs GROUP BY sig ORDER BY signature""".stripMargin,
    "sim_rp_topk" ->
      s"""WITH $rpSigSql,
         |q AS (SELECT s.sig AS q_sig, e.v AS q_emb
         |      FROM sigs s JOIN e ON s.vec_id = e.vec_id WHERE s.vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  CAST(bit_count(xor(s.sig, q.q_sig)) AS INTEGER) AS hamming,
         |  round(list_cosine_similarity(e.v, q.q_emb), 6) AS cosine
         |FROM e JOIN sigs s ON e.vec_id = s.vec_id CROSS JOIN q
         |WHERE e.vec_id <> 0 AND bit_count(xor(s.sig, q.q_sig)) <= 6
         |ORDER BY list_cosine_similarity(e.v, q.q_emb) DESC, e.vec_id
         |LIMIT 10""".stripMargin,
    // assignment replayed like sim_ivf_cluster_sizes, then per-(cluster,
    // dim) means over the same double-cast elements
    "sim_kmeans_step" ->
      """WITH c AS (SELECT CAST(vec_id AS INTEGER) AS centroid_id,
        |             CAST(embedding AS DOUBLE[]) AS c_emb
        |           FROM embeddings WHERE vec_id < 16),
        |s AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.centroid_id,
        |        row_number() OVER (PARTITION BY e.vec_id
        |          ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c_emb) DESC,
        |                   c.centroid_id) AS rk
        |      FROM embeddings e CROSS JOIN c),
        |a AS (SELECT centroid_id, v FROM s WHERE rk = 1),
        |x AS (SELECT centroid_id,
        |        CAST(unnest(range(len(v))) AS INTEGER) AS dim,
        |        unnest(v) AS x
        |      FROM a)
        |SELECT centroid_id, dim, round(avg(x), 6) AS mean_val,
        |  count(*) AS n_assigned
        |FROM x GROUP BY centroid_id, dim
        |ORDER BY centroid_id, dim""".stripMargin,
    "sim_embedding_norms" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(v) AS INTEGER) AS dim,
        |  round(sqrt(list_sum(list_transform(v, x -> x * x))), 4) AS l2_norm,
        |  round(list_sum(v) / len(v), 6) AS mean_val,
        |  round(list_max(list_transform(v, x -> abs(x))), 6) AS max_abs
        |FROM e ORDER BY vec_id""".stripMargin,
    "sim_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |q AS (SELECT vec_id, scale,
        |        list_transform(v, x -> CAST(round(x / scale) AS INTEGER)) AS qv FROM m)
        |SELECT vec_id, round(scale, 8) AS scale,
        |  qv[1] AS q0,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INTEGER) AS n_saturated
        |FROM q ORDER BY vec_id""".stripMargin,
    "sim_bruteforce_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb), 6) AS cosine
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    // IVF is oracle-able because the centroids are deterministic (the
    // first nClusters vec_ids): DuckDB reproduces assignment (argmax
    // cosine, ties to the lowest centroid id), probe, and ranked scan.
    "sim_ivf_cluster_sizes" ->
      """WITH c AS (SELECT CAST(vec_id AS INTEGER) AS centroid_id,
        |             CAST(embedding AS DOUBLE[]) AS c_emb
        |           FROM embeddings WHERE vec_id < 16),
        |s AS (SELECT e.vec_id, c.centroid_id,
        |        row_number() OVER (PARTITION BY e.vec_id
        |          ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c_emb) DESC,
        |                   c.centroid_id) AS rk
        |      FROM embeddings e CROSS JOIN c)
        |SELECT centroid_id, count(*) AS n_vectors
        |FROM s WHERE rk = 1 GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,
    "sim_ivf_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT CAST(vec_id AS INTEGER) AS centroid_id,
        |        CAST(embedding AS DOUBLE[]) AS c_emb
        |      FROM embeddings WHERE vec_id < 16),
        |probe AS (SELECT centroid_id FROM c, q
        |          ORDER BY list_cosine_similarity(c_emb, q_emb) DESC, centroid_id LIMIT 4),
        |s AS (SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
        |        row_number() OVER (PARTITION BY e.vec_id
        |          ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c_emb) DESC,
        |                   c.centroid_id) AS rk
        |      FROM embeddings e CROSS JOIN c),
        |a AS (SELECT vec_id, label, embedding FROM s
        |      WHERE rk = 1 AND centroid_id IN (SELECT centroid_id FROM probe))
        |SELECT a.vec_id, a.label,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), q.q_emb), 6) AS cosine
        |FROM a, q WHERE a.vec_id <> 0
        |ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), q.q_emb) DESC, a.vec_id
        |LIMIT 10""".stripMargin,
    "sim_batch_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |s AS (SELECT q.query_id, e.vec_id,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS c
        |      FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |r AS (SELECT query_id, vec_id, c,
        |        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rk
        |      FROM s)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vec_id, round(c, 6) AS cosine
        |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  )
}
