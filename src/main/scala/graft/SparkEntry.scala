package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator family registers named queries here; each
  * SQL-expressible one carries a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks
    * rows>0): star join (orders ⋈ broadcast customer ⋈ broadcast nation)
    * + ranking window + filter — top-3 orders per nation by price. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q7WindowTopPerNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ gap-fill
    * relational set, scalar functions, event analytics, LLM-data ops).
    *
    * Harness contract: a few builders persist() genuinely-expensive
    * multi-consumer intermediates (MinHash signature/shingle tables,
    * SimHash signatures) and [[llm.Dedup.resolveKeepers]] returns a frame
    * backed by localCheckpoint blocks. A harness that runs MANY queries in
    * one session must drop that state between queries —
    * `spark.catalog.clearCache()` for persisted frames plus
    * `sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))`
    * for checkpoint blocks — as [[Verify]] and [[Bench]] both do. (A
    * single-query session needs nothing: Spark's ContextCleaner frees
    * unreachable cached RDDs with GC.) Everything else deliberately avoids
    * caching — cheap map-side intermediates are recomputed per consumer. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cdc.CdcQueries.queries ++
      ops.Relational.queries ++
      ops.Functions.queries ++
      ops.Events.queries ++
      llm.TextOps.queries ++
      llm.Dedup.queries ++
      llm.Similarity.queries ++
      llm.Multimodal.queries ++
      llm.Curation.queries

  /** DuckDB-equivalent ANSI SQL per query; omitted for the estimator /
    * hash-family ops (approx_count_distinct, MinHash/SimHash internals,
    * IVF probe, stub decode) which get ScalaTest property coverage
    * instead — the driver records a rows-only check for those. */
  def oracleSql: Map[String, String] =
    cdc.CdcQueries.oracles ++
      ops.Relational.oracles ++
      ops.Functions.oracles ++
      ops.Events.oracles ++
      llm.TextOps.oracles ++
      llm.Dedup.oracles ++
      llm.Similarity.oracles ++
      llm.Multimodal.oracles ++
      llm.Curation.oracles
}
