package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query entry (SURVEY.md §2
  * inventory) with its DuckDB-oracle SQL twin where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Multimodal.queries ++
      operators.StreamingQueries.queries ++
      operators.Pipelines.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (those get
    * the driver's weaker rows-only check + ScalaTest invariants). */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Multimodal.oracles ++
      operators.StreamingQueries.oracles ++
      operators.Pipelines.oracles
}
