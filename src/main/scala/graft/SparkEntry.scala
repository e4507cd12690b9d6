package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, E2EQueries, EvalQueries, ExtensionQueries, IngestQueries, ParityQueries, QueryDef}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups:
  *  - p* : SURVEY.md §2.A relational/dataflow operator parity
  *  - e* : full end-to-end pipeline runs vs an in-JVM deterministic mock API
  *         (middleware, auth incl. OAuth2 RPC, retry, batching, bronze write)
  *  - x* : training-data-pipeline extensions (dedup, ANN, text analysis,
  *         multimodal plumbing, streaming) per SURVEY.md §7.5
  *  - b* : analytics/bench headliners (agg, star join, window top-k)
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    ParityQueries.all ++ E2EQueries.all ++ ExtensionQueries.all ++
      EvalQueries.all ++ IngestQueries.all ++ AnalyticsQueries.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * noauth pipeline end to end.
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "e01_pipeline_noauth").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for engine-internal hashing
    * (pmod(murmur3)) which has no cross-engine twin → rows-only check.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
