package graft

import graft.queries.{CorpusQueries, CurationQueries, MlQueries, PipelineQueries, Q, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in `graft.queries.*`; each entry is an operator
  * family from SURVEY.md §2 (plus the training-data-pipeline operators)
  * expressed over the driver's testdata tables, with a DuckDB oracle
  * where ANSI-SQL-expressible.
  */
object SparkEntry {

  def allQueries: Seq[Q] =
    RelationalQueries.all ++ CorpusQueries.all ++ MlQueries.all ++
      PipelineQueries.all ++ CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hybrid search — the reference's flagship path (SURVEY.md §3.1):
    * vector top-k ∪ BM25 top-k, fused with the 1.2× both-sources boost. */
  def entry(spark: SparkSession): DataFrame =
    queries("q43_hybrid_search")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case Q(n, Some(sql), _) => n -> sql.trim }.toMap
}
