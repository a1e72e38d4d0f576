package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) is one entry in `queries`, with a DuckDB oracle in
  * `oracleSql` where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All query groups. */
  private def groups: Seq[Q] =
    CrawlQueries.all ++ PipelineQueries.all ++ TextQueries.all ++
      SimQueries.all ++ EventQueries.all ++ MultimodalQueries.all ++
      FunctionQueries.all ++ GraphQueries.all ++ QualityQueries.all ++
      WebCorpusQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full end-to-end quotes crawl: seed → politeness → robots → fetch
    * join → extract → frontier expansion → 100 records in crawl order.
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.qCrawlQuotes.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
