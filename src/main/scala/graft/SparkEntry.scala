package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.util.GQuery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one entry in
  * `queries`; entries whose semantics are ANSI-SQL-expressible also
  * register a DuckDB oracle in `oracleSql` (same column names, same
  * deterministic ORDER BY — the driver hash-compares).
  */
object SparkEntry {

  val allQueries: Seq[GQuery] =
    analytics.RelationalQueries.queries ++
      analytics.TpchShapes.queries ++
      analytics.StatsQueries.queries ++
      analytics.ProfileQueries.queries ++
      analytics.DriftQueries.queries ++
      analytics.BehaviorQueries.queries ++
      analytics.WindowQueries.queries ++
      analytics.FunctionQueries.queries ++
      analytics.TemporalQueries.queries ++
      cdc.CdcQueries.queries ++
      ops.LlmQueries.queries ++
      ops.SemDedup.queries ++
      ops.SpanDedup.queries ++
      ops.EntityResolution.queries ++
      ops.Search.queries ++
      ops.KMeansStep.queries ++
      ops.Lr.queries ++
      ops.Bpe.queries ++
      ops.Chunking.queries ++
      ops.Validate.queries ++
      ops.Redact.queries ++
      sources.FileFormats.queries ++
      sources.Layout.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.collect { case GQuery(n, _, Some(sql)) => n -> sql }.toMap
}
