package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by packs under `graft.queries`; each pack covers
  * a slice of SURVEY.md §2 (plus the beyond-reference operators) and pairs
  * every SQL-expressible query with a DuckDB oracle dual.
  */
object SparkEntry {

  /** All query packs. Order is presentation-only; names must be globally
    * unique (asserted by EntrySpec). */
  val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TpchQueries,
    AggregateQueries,
    JoinQueries,
    WindowQueries,
    FunctionQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    StreamingQueries,
    MultimodalQueries,
    SubqueryQueries,
    PipelineQueries,
    GraphQueries,
    EventQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver's rows-only check
    * (used only for non-SQL-expressible ops: sketches, LSH, streaming). */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
