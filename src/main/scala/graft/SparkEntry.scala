package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query inventory lives in graft.queries.* (one entry per operator
  * family from SURVEY.md §2, each with a DuckDB oracle where SQL can
  * express it). */
object SparkEntry {

  /** Package-visible for QueryRegistrySpec's hygiene gate: the RAW
    * concatenation, before toMap silently collapses a duplicate name. */
  private[graft] def registry: Seq[CoreQueries.Q] =
    CoreQueries.all ++ TimeQueries.all ++ TextQueries.all ++ SearchQueries.all ++ VectorQueries.all ++
      PipelineQueries.all ++ AnalyticsQueries.all ++ MiscQueries.all ++ PropertyQueries.all ++
      BranchQueries.all ++ IntegrityQueries.all ++ CoverageQueries.all ++ AnalyticalQueries.all ++
      JoinQueries.all ++ SideChannelQueries.all ++ RenderQueries.all ++ MigrationQueries.all ++
      MogQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H Q3-shaped shipping-priority revenue top-10 through the
    * traversal DSL (customer segment → straddling orders → lineitems). */
  def entry(spark: SparkSession): DataFrame =
    AnalyticalQueries.all.find(_.name == "q70_shipping_priority").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case CoreQueries.Q(n, _, Some(sql)) => n -> sql }.toMap
}
