package graft
// r16 j-family audit scratch: prints the INNER aggregate plan behind the
// rendered JSON queries (the rendered DF itself is a 1-row LocalTableScan).
object JAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.sources.TestData.graph(spark, sfDir)
    val ex = new graft.query.QueryExecutor(g, graft.query.QueryExecutor.defaultNamed(g))
    val j03 =
      """[{"_name":"all_orders"},
        |  {"_name":"aggregation","_agg":"field","_field":"o_orderstatus",
        |   "_select":[{"_agg":"count","_name":"cnt"},
        |              {"_agg":"field","_field":"o_orderpriority",
        |               "_order":["-c2"],"_size":2,
        |               "_select":[{"_agg":"count","_name":"c2"}]}]}]""".stripMargin
    val df = ex.executeJ(org.json4s.jackson.JsonMethods.parse(j03))
    println("=== j03 inner aggregate ===")
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
