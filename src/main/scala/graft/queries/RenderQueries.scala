package graft.queries

import graft.query._
import graft.sources.TestData
import CoreQueries.Q

/**
 * Golden JSON rendering through the composed executor (reference:
 * Output.toJson via QueryExecutor.execute, query/Aggregation.scala:383-397
 * `{key: {subAggName: value}}`, :460-479 time keys as epoch millis) —
 * each query emits ONE row holding the canonical rendered string, and the
 * DuckDB oracle rebuilds the same string with `string_agg`, so the gate
 * pins the exact bytes of the API payload, not just the table.
 */
object RenderQueries {

  private def exec(s: org.apache.spark.sql.SparkSession, dir: String): QueryExecutor = {
    val g = TestData.graph(s, dir)
    new QueryExecutor(g, QueryExecutor.defaultNamed(g))
  }

  val all: Seq[Q] = Seq(
    Q("j01_field_agg_json",
      (s, dir) => {
        import s.implicits._
        val js = exec(s, dir).executeJson(
          """[{"_name":"all_orders"},
            |  {"_name":"aggregation","_agg":"field","_field":"o_orderstatus",
            |   "_select":[{"_agg":"count","_name":"cnt"},
            |              {"_agg":"min","_field":"o_orderdate","_name":"first_ms"}]}]""".stripMargin)
        Seq(JsonRenderer.compact(js)).toDF("json")
      },
      Some("""SELECT '{' || string_agg(
             |         '"' || o_orderstatus || '":{"cnt":' || cnt || ',"first_ms":' || first_ms || '}',
             |         ',' ORDER BY o_orderstatus) || '}' AS json
             |FROM (SELECT o_orderstatus, count(*) AS cnt,
             |             epoch_ms(min(o_orderdate)) AS first_ms
             |      FROM orders GROUP BY 1)""".stripMargin)),

    Q("j02_time_agg_json",
      (s, dir) => {
        import s.implicits._
        val js = exec(s, dir).executeJson(
          """[{"_name":"all_events"},
            |  {"_name":"aggregation","_agg":"time","_field":"ts","_interval":"1d",
            |   "_select":[{"_agg":"count","_name":"cnt"}]}]""".stripMargin)
        Seq(JsonRenderer.compact(js)).toDF("json")
      },
      Some("""SELECT '{' || string_agg(
             |         '"' || bucket_ms || '":{"cnt":' || cnt || '}',
             |         ',' ORDER BY bucket_ms) || '}' AS json
             |FROM (SELECT (epoch_ms(ts) - epoch_ms(ts) % 86400000) AS bucket_ms, count(*) AS cnt
             |      FROM events GROUP BY 1)""".stripMargin))
  )
}
