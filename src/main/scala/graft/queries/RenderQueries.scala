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
             |      FROM events GROUP BY 1)""".stripMargin)),

    // Nested grouping sub-aggregations (reference grammar recursion:
    // Aggregation.scala:151,167; per-group re-aggregation :369-384; the
    // nested agg's {innerKey: obj} entries merge as SIBLINGS of the scalar
    // names, :383-391). The oracle rebuilds the same nested payload with
    // two-level string_agg, pinning keys, order, _size capping, and the
    // sibling-merge shape byte-for-byte.
    Q("j03_nested_field_in_field_json",
      (s, dir) => {
        import s.implicits._
        val js = exec(s, dir).executeJson(
          """[{"_name":"all_orders"},
            |  {"_name":"aggregation","_agg":"field","_field":"o_orderstatus",
            |   "_select":[{"_agg":"count","_name":"cnt"},
            |              {"_agg":"field","_field":"o_orderpriority",
            |               "_order":["-c2"],"_size":2,
            |               "_select":[{"_agg":"count","_name":"c2"}]}]}]""".stripMargin)
        Seq(JsonRenderer.compact(js)).toDF("json")
      },
      Some("""WITH ig AS (
             |  SELECT o_orderstatus, o_orderpriority, count(*) AS c2,
             |         row_number() OVER (PARTITION BY o_orderstatus
             |                            ORDER BY count(*) DESC, o_orderpriority) AS rn
             |  FROM orders GROUP BY 1, 2),
             |ij AS (
             |  SELECT o_orderstatus,
             |         string_agg('"' || o_orderpriority || '":{"c2":' || c2 || '}',
             |                    ',' ORDER BY rn) AS js
             |  FROM ig WHERE rn <= 2 GROUP BY 1),
             |og AS (SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY 1)
             |SELECT '{' || string_agg(
             |         '"' || og.o_orderstatus || '":{"cnt":' || og.cnt || ',' || ij.js || '}',
             |         ',' ORDER BY og.o_orderstatus) || '}' AS json
             |FROM og JOIN ij USING (o_orderstatus)""".stripMargin)),

    Q("j04_nested_time_in_field_json",
      (s, dir) => {
        import s.implicits._
        // o_orderdate is TIMESTAMP_NTZ (unconformed writer type): the
        // calendar-month date_trunc bucket is the NTZ-valid form, and the
        // render key goes through the LocalDateTime epoch path
        val js = exec(s, dir).executeJson(
          """[{"_name":"all_orders"},
            |  {"_name":"aggregation","_agg":"field","_field":"o_orderstatus",
            |   "_select":[{"_agg":"time","_field":"o_orderdate","_interval":"1M",
            |               "_select":[{"_agg":"count","_name":"c"}]}]}]""".stripMargin)
        Seq(JsonRenderer.compact(js)).toDF("json")
      },
      Some("""WITH ig AS (
             |  SELECT o_orderstatus, epoch_ms(date_trunc('month', o_orderdate)) AS b,
             |         count(*) AS c
             |  FROM orders GROUP BY 1, 2),
             |ij AS (
             |  SELECT o_orderstatus,
             |         string_agg('"' || b || '":{"c":' || c || '}', ',' ORDER BY b) AS js
             |  FROM ig GROUP BY 1)
             |SELECT '{' || string_agg(
             |         '"' || o_orderstatus || '":{' || js || '}',
             |         ',' ORDER BY o_orderstatus) || '}' AS json
             |FROM ij""".stripMargin)),

    Q("j05_nested_field_in_time_json",
      (s, dir) => {
        import s.implicits._
        val js = exec(s, dir).executeJson(
          """[{"_name":"all_events"},
            |  {"_name":"aggregation","_agg":"time","_field":"ts","_interval":"1M",
            |   "_select":[{"_agg":"count","_name":"n"},
            |              {"_agg":"field","_field":"event_type",
            |               "_select":[{"_agg":"count","_name":"c"}]}]}]""".stripMargin)
        Seq(JsonRenderer.compact(js)).toDF("json")
      },
      Some("""WITH ig AS (
             |  SELECT epoch_ms(date_trunc('month', ts)) AS b, event_type, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |ij AS (
             |  SELECT b,
             |         string_agg('"' || event_type || '":{"c":' || c || '}',
             |                    ',' ORDER BY event_type) AS js
             |  FROM ig GROUP BY 1),
             |og AS (SELECT epoch_ms(date_trunc('month', ts)) AS b, count(*) AS n
             |       FROM events GROUP BY 1)
             |SELECT '{' || string_agg(
             |         '"' || og.b || '":{"n":' || og.n || ',' || ij.js || '}',
             |         ',' ORDER BY og.b) || '}' AS json
             |FROM og JOIN ij USING (b)""".stripMargin)),

    Q("j06_nested_time_in_time_json",
      // time-in-time over the SAME field — the dashboard drill-down the
      // recursive grammar allows (weekly buckets expanded into daily):
      // both levels derive the bucket column name `ts_bucket`, so this
      // pins the nested-key disambiguation (worked as `ts_bucket__2`,
      // rendered back as the canonical key)
      (s, dir) => {
        import s.implicits._
        val js = exec(s, dir).executeJson(
          """[{"_name":"all_events"},
            |  {"_name":"aggregation","_agg":"time","_field":"ts","_interval":"1w",
            |   "_select":[{"_agg":"time","_field":"ts","_interval":"1d",
            |               "_select":[{"_agg":"count","_name":"c"}]}]}]""".stripMargin)
        Seq(JsonRenderer.compact(js)).toDF("json")
      },
      Some("""WITH ig AS (
             |  SELECT (epoch_ms(ts) - (epoch_ms(ts) + 259200000) % 604800000) AS wb,
             |         (epoch_ms(ts) - epoch_ms(ts) % 86400000) AS db, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |ij AS (
             |  SELECT wb, string_agg('"' || db || '":{"c":' || c || '}', ',' ORDER BY db) AS js
             |  FROM ig GROUP BY 1)
             |SELECT '{' || string_agg('"' || wb || '":{' || js || '}', ',' ORDER BY wb) || '}' AS json
             |FROM ij""".stripMargin))
  )
}
