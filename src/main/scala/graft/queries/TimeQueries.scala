package graft.queries

import org.apache.spark.sql.functions._
import graft.query._
import graft.sources.TestData
import CoreQueries.{Q, Fn}

/**
 * Time-bucketed aggregations (reference: TimeAggregation,
 * query/Aggregation.scala:401-480) and composed-JSON executor pipelines
 * (reference: QueryExecutor.scala:115-170).
 *
 * Buckets are emitted as epoch-millis BIGINT on both engines: fixed-width
 * units (s/m/h/d) are epoch-anchored `ts - ts % width`; weeks are
 * MONDAY-anchored `ts - (ts + 3d) % width`, matching the reference's
 * roundToWeek +3-day shift (Aggregation.scala:409-414); months/years are
 * UTC calendar truncation.
 */
object TimeQueries {

  private def G(s: org.apache.spark.sql.SparkSession, dir: String) = TestData.graph(s, dir)

  private def timeAgg(json: String): Fn = (s, dir) => {
    val df = G(s, dir).V("events").df
    val out = AggCompiler(df, AggregationParser.parse(json, Properties.passthrough), Properties.passthrough)
    val rest = out.columns.filterNot(_ == "ts_bucket").map(col)
    out.select((unix_millis(col("ts_bucket")).as("bucket_ms") +: rest.toIndexedSeq): _*)
      .orderBy("bucket_ms")
  }

  val all: Seq[Q] = Seq(
    Q("t01_time_agg_day",
      timeAgg("""{"_agg":"time","_field":"ts","_interval":"1d",
                |"_select":[{"_agg":"count","_name":"cnt"},
                |           {"_agg":"sum","_field":"value","_name":"val_sum"}]}""".stripMargin),
      Some("""SELECT (epoch_ms(ts) - epoch_ms(ts) % 86400000) AS bucket_ms, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS val_sum
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t02_time_agg_month",
      timeAgg("""{"_agg":"time","_field":"ts","_interval":{"_interval":1,"_unit":"MONTHS"},
                |"_select":[{"_agg":"count","_name":"cnt"}]}""".stripMargin),
      Some("""SELECT epoch_ms(date_trunc('month', ts)) AS bucket_ms, count(*) AS cnt
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t03_time_agg_week",
      timeAgg("""{"_agg":"time","_field":"ts","_interval":"1w",
                |"_select":[{"_agg":"count","_name":"cnt"}]}""".stripMargin),
      Some("""SELECT (epoch_ms(ts) - (epoch_ms(ts) + 259200000) % 604800000) AS bucket_ms, count(*) AS cnt
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t08_time_agg_2week",
      // multi-week interval at the REFERENCE's exact bucket boundaries:
      // roundToWeek(t, n) = (t+3d) - (t+3d) % (n*1w) - 3d  ≡  t - (t+3d) % (n*1w)
      // (Aggregation.scala:409-414; the +3d shift — epoch day 0 is a
      // Thursday — makes bucket STARTS land on Monday, so the reference is
      // Monday-anchored, not Thursday-anchored; roundToWeek(0) = -3d =
      // Mon 1969-12-29, pinned in QueryLanguageSpec)
      timeAgg("""{"_agg":"time","_field":"ts","_interval":"2w",
                |"_select":[{"_agg":"count","_name":"cnt"}]}""".stripMargin),
      Some("""SELECT (epoch_ms(ts) - (epoch_ms(ts) + 259200000) % 1209600000) AS bucket_ms, count(*) AS cnt
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t09_time_agg_week_pre1970",
      // pre-epoch week buckets, oracle-pinning the engine's FLOOR
      // semantics (pmod): the reference's truncating % would collapse
      // every timestamp with t+3d in (-1w, 1w) into one double-width
      // bucket around epoch (see QueryLanguageSpec's pinned-divergence
      // probe). Input = the events table shifted back ~63 years by a
      // fixed millisecond delta (pure arithmetic, engine-agnostic), so
      // every timestamp is deep pre-1970.
      (s, dir) => {
        val df = G(s, dir).V("events").df
          .withColumn("ts", timestamp_millis(unix_millis(col("ts")) - lit(2000000000000L)))
        val out = AggCompiler(df,
          AggregationParser.parse(
            """{"_agg":"time","_field":"ts","_interval":"1w",
              |"_select":[{"_agg":"count","_name":"cnt"}]}""".stripMargin,
            Properties.passthrough),
          Properties.passthrough)
        out.select(unix_millis(col("ts_bucket")).as("bucket_ms"), col("cnt"))
          .orderBy("bucket_ms")
      },
      // floor-mod spelled out for DuckDB (its % also truncates toward 0)
      Some("""SELECT (shifted - (((shifted + 259200000) % 604800000) + 604800000) % 604800000) AS bucket_ms,
             |  count(*) AS cnt
             |FROM (SELECT epoch_ms(ts) - 2000000000000 AS shifted FROM events)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t04_time_agg_filtered",
      timeAgg("""{"_agg":"time","_field":"ts","_interval":"6h",
                |"_query":{"_is":{"event_type":"click"}},
                |"_select":[{"_agg":"count","_name":"cnt"},
                |           {"_agg":"avg","_field":"value","_name":"v_avg"}]}""".stripMargin),
      Some("""SELECT (epoch_ms(ts) - epoch_ms(ts) % 21600000) AS bucket_ms, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(value) AS v_avg
             |FROM events WHERE event_type = 'click' GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------- composed JSON executor
    Q("t05_executor_pipeline",
      (s, dir) => {
        val g = G(s, dir)
        // run through the version-routed registry (reference:
        // ScalligraphRouter.scala:38-49): a base executor serving every
        // version merged with a v1-scoped module, resolved at version 1 —
        // the exact path a /api/v1/query request takes
        val base = new QueryExecutor(g, QueryExecutor.defaultNamed(g))
        val v1 = new QueryExecutor(g, Map.empty, version = (1, 1))
        new GlobalQueryExecutor(Seq(base, v1)).get(1).execute(
          """[{"_name":"all_customer"},
            |  {"_name":"filter","_query":{"_gte":{"c_acctbal":1000}}},
            |  {"_name":"sort","_fields":[{"c_acctbal":"desc"},{"c_custkey":"asc"}]},
            |  {"_name":"page","from":0,"to":20}]""".stripMargin)
      },
      Some("""SELECT * FROM customer WHERE c_acctbal >= 1000
             |ORDER BY c_acctbal DESC, c_custkey LIMIT 20""".stripMargin)),

    Q("t06_executor_agg",
      (s, dir) => {
        val g = G(s, dir)
        new QueryExecutor(g, QueryExecutor.defaultNamed(g)).execute(
          """[{"_name":"all_orders"},
            |  {"_name":"aggregation","_agg":"field","_field":"o_orderstatus",
            |   "_select":[{"_agg":"count","_name":"cnt"}]}]""".stripMargin)
      },
      Some("SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY 1 ORDER BY o_orderstatus")),

    Q("t07_executor_hop_count",
      (s, dir) => {
        val g = G(s, dir)
        new QueryExecutor(g, QueryExecutor.defaultNamed(g)).execute(
          """[{"_name":"all_supplier"},
            |  {"_name":"out","_edge":"supp_nation"},
            |  {"_name":"dedup"},
            |  {"_name":"count"}]""".stripMargin)
      },
      Some("""SELECT count(DISTINCT n.n_nationkey) AS count
             |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin))
  )
}
