package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.query._
import graft.sources.TestData
import graft.traversal.{Element, Traversal}

/**
 * Core query inventory — one entry per operator family from SURVEY.md §2,
 * each with a DuckDB oracle over the same parquet tables.
 *
 * Determinism rules (both sides):
 *  - every query ends in an explicit total order (unique tie-break cols);
 *  - sums/avgs over float/double accumulate in DECIMAL(38,6) then cast to
 *    double — exact, partitioning-independent, bit-equal across engines;
 *  - timestamps are emitted as epoch-millis BIGINT to sidestep engine
 *    timestamp-representation differences;
 *  - per-row double arithmetic is written with identical association so
 *    IEEE ops match bit-for-bit.
 */
object CoreQueries {

  type Fn = (SparkSession, String) => DataFrame
  final case class Q(name: String, fn: Fn, oracle: Option[String])

  private def G(s: SparkSession, dir: String) = TestData.graph(s, dir)

  /** sum(x) via exact decimal accumulation, emitted as double. */
  private def dsum(c: Column): Column =
    graft.functions.DuckDecimalCast.duckDouble(
      sum(graft.functions.DuckDecimalCast.duckDecimal6(c.cast("double"))))

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- scans
    Q("q01_scan_filter_sort_page",
      (s, dir) => G(s, dir).V("lineitem")
        .has("l_returnflag", "R")
        .where(col("l_quantity") > 30)
        .sortBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .range(10, 50)
        .df.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
             |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 40 OFFSET 10""".stripMargin)),

    Q("q02_ids_lookup",
      (s, dir) => G(s, dir).V("customer", 1L, 5L, 10L).sortBy(col("c_custkey")).toDF,
      Some("SELECT * FROM customer WHERE c_custkey IN (1, 5, 10) ORDER BY c_custkey")),

    Q("q03_edge_scan",
      (s, dir) => G(s, dir).E("of_order").sortBy(col("_src")).toDF,
      Some("""SELECT concat_ws('-', l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |  CAST(floor(l_quantity) AS BIGINT), l_linestatus) AS _src, l_orderkey AS _dst
             |FROM lineitem ORDER BY 1, 2""".stripMargin)),

    // --------------------------------------------------------- filter grammar
    Q("q04_filter_grammar_bool",
      (s, dir) => G(s, dir).V("part")
        .where(FilterParser.parse(
          """{"_and":[
            |  {"_or":[{"_startsWith":{"_field":"p_type","_value":"SMALL"}},
            |          {"_endsWith":{"_field":"p_type","_value":"STEEL"}}]},
            |  {"_not":{"_lt":{"p_size":15}}},
            |  {"_between":{"_field":"p_retailprice","_from":900,"_to":1800}}]}""".stripMargin,
          Properties.passthrough))
        .sortBy(col("p_partkey")).toDF,
      Some("""SELECT * FROM part
             |WHERE ((p_type LIKE 'SMALL%') OR (p_type LIKE '%STEEL'))
             |  AND NOT (p_size < 15)
             |  AND p_retailprice >= 900 AND p_retailprice < 1800
             |ORDER BY p_partkey""".stripMargin)),

    Q("q05_filter_grammar_in_like",
      (s, dir) => G(s, dir).V("customer")
        .where(FilterParser.parse(
          """{"_and":[
            |  {"_in":{"_field":"c_mktsegment","_values":["BUILDING","MACHINERY"]}},
            |  {"_gte":{"c_acctbal":0}},
            |  {"_ne":{"c_nationkey":3}},
            |  {"_like":{"_field":"c_name","_value":"*1*"}}]}""".stripMargin,
          Properties.passthrough))
        .sortBy(col("c_custkey")).toDF,
      Some("""SELECT * FROM customer
             |WHERE c_mktsegment IN ('BUILDING','MACHINERY') AND c_acctbal >= 0
             |  AND (c_nationkey IS DISTINCT FROM 3) AND c_name LIKE '%1%'
             |ORDER BY c_custkey""".stripMargin)),

    Q("q99_string_filter_ignored",
      // legacy `_string` full-text filter inside an `_and`: reference
      // parity is ignore-with-warning → match-all (reference
      // query/Filter.scala:177-179), so the surrounding conjunction is
      // unchanged — a legacy TheHive client sending `{"_string": …}`
      // gets the permissive match, not an error
      (s, dir) => G(s, dir).V("customer")
        .where(FilterParser.parse(
          """{"_and":[
            |  {"_string":"full text the engine must ignore"},
            |  {"_is":{"c_mktsegment":"BUILDING"}},
            |  {"_gte":{"c_acctbal":5000}}]}""".stripMargin,
          Properties.passthrough))
        .sortBy(col("c_custkey")).toDF,
      Some("""SELECT * FROM customer
             |WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 5000
             |ORDER BY c_custkey""".stripMargin)),

    Q("q06_computed_property_filter",
      (s, dir) => {
        val props = Properties(PublicProperty("priorityClass", substring(col("o_orderpriority"), 1, 1))) ++ Properties.passthrough
        G(s, dir).V("orders")
          .where(FilterParser.parse("""{"_is":{"priorityClass":"1"}}""", props))
          .sortBy(col("o_orderkey")).toDF
      },
      Some("SELECT * FROM orders WHERE substr(o_orderpriority, 1, 1) = '1' ORDER BY o_orderkey")),

    // ------------------------------------------------------------------ hops
    Q("q07_hop_out",
      (s, dir) => G(s, dir).V("lineitem").where(col("l_quantity") > 45)
        .out("of_order").sortBy(col("o_orderkey")).toDF,
      Some("""SELECT o.* FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |WHERE l.l_quantity > 45 ORDER BY o_orderkey""".stripMargin)),

    Q("q08_hop_in_dedup",
      (s, dir) => G(s, dir).V("customer").has("c_mktsegment", "BUILDING")
        .in("placed_by").dedup().sortBy(col("o_orderkey")).toDF,
      Some("""SELECT DISTINCT o.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING' ORDER BY o_orderkey""".stripMargin)),

    Q("q09_two_hop_groupcount",
      (s, dir) => G(s, dir).V("lineitem").out("of_order").out("placed_by")
        .groupCount(col("c_mktsegment")).orderBy("key"),
      Some("""SELECT c_mktsegment AS key, count(*) AS count
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q10_alias_cross_predicate",
      (s, dir) => {
        val t = G(s, dir).V("customer").as("c").out("cust_nation").in("supp_nation")
        t.where(t.sel("c", "c_acctbal") < col("s_acctbal"))
          .project("c_custkey" -> t.sel("c", "c_custkey"), "s_suppkey" -> col("s_suppkey"))
          .sortBy(col("c_custkey"), col("s_suppkey")).toDF
      },
      Some("""SELECT c.c_custkey AS c_custkey, s.s_suppkey AS s_suppkey
             |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN supplier s ON s.s_nationkey = n.n_nationkey
             |WHERE c.c_acctbal < s.s_acctbal ORDER BY 1, 2""".stripMargin)),

    Q("q11_outE_inV",
      (s, dir) => G(s, dir).V("orders").outE("placed_by").inV.sortBy(col("c_custkey")).toDF,
      Some("""SELECT c.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |ORDER BY c_custkey""".stripMargin)),

    Q("q12_inE_otherV",
      (s, dir) => G(s, dir).V("customer").inE("placed_by").otherV.sortBy(col("o_orderkey")).toDF,
      Some("""SELECT o.* FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q13_both_hop",
      (s, dir) => G(s, dir).V("nation").both("of_region").sortBy(col("r_regionkey")).toDF,
      Some("""SELECT r.* FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
             |ORDER BY r_regionkey""".stripMargin)),

    // ------------------------------------------------------- semi/anti/branch
    Q("q14_semi_join_filter",
      (s, dir) => G(s, dir).V("customer")
        .filter(_.in("placed_by").where(col("o_totalprice") > 300000))
        .sortBy(col("c_custkey")).toDF,
      Some("""SELECT c.* FROM customer c WHERE EXISTS (
             |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q15_anti_join_filterNot",
      (s, dir) => G(s, dir).V("customer").filterNot(_.in("placed_by"))
        .sortBy(col("c_custkey")).toDF,
      Some("""SELECT c.* FROM customer c WHERE NOT EXISTS (
             |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q16_optional",
      (s, dir) => G(s, dir).V("customer")
        .optional(_.in("placed_by").values("o_orderkey", "o_totalprice"))
        .sortBy(col("c_custkey"), col("o_orderkey").asc_nulls_first).toDF,
      Some("""SELECT c.*, o.o_orderkey, o.o_totalprice
             |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin)),

    Q("q17_choose",
      (s, dir) => G(s, dir).V("orders")
        .chooseValue(col("o_totalprice") > 200000, lit("big"), lit("small"), "o_class")
        .groupCount(col("o_class")).orderBy("key"),
      Some("""SELECT CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS key,
             |count(*) AS count FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q18_coalesce",
      (s, dir) => G(s, dir).V("customer")
        .coalesceValue("v", when(col("c_acctbal") >= 0, col("c_mktsegment")), lit("NEGATIVE"))
        .sortBy(col("v")).toDF,
      Some("""SELECT COALESCE(CASE WHEN c_acctbal >= 0 THEN c_mktsegment END, 'NEGATIVE') AS v
             |FROM customer ORDER BY 1""".stripMargin)),

    // --------------------------------------------------------------- set ops
    Q("q19_union",
      (s, dir) => {
        val g = G(s, dir)
        g.union(
          g.V("customer").where(col("c_acctbal") < 0),
          g.V("customer").has("c_mktsegment", "AUTOMOBILE"))
          .sortBy(col("c_custkey"), col("c_acctbal")).toDF
      },
      Some("""SELECT * FROM (
             |  SELECT * FROM customer WHERE c_acctbal < 0
             |  UNION ALL SELECT * FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
             |ORDER BY c_custkey, c_acctbal""".stripMargin)),

    Q("q20_unionFlat",
      (s, dir) => G(s, dir).V("supplier")
        .unionFlat(
          _.out("supp_nation").project("name" -> col("n_name")),
          _.project("name" -> col("s_name")))
        .sortBy(col("name")).toDF,
      Some("""SELECT name FROM (
             |  SELECT n_name AS name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
             |  UNION ALL SELECT s_name AS name FROM supplier)
             |ORDER BY 1""".stripMargin)),

    // ----------------------------------------------------------- projections
    Q("q21_project_arithmetic",
      (s, dir) => G(s, dir).V("lineitem")
        .project(
          "l_orderkey" -> col("l_orderkey"),
          "l_linenumber" -> col("l_linenumber"),
          "disc_price" -> col("l_extendedprice") * (lit(1) - col("l_discount")),
          "charged" -> col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
        .sortBy(col("l_orderkey"), col("l_linenumber")).toDF,
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1 - l_discount) AS disc_price,
             |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q22_value_is",
      (s, dir) => G(s, dir).V("customer").value("c_acctbal").is(_ > 5000)
        .sortBy(col("c_acctbal")).toDF,
      Some("SELECT c_acctbal FROM customer WHERE c_acctbal > 5000 ORDER BY 1")),

    Q("q23_math",
      (s, dir) => G(s, dir).V("lineitem").math("l_quantity * 2 + l_tax", "m")
        .sortBy(col("m")).toDF,
      Some("SELECT l_quantity * 2 + l_tax AS m FROM lineitem ORDER BY 1")),

    Q("q24_sort_nulls",
      (s, dir) => G(s, dir).V("customer")
        .project(
          "seg" -> when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_mktsegment")),
          "c_custkey" -> col("c_custkey"))
        .sortBy(col("seg").asc_nulls_first, col("c_custkey")).toDF,
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg, c_custkey
             |FROM customer ORDER BY seg ASC NULLS FIRST, c_custkey""".stripMargin)),

    Q("q25_top_k",
      (s, dir) => G(s, dir).V("orders")
        .sortBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(5)
        .df.select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin)),

    // ---------------------------------------------------------- aggregations
    Q("q26_count",
      (s, dir) => G(s, dir).V("lineitem").where(col("l_shipdate") > lit("1995-01-01").cast("timestamp")).count,
      Some("""SELECT count(*) AS count FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-01-01'""")),

    Q("q27_limited_count_saturated",
      (s, dir) => G(s, dir).V("lineitem").limitedCount(1000),
      Some("""SELECT CASE WHEN c >= 1000 THEN CAST(-1000 AS BIGINT) ELSE c END AS count
             |FROM (SELECT count(*) AS c FROM (SELECT 1 FROM lineitem LIMIT 1000) t) s""".stripMargin)),

    Q("q28_limited_count_small",
      (s, dir) => G(s, dir).V("supplier").limitedCount(1000),
      Some("""SELECT CASE WHEN c >= 1000 THEN CAST(-1000 AS BIGINT) ELSE c END AS count
             |FROM (SELECT count(*) AS c FROM (SELECT 1 FROM supplier LIMIT 1000) t) s""".stripMargin)),

    Q("q29_group_agg",
      (s, dir) => G(s, dir).V("lineitem")
        .group(col("l_returnflag").as("l_returnflag"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q30_scalar_aggs",
      (s, dir) => G(s, dir).V("orders").df
        .agg(
          dsum(col("o_totalprice")).as("total"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
             |  min(o_totalprice) AS lo, max(o_totalprice) AS hi, count(*) AS n
             |FROM orders""".stripMargin)),

    Q("q31_fold_unfold",
      (s, dir) => {
        val g = G(s, dir)
        val t = g.V("lineitem")
        Traversal(g, Element.Value("folded"), t.fold("l_quantity"))
          .unfold("folded").sortBy(col("folded")).toDF
      },
      Some("SELECT l_quantity AS folded FROM lineitem ORDER BY 1")),

    Q("q32_group_collect_localCount",
      (s, dir) => G(s, dir).V("orders")
        .group(col("o_custkey").as("o_custkey"), collect_list(col("o_orderkey")).as("ids"))
        .select(col("o_custkey"), size(col("ids")).cast("bigint").as("cnt"))
        .orderBy("o_custkey"),
      Some("SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1")),

    // --------------------------------------------------- JSON agg language
    Q("q33_field_agg_topk",
      (s, dir) => {
        val json =
          """{"_agg":"field","_field":"o_orderpriority",
            |"_select":[{"_agg":"count","_name":"cnt"},
            |           {"_agg":"sum","_field":"o_totalprice","_name":"total"},
            |           {"_agg":"avg","_field":"o_totalprice","_name":"avg_price"}],
            |"_order":["-cnt"],"_size":3}""".stripMargin
        val df = G(s, dir).V("orders").df
        AggCompiler(df, AggregationParser.parse(json, Properties.passthrough), Properties.passthrough)
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(o_totalprice) AS avg_price
             |FROM orders GROUP BY 1 ORDER BY cnt DESC, o_orderpriority LIMIT 3""".stripMargin)),

    Q("q34_field_agg_conditional",
      (s, dir) => {
        val json =
          """{"_agg":"field","_field":"l_returnflag",
            |"_select":[{"_agg":"count","_name":"cnt"},
            |           {"_agg":"sum","_field":"l_quantity","_name":"qty_hi",
            |            "_query":{"_gt":{"l_quantity":25}}}]}""".stripMargin
        val df = G(s, dir).V("lineitem").df
        AggCompiler(df, AggregationParser.parse(json, Properties.passthrough), Properties.passthrough)
      },
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  CAST(SUM(CAST(CASE WHEN l_quantity > 25 THEN l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS qty_hi
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // -------------------------------------------------------- integrity ops
    Q("q35_duplicate_links",
      (s, dir) => G(s, dir).V("lineitem").df
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1)
        .orderBy("l_orderkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_suppkey, count(*) AS cnt FROM lineitem
             |GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2""".stripMargin)),

    Q("q36_dedup_keep_first",
      // keep-first where the kept payload IS the ordering column reduces
      // to a hash aggregate: min(order) per key ≡ row_number()=1 under
      // that order. The aggregate form gets map-side partial aggregation
      // and no per-partition sort — at sf100 the sort-window form was
      // CPU-bound at 107 s while shuffling the same bytes (SCALE_sf100).
      // Keep-first of a FULL row is min_by(struct, order) — same hash-agg
      // shape; the window form survives in Integrity.splitDuplicateLinks,
      // which must return the REMOVED rows too.
      (s, dir) => G(s, dir).V("lineitem").df
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(min(col("l_linenumber")).as("l_linenumber"))
        .orderBy("l_orderkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_suppkey, l_linenumber FROM (
             |  SELECT l_orderkey, l_suppkey, l_linenumber,
             |         row_number() OVER (PARTITION BY l_orderkey, l_suppkey ORDER BY l_linenumber) AS rn
             |  FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey, l_suppkey""".stripMargin)),

    Q("q37_orphan_check",
      (s, dir) => {
        val g = G(s, dir)
        g.V("orders").df.alias("o")
          .join(g.V("customer").df.alias("c"), col("o.o_custkey") === col("c.c_custkey"), "left_anti")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o.* FROM orders o WHERE NOT EXISTS (
             |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin))
  )

  def queries: Map[String, Fn] = all.map(q => q.name -> q.fn).toMap
  def oracles: Map[String, String] = all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
