package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.TestData
import CoreQueries.Q

/**
 * Oracle coverage for operators that were implemented but previously
 * spec-only: JSON read path, flatProject/constant, or/and/not
 * combinators, metadata-only count, outV, dedup(labels), graph.empty,
 * selectKeys/selectValues.
 */
object CoverageQueries {

  val all: Seq[Q] = Seq(
    Q("q60_json_read_path",
      // JsValue round-trip (reference Mapping.scala:54,60): store as JSON
      // string, read back via from_json / get_json_object, filter on an
      // extracted field
      (s, dir) => TestData.graph(s, dir).V("customer")
        .project("vm" -> to_json(struct(col("c_custkey"), col("c_name"), col("c_mktsegment"))))
        .project(
          "name" -> get_json_object(col("vm"), "$.c_name"),
          "key" -> from_json(col("vm"), org.apache.spark.sql.types.StructType.fromDDL("c_custkey BIGINT"))
            .getField("c_custkey"),
          "seg" -> get_json_object(col("vm"), "$.c_mktsegment"))
        .where(col("seg") === "BUILDING")
        .sortBy(col("key")).toDF,
      Some("""SELECT json_extract_string(vm, '$.c_name') AS name,
             |  CAST(json_extract(vm, '$.c_custkey') AS BIGINT) AS key,
             |  json_extract_string(vm, '$.c_mktsegment') AS seg
             |FROM (SELECT CAST(to_json(struct_pack(c_custkey := c_custkey, c_name := c_name,
             |  c_mktsegment := c_mktsegment)) AS VARCHAR) AS vm FROM customer)
             |WHERE json_extract_string(vm, '$.c_mktsegment') = 'BUILDING'
             |ORDER BY key""".stripMargin)),

    Q("q61_flat_project_constant",
      // flatProject → Seq[Any]-per-element (stringified) + constant step,
      // unioned across two labels
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val a = g.V("nation").flatProject(col("n_name"), col("n_regionkey"))
          .project("s" -> concat_ws(",", col("fp")))
        val b = g.V("region").constant("CONST").project("s" -> col("const"))
        g.union(a, b).sortBy(col("s")).toDF
      },
      Some("""SELECT s FROM (
             |  SELECT n_name || ',' || CAST(n_regionkey AS VARCHAR) AS s FROM nation
             |  UNION ALL SELECT 'CONST' FROM region)
             |ORDER BY 1""".stripMargin)),

    Q("q62_or_and_not_combinators",
      // or()/not() over sub-traversals (reference TraversalOps.scala:684-691)
      (s, dir) => TestData.graph(s, dir).V("customer")
        .or(
          _.where(col("c_acctbal") > 9000),
          _.in("placed_by").where(col("o_totalprice") > 400000))
        .not(_.where(col("c_mktsegment") === "MACHINERY"))
        .sortBy(col("c_custkey")).toDF,
      Some("""SELECT c.* FROM customer c
             |WHERE (c.c_acctbal > 9000 OR EXISTS (
             |         SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000))
             |  AND c.c_mktsegment IS DISTINCT FROM 'MACHINERY'
             |ORDER BY c_custkey""".stripMargin)),

    Q("q63_metadata_count",
      // count served from parquet footers, zero row reads (reference
      // indexCountQuery, janus/JanusDatabase.scala:263-269)
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Seq(TestData.metadataCount(s, s"$dir/lineitem.parquet")).toDF("count")
      },
      Some("SELECT count(*) AS count FROM lineitem")),

    Q("q64_outV_dedup",
      // edge → tail vertex (outV) with explicit dedup
      (s, dir) => TestData.graph(s, dir).V("customer")
        .has("c_mktsegment", "BUILDING")
        .inE("placed_by").outV.dedup()
        .sortBy(col("o_orderkey")).toDF,
      Some("""SELECT DISTINCT o.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING' ORDER BY o_orderkey""".stripMargin)),

    Q("q65_dedup_labels_empty_union",
      // dedup over a step label (one row per aliased element) + the empty
      // traversal unioned in (graph.empty contributes nothing)
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val t = g.V("customer").as("c").in("placed_by").dedup("c")
        val withC = t.project("c_custkey" -> t.sel("c", "c_custkey"))
        g.union(withC, g.empty("customer").project("c_custkey" -> col("c_custkey")))
          .sortBy(col("c_custkey")).toDF
      },
      Some("""SELECT DISTINCT c.c_custkey FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
             |ORDER BY c_custkey""".stripMargin)),

    Q("q67_select_tuple",
      // multi-label tuple select: both aliased positions projected side by
      // side with label-prefixed fields
      (s, dir) => TestData.graph(s, dir).V("supplier").as("s")
        .out("supp_nation").as("n")
        .selectTuple("s", "n")
        .sortBy(col("s_s_suppkey")).toDF,
      Some("""SELECT s.s_suppkey AS s_s_suppkey, s.s_name AS s_s_name,
             |  s.s_nationkey AS s_s_nationkey, s.s_acctbal AS s_s_acctbal,
             |  n.n_nationkey AS n_n_nationkey, n.n_name AS n_n_name, n.n_regionkey AS n_n_regionkey
             |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
             |ORDER BY s_s_suppkey""".stripMargin)),

    Q("q68_retype_hop",
      // v[E] re-type: an untyped projection re-typed back to its vertex
      // model, after which hops work again
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val t = g.V("customer")
        t.project(t.elementCols.toIndexedSeq.map(c => c -> col(c)): _*) // → Mixed
          .retype("customer")
          .out("cust_nation")
          .sortBy(col("n_nationkey")).toDF
      },
      Some("""SELECT n.* FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
             |ORDER BY n_nationkey""".stripMargin)),

    Q("q69_salted_group_count",
      // two-phase salted aggregation over a 3-value key (maximal skew):
      // identical result to a direct groupBy, hot-key reduce work spread
      // over 16 salt partitions
      (s, dir) => graft.operators.Skew.saltedGroupCount(
        TestData.graph(s, dir).V("lineitem").df, col("l_returnflag"), 16)
        .orderBy("key"),
      Some("SELECT l_returnflag AS key, count(*) AS count FROM lineitem GROUP BY 1 ORDER BY 1")),

    Q("q73_distinct_sketch",
      // distinct-count sketch for 100 TB profiling: the HLL estimate is
      // engine-specific, so the oracle contract is exact count + the
      // sketch landing within 3× its configured rsd (a ~3-sigma bound;
      // deterministic for fixed rsd and data)
      (s, dir) => TestData.graph(s, dir).V("events").df
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.05).as("approx"))
        .select(
          col("exact_users"),
          (abs(col("approx") - col("exact_users")).cast("double") / col("exact_users") <= 0.15).as("sketch_ok")),
      Some("""SELECT count(DISTINCT user_id) AS exact_users, TRUE AS sketch_ok FROM events""")),

    Q("q74_sessionize",
      // event sessionization: a >30-minute gap per user starts a new
      // session (lag + running sum over the user partition) — the classic
      // pipeline op the reference lacks; one shuffle on user_id
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        TestData.graph(s, dir).V("events").df
          .withColumn("gap",
            when(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(byUser)) > 1800000L, 1L)
              .otherwise(lit(0L)))
          .withColumn("session_idx", sum(col("gap")).over(byUser))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"), unix_millis(min(col("ts"))).as("start_ms"))
          .orderBy("user_id", "session_idx")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS gap
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_idx
             |  FROM g)
             |SELECT user_id, session_idx, count(*) AS n_events, min(epoch_ms(ts)) AS start_ms
             |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q75_stratified_hash_sample",
      // deterministic 10 % hash sampling (md5 of the row key mod 100) —
      // reproducible training-data subsetting, counted per stratum
      (s, dir) => TestData.graph(s, dir).V("lineitem").df
        .where(expr("CAST(conv(substr(md5(_rowid), 1, 8), 16, 10) AS BIGINT) % 100 < 10"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("sampled"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS sampled FROM lineitem
             |WHERE CAST(concat('0x', substr(md5(concat_ws('-', l_orderkey, l_linenumber, l_partkey,
             |  l_suppkey, CAST(floor(l_quantity) AS BIGINT), l_linestatus)), 1, 8)) AS BIGINT) % 100 < 10
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q72_edge_table_hop",
      // hop over a REAL edge table (supplies: supplier→part, two equi-
      // joins vertex→edge→vertex) — the TPC-H graph otherwise only has
      // single-join FK edges
      (s, dir) => TestData.graph(s, dir).V("part")
        .where(col("p_size") > 45)
        .in("supplies").dedup()
        .sortBy(col("s_suppkey")).toDF,
      Some("""SELECT DISTINCT s.* FROM supplier s
             |JOIN (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem) e ON e.l_suppkey = s.s_suppkey
             |JOIN part p ON p.p_partkey = e.l_partkey
             |WHERE p.p_size > 45 ORDER BY s_suppkey""".stripMargin)),

    Q("q66_map_keys_values",
      // selectKeys/selectValues over a map column
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val m = g.V("nation")
          .project("m" -> map(lit("name"), col("n_name"), lit("rk"), col("n_regionkey").cast("string")))
        val ks = m.selectKeys("m").project("s" -> concat_ws(",", col("keys")))
        val vs = m.selectValues("m").project("s" -> concat_ws(",", col("values")))
        g.union(ks, vs).sortBy(col("s")).toDF
      },
      Some("""SELECT s FROM (
             |  SELECT array_to_string(map_keys(MAP {'name': n_name, 'rk': CAST(n_regionkey AS VARCHAR)}), ',') AS s FROM nation
             |  UNION ALL
             |  SELECT array_to_string(map_values(MAP {'name': n_name, 'rk': CAST(n_regionkey AS VARCHAR)}), ',') FROM nation)
             |ORDER BY 1""".stripMargin))
  )
}
