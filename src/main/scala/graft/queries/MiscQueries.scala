package graft.queries

import org.apache.spark.sql.functions._
import graft.query.{Properties, PublicProperty, QueryExecutor}
import graft.services.Mutations
import graft.sources.TestData
import CoreQueries.Q

/** Remaining operator-inventory entries: JSON projections, write-path
  * rewrites, base64 codec, id rendering, and regression queries for the
  * round-1 latent bugs (`_id` filter, optional() FK hop, customFilter,
  * FkEdge dstKey ≠ idCol). */
object MiscQueries {

  val all: Seq[Q] = Seq(
    Q("q38_value_map_json",
      (s, dir) => TestData.graph(s, dir).V("customer")
        .valueMap("c_custkey", "c_name", "c_mktsegment")
        .sortBy(col("vm")).toDF,
      Some("""SELECT CAST(to_json(struct_pack(c_custkey := c_custkey, c_name := c_name,
             |  c_mktsegment := c_mktsegment)) AS VARCHAR) AS vm
             |FROM customer ORDER BY 1""".stripMargin)),

    Q("q39_id_rendering",
      // the reference renders entity ids as "~<id>" at the API boundary
      // (EntityId.scala:10-19)
      (s, dir) => TestData.graph(s, dir).V("nation")
        .project("eid" -> concat(lit("~"), col("n_nationkey")), "n_name" -> col("n_name"))
        .sortBy(col("n_name")).toDF,
      Some("SELECT concat('~', n_nationkey) AS eid, n_name FROM nation ORDER BY n_name")),

    Q("q40_base64_codec",
      // binary ↔ base64 string round-trip (reference Mapping.scala:72-73)
      (s, dir) => TestData.graph(s, dir).V("region")
        .project(
          "r_regionkey" -> col("r_regionkey"),
          "b64" -> base64(col("r_name").cast("binary")),
          "roundtrip" -> unbase64(base64(col("r_name").cast("binary"))).cast("string"))
        .sortBy(col("r_regionkey")).toDF,
      Some("""SELECT r_regionkey, to_base64(CAST(r_name AS BLOB)) AS b64, r_name AS roundtrip
             |FROM region ORDER BY r_regionkey""".stripMargin)),

    Q("q41_update_rewrite",
      (s, dir) => {
        // PropertyUpdater as a batch rewrite: zero negative balances
        val t = TestData.graph(s, dir).V("customer").df
        Mutations.updateWhere(t, col("c_acctbal") < 0,
            Map("c_acctbal" -> lit(0.0)), "admin",
            java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
          .select("c_custkey", "c_acctbal").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("q42_delete_rewrite",
      (s, dir) => {
        val g = TestData.graph(s, dir)
        // remove() of a traversal's selection: drop customers that have
        // no orders, as an anti-join rewrite
        val doomed = g.V("customer").filterNot(_.in("placed_by")).df
        Mutations.removeIds(g.V("customer").df, "c_custkey", doomed)
          .select("c_custkey").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer c WHERE EXISTS (
             |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q43_insert_with_audit",
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val spark = s
        import spark.implicits._
        val rows = Seq((9001L, "NEWLAND"), (9002L, "TERRA")).toDF("r_regionkey", "r_name")
        val at = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        Mutations.create(
            Mutations.withAudit(g.V("region").df, "region", "loader", at),
            Mutations.withAudit(rows, "region", "admin", at))
          .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"),
            col("_label"), col("_createdBy"), unix_millis(col("_createdAt")).as("created_ms"))
          .orderBy("r_regionkey")
      },
      Some("""SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name, 'region' AS _label,
             |  'loader' AS _createdBy, CAST(1767225600000 AS BIGINT) AS created_ms FROM region
             |UNION ALL SELECT v, n, 'region', 'admin', 1767225600000 FROM
             |  (VALUES (CAST(9001 AS BIGINT), 'NEWLAND'), (CAST(9002 AS BIGINT), 'TERRA')) t(v, n)
             |ORDER BY r_regionkey""".stripMargin)),

    Q("q93_set_cardinality_write",
      // Set-cardinality enforcement on the write path: per-customer order
      // priorities collected WITH duplicates, written through the
      // model-aware create — the declared Cardinality.Set applies
      // array_distinct, so the persisted size is the distinct count
      // (reference: SetMapping, models/Mapping.scala:275-308)
      (s, dir) => {
        import graft.model.{Cardinality, FieldDef, VertexDef}
        import org.apache.spark.sql.types._
        val orders = TestData.graph(s, dir).V("orders").df
        val rows = orders.groupBy(col("o_custkey").cast("long").as("c_custkey"))
          .agg(collect_list(col("o_orderpriority")).as("prios"))
        val model = VertexDef("cust_prio", Seq(
          FieldDef("c_custkey", LongType),
          FieldDef("prios", StringType, Cardinality.Set)))
        Mutations.create(rows.limit(0), rows, model)
          .select(
            col("c_custkey"),
            array_join(array_sort(col("prios")), ",").as("prios_str"),
            size(col("prios")).as("n_distinct"))
          .orderBy("c_custkey")
      },
      Some("""SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
             |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS prios_str,
             |  CAST(len(list_distinct(list(o_orderpriority))) AS INT) AS n_distinct
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q44_id_filter_executor",
      // `_id` filter resolved through the traversal's id column (round-1
      // latent bug: a hardcoded `_id` column threw on every real table)
      (s, dir) => {
        val g = TestData.graph(s, dir)
        new QueryExecutor(g, QueryExecutor.defaultNamed(g)).execute(
          """[{"_name":"all_customer"},
            |  {"_name":"filter","_query":{"_or":[{"_id":42},{"_id":77}]}},
            |  {"_name":"sort","_fields":["+c_custkey"]}]""".stripMargin)
      },
      Some("SELECT * FROM customer WHERE c_custkey IN (42, 77) ORDER BY c_custkey")),

    Q("q45_optional_fk_hop",
      // optional() whose sub-traversal's first hop joins on a FOREIGN-KEY
      // column of the element (round-1 latent bug: the sub-input was pruned
      // to the id column, so any FK-edge first hop threw)
      (s, dir) => TestData.graph(s, dir).V("customer")
        .optional(_.out("cust_nation").values("n_name"))
        .sortBy(col("c_custkey")).toDF,
      Some("""SELECT c.*, n.n_name FROM customer c
             |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |ORDER BY c_custkey""".stripMargin)),

    Q("q46_custom_filter_property",
      // public property with a custom filter builder (reference:
      // PropertyBuilder.scala:95-116), here case-insensitive equality
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val props = Properties(PublicProperty(
          "segment", col("c_mktsegment"),
          customFilter = Some((op, v) => op match {
            case "_is" => lower(col("c_mktsegment")) === lit(v.toString.toLowerCase)
            case "_ne" => !(lower(col("c_mktsegment")) <=> lit(v.toString.toLowerCase))
            case other => throw new IllegalArgumentException(s"segment filter: unsupported op $other")
          }))) ++ Properties.passthrough
        new QueryExecutor(g, QueryExecutor.defaultNamed(g), Map("customer" -> props)).execute(
          """[{"_name":"all_customer"},
            |  {"_name":"filter","_query":{"_is":{"segment":"bUiLdInG"}}},
            |  {"_name":"sort","_fields":["+c_custkey"]}]""".stripMargin)
      },
      Some("SELECT * FROM customer WHERE lower(c_mktsegment) = 'building' ORDER BY c_custkey")),

    Q("q47_fk_edge_dstkey_hop",
      // FkEdge whose dstKey differs from the destination idCol (by_user:
      // events.user_id → events.user_id, idCol event_id) — the round-1 edge
      // path silently joined _dst against the idCol
      (s, dir) => {
        val t = TestData.graph(s, dir).V("events")
          .where(col("event_id") < 20).as("a").outE("by_user").otherV
        t.project("a_event" -> t.sel("a", "event_id"), "b_event" -> col("event_id"))
          .sortBy(col("a_event"), col("b_event")).toDF
      },
      Some("""SELECT a.event_id AS a_event, b.event_id AS b_event
             |FROM events a JOIN events b ON b.user_id = a.user_id
             |WHERE a.event_id < 20 ORDER BY 1, 2""".stripMargin)),

    Q("q95_label_groupcount",
      // the label step (reference: TraversalOps.scala:580-581) over a
      // heterogeneous union: each branch's label is a plan-time constant
      // tagged into the union, so counting by label never touches data
      // columns — the scans prune to zero-width row counts
      (s, dir) => {
        val g = TestData.graph(s, dir)
        g.union(g.V("customer"), g.V("supplier"), g.V("nation"))
          .label("lbl").groupCount(col("lbl")).orderBy("key")
      },
      Some("""SELECT key, count(*) AS count FROM (
             |  SELECT 'customer' AS key FROM customer
             |  UNION ALL SELECT 'supplier' FROM supplier
             |  UNION ALL SELECT 'nation' FROM nation)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q96_haslabel_retype",
      // hasLabel (reference: TraversalOps.scala:548) narrows a mixed
      // union back to one model and RE-TYPES it, so typed steps compose
      // downstream; on a homogeneous traversal it folds at plan time
      (s, dir) => {
        val g = TestData.graph(s, dir)
        g.union(g.V("customer"), g.V("supplier"))
          .hasLabel("customer")
          .has("c_mktsegment", "BUILDING")
          .value("c_custkey").sortBy(col("c_custkey")).toDF
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE c_mktsegment = 'BUILDING' ORDER BY 1""".stripMargin)),

    Q("q97_add_value_multi",
      // addValue on multi-valued properties (reference:
      // MultiValueMapping.addValue, models/Mapping.scala:147-151):
      // List cardinality APPENDS unconditionally (duplicates accumulate),
      // Set cardinality appends only when absent. Exercised on the same
      // per-customer priority collection with both declared cardinalities
      (s, dir) => {
        import graft.model.Cardinality
        val orders = TestData.graph(s, dir).V("orders").df
        val rows = orders.groupBy(col("o_custkey").cast("long").as("c_custkey"))
          .agg(
            array_sort(collect_list(col("o_orderpriority"))).as("plist"),
            array_sort(array_distinct(collect_list(col("o_orderpriority")))).as("pset"))
        val cond = col("c_custkey") % 2 === 0
        val at = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        val v = lit("1-URGENT")
        val step1 = Mutations.addValueWhere(rows, cond, "plist", v, Cardinality.List, "admin", at)
        Mutations.addValueWhere(step1, cond, "pset", v, Cardinality.Set, "admin", at)
          .select(
            col("c_custkey"),
            array_join(col("plist"), ",").as("plist_str"),
            size(col("plist")).as("n_list"),
            array_join(col("pset"), ",").as("pset_str"),
            size(col("pset")).as("n_set"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  array_to_string(CASE WHEN c_custkey % 2 = 0
             |    THEN list_append(plist, '1-URGENT') ELSE plist END, ',') AS plist_str,
             |  CAST(len(plist) + CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS INT) AS n_list,
             |  array_to_string(CASE WHEN c_custkey % 2 = 0 AND NOT list_contains(pset, '1-URGENT')
             |    THEN list_append(pset, '1-URGENT') ELSE pset END, ',') AS pset_str,
             |  CAST(len(pset) + CASE WHEN c_custkey % 2 = 0 AND NOT list_contains(pset, '1-URGENT')
             |    THEN 1 ELSE 0 END AS INT) AS n_set
             |FROM (
             |  SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
             |    list_sort(list(o_orderpriority)) AS plist,
             |    list_sort(list_distinct(list(o_orderpriority))) AS pset
             |  FROM orders GROUP BY 1)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q98_remove_value",
      // removeValue strips EVERY occurrence of the value from the rows the
      // condition selects (reference: MultiValueMapping.removeValue,
      // models/Mapping.scala:152-159); unmatched rows pass through intact
      (s, dir) => {
        val orders = TestData.graph(s, dir).V("orders").df
        val rows = orders.groupBy(col("o_custkey").cast("long").as("c_custkey"))
          .agg(array_sort(collect_list(col("o_orderpriority"))).as("plist"))
        val at = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        Mutations.removeValueWhere(rows, col("c_custkey") % 2 === 0,
            "plist", lit("3-MEDIUM"), "admin", at)
          .select(
            col("c_custkey"),
            array_join(col("plist"), ",").as("plist_str"),
            size(col("plist")).as("n_list"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  -- COALESCE pins the emptied-list edge: Spark's array_join([])
             |  -- is '' while DuckDB's array_to_string([]) is NULL — a
             |  -- divergence the CSV-serializing compare path cannot see
             |  -- (both render as an empty field) but the aggregate-hash
             |  -- path (NULL -> chr(0)) catches
             |  COALESCE(array_to_string(CASE WHEN c_custkey % 2 = 0
             |    THEN list_filter(plist, x -> x <> '3-MEDIUM') ELSE plist END, ','), '') AS plist_str,
             |  CAST(len(CASE WHEN c_custkey % 2 = 0
             |    THEN list_filter(plist, x -> x <> '3-MEDIUM') ELSE plist END) AS INT) AS n_list
             |FROM (
             |  SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
             |    list_sort(list(o_orderpriority)) AS plist
             |  FROM orders GROUP BY 1)
             |ORDER BY c_custkey""".stripMargin))
  )
}
