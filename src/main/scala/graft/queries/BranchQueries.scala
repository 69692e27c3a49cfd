package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.TestData
import graft.traversal.ProjectBy
import CoreQueries.Q

/**
 * Branch operators: branch-traversal coalesce (first non-empty branch per
 * element), multi-way chooseBranch routing, and the declarative `match`
 * pattern step (reference: TraversalOps.scala:274-287,289-300,367-403).
 */
object BranchQueries {

  val all: Seq[Q] = Seq(
    Q("q52_coalesce_branch",
      // per order: returnflags of heavy lineitems (qty>49) if any, else
      // linestatuses of qty>45 items, else the constant 'NONE' — branch
      // priority decided per element, all rows of the winning branch kept
      (s, dir) => {
        val t = TestData.graph(s, dir).V("orders").as("o")
          .coalesceBranch("v", Some("NONE"),
            _.in("of_order").where(col("l_quantity") > 49).value("l_returnflag"),
            _.in("of_order").where(col("l_quantity") > 45).value("l_linestatus"))
        t.project("o_orderkey" -> t.sel("o", "o_orderkey"), "v" -> col("v"))
          .sortBy(col("o_orderkey"), col("v")).toDF
      },
      Some("""WITH b0 AS (SELECT l_orderkey AS k, l_returnflag AS v FROM lineitem WHERE l_quantity > 49),
             |b1 AS (SELECT l_orderkey AS k, l_linestatus AS v FROM lineitem WHERE l_quantity > 45)
             |SELECT o_orderkey, v FROM (
             |  SELECT o_orderkey, v FROM orders JOIN b0 ON k = o_orderkey
             |  UNION ALL
             |  SELECT o_orderkey, v FROM orders JOIN b1 ON k = o_orderkey
             |    WHERE o_orderkey NOT IN (SELECT k FROM b0)
             |  UNION ALL
             |  SELECT o_orderkey, 'NONE' FROM orders
             |    WHERE o_orderkey NOT IN (SELECT k FROM b0 UNION SELECT k FROM b1))
             |ORDER BY 1, 2""".stripMargin)),

    Q("q53_choose_branch",
      // route customers by segment: BUILDING → their nation's name,
      // MACHINERY → their own name, everyone else → a constant
      (s, dir) => {
        val t = TestData.graph(s, dir).V("customer").as("c")
          .chooseBranch(col("c_mktsegment"), "v",
            Seq(
              "BUILDING" -> (_.out("cust_nation").value("n_name")),
              "MACHINERY" -> (_.value("c_name"))),
            none = Some(_.constant("OTHER")))
        t.project("c_custkey" -> t.sel("c", "c_custkey"), "v" -> col("v"))
          .sortBy(col("c_custkey"), col("v")).toDF
      },
      Some("""SELECT c_custkey, v FROM (
             |  SELECT c_custkey, n_name AS v FROM customer JOIN nation ON c_nationkey = n_nationkey
             |    WHERE c_mktsegment = 'BUILDING'
             |  UNION ALL
             |  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'MACHINERY'
             |  UNION ALL
             |  SELECT c_custkey, 'OTHER' FROM customer
             |    WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY'))
             |ORDER BY 1, 2""".stripMargin)),

    Q("q92_choose_branch_picks",
      // all three TinkerPop pick routings in one query: value options,
      // `none` (catching BOTH a null selector — FURNITURE nulled via
      // nullif — and unmatched segments), and `any` (every customer
      // additionally, regardless of routing)
      (s, dir) => {
        val t = TestData.graph(s, dir).V("customer").as("c")
          .chooseBranch(expr("nullif(c_mktsegment, 'FURNITURE')"), "v",
            Seq(
              "BUILDING" -> (_.out("cust_nation").value("n_name")),
              "MACHINERY" -> (_.value("c_name"))),
            none = Some(_.constant("NONE")),
            any = Some(_.constant("ANY")))
        t.project("c_custkey" -> t.sel("c", "c_custkey"), "v" -> col("v"))
          .sortBy(col("c_custkey"), col("v")).toDF
      },
      Some("""SELECT c_custkey, v FROM (
             |  SELECT c_custkey, n_name AS v FROM customer JOIN nation ON c_nationkey = n_nationkey
             |    WHERE c_mktsegment = 'BUILDING'
             |  UNION ALL
             |  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'MACHINERY'
             |  UNION ALL
             |  SELECT c_custkey, 'NONE' FROM customer
             |    WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')
             |  UNION ALL
             |  SELECT c_custkey, 'ANY' FROM customer)
             |ORDER BY 1, 2""".stripMargin)),

    Q("q54_match_pattern",
      // declarative pattern: customer c -in nation n- supplier s, with a
      // cycle-closing third pattern (s's nation must BE n) and a
      // cross-binding predicate — the reference's match + where shape
      (s, dir) => {
        val t = TestData.graph(s, dir).V("customer")
          .where(col("c_acctbal") > 9000)
          .matchPattern("c",
            ("c", _.out("cust_nation"), "n"),
            ("n", _.in("supp_nation"), "s"),
            ("s", _.out("supp_nation"), "n"))
        t.where(t.sel("c", "c_acctbal") < t.sel("s", "s_acctbal"))
          .project("c_custkey" -> t.sel("c", "c_custkey"), "s_suppkey" -> t.sel("s", "s_suppkey"))
          .sortBy(col("c_custkey"), col("s_suppkey")).toDF
      },
      Some("""SELECT c.c_custkey, s.s_suppkey
             |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN supplier s ON s.s_nationkey = n.n_nationkey
             |WHERE c.c_acctbal > 9000 AND c.c_acctbal < s.s_acctbal
             |ORDER BY 1, 2""".stripMargin)),

    Q("q55_project_sub_traversal",
      // the reference's most common project shape: entity columns plus
      // correlated sub-traversal aggregations (count / first / list)
      (s, dir) => TestData.graph(s, dir).V("orders")
        .projectBy(
          ProjectBy.Col("o_orderkey", col("o_orderkey")),
          ProjectBy.Col("o_totalprice", col("o_totalprice")),
          ProjectBy.Sub("item_count", _.in("of_order"), "count"),
          ProjectBy.Sub("min_ship", _.in("of_order").value("l_shipdate"), "min"),
          ProjectBy.Sub("flags", _.in("of_order").value("l_returnflag"), "list"))
        .project(
          "o_orderkey" -> col("o_orderkey"),
          "o_totalprice" -> col("o_totalprice"),
          "item_count" -> col("item_count"),
          // l_shipdate is TIMESTAMP_NTZ in the testdata; UTC session makes
          // the cast to TIMESTAMP exact
          "min_ship_ms" -> unix_millis(col("min_ship").cast("timestamp")),
          "flags" -> concat_ws(",", col("flags")))
        .sortBy(col("o_orderkey")).toDF,
      Some("""SELECT o.o_orderkey, o.o_totalprice,
             |  coalesce(l.cnt, 0) AS item_count,
             |  epoch_ms(l.min_ship) AS min_ship_ms,
             |  coalesce(l.flags, '') AS flags
             |FROM orders o LEFT JOIN (
             |  SELECT l_orderkey, count(*) AS cnt, min(l_shipdate) AS min_ship,
             |         string_agg(l_returnflag, ',' ORDER BY l_returnflag) AS flags
             |  FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
             |ORDER BY o_orderkey""".stripMargin))
  )
}
