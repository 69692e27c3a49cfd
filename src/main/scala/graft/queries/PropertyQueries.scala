package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s.JValue
import graft.query._
import graft.sources.TestData
import graft.traversal.Graph
import CoreQueries.Q

/**
 * Traversal-based public properties through the JSON executor — the
 * linked-entity-field surface every reference-derived app uses
 * (reference: query/PublicProperty.scala:80-105, PropertyBuilder.scala:
 * 22-56; test pattern core-test/.../QueryTest.scala:63-104).
 *
 * Property catalog used here (on `customer`):
 *  - `order_price`  = in(placed_by).value(o_totalprice)   (multi-valued)
 *  - `nation_name`  = out(cust_nation).value(n_name)      (single-valued)
 */
object PropertyQueries {

  private def customerProps: Properties =
    Properties(
      PublicProperty.fromTraversal("order_price", DoubleType)(_.in("placed_by").value("o_totalprice")),
      PublicProperty.fromTraversal("nation_name", StringType)(_.out("cust_nation").value("n_name"))
    ) ++ Properties.passthrough

  private def exec(s: org.apache.spark.sql.SparkSession, dir: String): QueryExecutor = {
    val g: Graph = TestData.graph(s, dir)
    new QueryExecutor(g, QueryExecutor.defaultNamed(g), Map("customer" -> customerProps))
  }

  val all: Seq[Q] = Seq(
    Q("q48_traversal_prop_filter",
      // EXISTS semantics: any linked order matches the predicate
      (s, dir) => exec(s, dir).execute(
        """[{"_name":"all_customer"},
          |  {"_name":"filter","_query":{"_gt":{"order_price":300000}}},
          |  {"_name":"sort","_fields":["+c_custkey"]}]""".stripMargin),
      Some("""SELECT c.* FROM customer c WHERE EXISTS (
             |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q49_traversal_prop_not_exists",
      // NOT EXISTS composes as flag negation (reference filterNot)
      (s, dir) => exec(s, dir).execute(
        """[{"_name":"all_customer"},
          |  {"_name":"filter",
          |   "_query":{"_and":[{"_not":{"_contains":"order_price"}},
          |                     {"_gte":{"c_acctbal":0}}]}},
          |  {"_name":"sort","_fields":["+c_custkey"]}]""".stripMargin),
      Some("""SELECT c.* FROM customer c WHERE NOT EXISTS (
             |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |  AND c.c_acctbal >= 0
             |ORDER BY c_custkey""".stripMargin)),

    Q("q50_traversal_prop_sort",
      // sort by a linked-entity field: the property resolves to a joined
      // value column (min per element; = the value for single-valued links)
      (s, dir) => exec(s, dir).execute(
        """[{"_name":"all_customer"},
          |  {"_name":"sort","_fields":["-nation_name","+c_custkey"]},
          |  {"_name":"page","from":0,"to":30}]""".stripMargin),
      Some("""SELECT c.*, n.n_name AS nation_name
             |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |ORDER BY nation_name DESC, c_custkey LIMIT 30""".stripMargin)),

    Q("q51_traversal_prop_agg",
      // group-by a linked-entity field with nested sub-aggregations
      (s, dir) => exec(s, dir).execute(
        """[{"_name":"all_customer"},
          |  {"_name":"aggregation","_agg":"field","_field":"nation_name",
          |   "_select":[{"_agg":"count","_name":"cnt"},
          |              {"_agg":"sum","_field":"c_acctbal","_name":"bal_sum"}]}]""".stripMargin),
      Some("""SELECT n.n_name AS nation_name, count(*) AS cnt,
             |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal_sum
             |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |GROUP BY 1 ORDER BY nation_name""".stripMargin)),

    Q("q91_traversal_prop_agg_exists",
      // aggregation `_query` pre-filter on a MULTI-valued link resolves as
      // EXISTS (any linked order matches), not min-per-element: a customer
      // whose order prices are [100, 400000] must be counted — min
      // resolution (100) would drop it. Same compiler path as the filter
      // step (q48); this entry pins the aggregation route.
      (s, dir) => exec(s, dir).execute(
        """[{"_name":"all_customer"},
          |  {"_name":"aggregation","_agg":"field","_field":"nation_name",
          |   "_query":{"_gt":{"order_price":300000}},
          |   "_select":[{"_agg":"count","_name":"cnt"},
          |              {"_agg":"sum","_field":"c_acctbal","_name":"bal_sum"}]}]""".stripMargin),
      Some("""SELECT n.n_name AS nation_name, count(*) AS cnt,
             |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal_sum
             |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |WHERE EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |GROUP BY 1 ORDER BY nation_name""".stripMargin))
  )
}
