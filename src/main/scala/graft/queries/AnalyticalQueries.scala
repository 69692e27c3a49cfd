package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sources.TestData
import CoreQueries.Q

/**
 * TPC-H-class analytical workloads expressed through the traversal DSL —
 * the "real analytics over the graph surface" demonstration: multi-join
 * star queries where dimension hops broadcast and only the fact
 * aggregation shuffles; the Q5-shaped query runs through `matchPattern`,
 * whose cycle-closing binding (supplier in the customer's nation) is the
 * declarative-pattern showcase.
 */
object AnalyticalQueries {

  private def dsum(c: Column): Column =
    graft.functions.DuckDecimalCast.duckDouble(
      sum(graft.functions.DuckDecimalCast.duckDecimal6(c.cast("double"))))

  val all: Seq[Q] = Seq(
    Q("q70_shipping_priority",
      // TPC-H Q3 shape: segment-filtered customers → their pre-cutoff
      // orders → post-cutoff lineitems, revenue top-10
      (s, dir) => {
        val cutoff = lit("1996-03-15").cast("timestamp_ntz")
        val t = TestData.graph(s, dir).V("customer").has("c_mktsegment", "BUILDING")
          .in("placed_by").where(col("o_orderdate") < cutoff).as("o")
          .in("of_order").where(col("l_shipdate") > cutoff)
        t.group(
          t.sel("o", "o_orderkey").as("o_orderkey"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT o.o_orderkey, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
             |FROM customer c
             |JOIN orders o ON o.o_custkey = c.c_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |WHERE c.c_mktsegment = 'BUILDING'
             |  AND o.o_orderdate < TIMESTAMP '1996-03-15'
             |  AND l.l_shipdate > TIMESTAMP '1996-03-15'
             |GROUP BY 1 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    Q("q71_local_supplier_volume",
      // TPC-H Q5 shape via matchPattern: lineitem→order→customer→nation,
      // lineitem→supplier→nation CYCLE-CLOSED (supplier in the customer's
      // nation), nation→region filter, revenue per nation
      (s, dir) => {
        val t = TestData.graph(s, dir).V("lineitem").matchPattern("l",
          ("l", _.out("of_order"), "o"),
          ("o", _.out("placed_by"), "c"),
          ("c", _.out("cust_nation"), "n"),
          ("l", _.out("of_supplier"), "s"),
          ("s", _.out("supp_nation"), "n"), // cycle close
          ("n", _.out("of_region"), "r"))
        val filtered = t.where(
          t.sel("r", "r_name") === "ASIA" &&
            t.sel("o", "o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            t.sel("o", "o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        filtered.group(
          filtered.sel("n", "n_name").as("n_name"),
          dsum(filtered.sel("l", "l_extendedprice") * (lit(1) - filtered.sel("l", "l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      Some("""SELECT n.n_name, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
             |FROM lineitem l
             |JOIN orders o ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |WHERE r.r_name = 'ASIA'
             |  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin))
  )
}
