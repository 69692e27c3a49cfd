package graft.queries

import org.apache.spark.sql.functions._
import graft.services.Integrity
import graft.sources.TestData
import CoreQueries.Q

/**
 * Link-integrity repair strategies over deterministically corrupted
 * inputs (the reference proves these with deliberately broken fixtures,
 * IntegrityCheckTest.scala:23-293; here the corruption is a pure function
 * of the key so the DuckDB oracle reproduces it).
 */
object IntegrityQueries {

  val all: Seq[Q] = Seq(
    Q("q56_integrity_set_fk",
      // SingleLinkChecker SET: null out o_custkey for o_orderkey%97==0,
      // then heal the FK from the placed_by link source — every corrupted
      // row is restored to its original target
      (s, dir) => {
        val orders = TestData.graph(s, dir).V("orders").df
        val corrupted = orders.withColumn(
          "o_custkey",
          when(col("o_orderkey") % 97 === 0, lit(null)).otherwise(col("o_custkey")))
        val links = orders.select(col("o_orderkey").as("src"), col("o_custkey").as("dst"))
        Integrity.setSingleLink(corrupted, "o_orderkey", "o_custkey", links)
          .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey")),

    Q("q57_integrity_remove_extra_links",
      // MultiLinkChecker keep-first: the REMOVED side of duplicate
      // (l_orderkey, l_suppkey) links (q36 verifies the kept side)
      (s, dir) => {
        val (_, removed) = Integrity.splitDuplicateLinks(
          TestData.graph(s, dir).V("lineitem").df,
          Seq("l_orderkey", "l_suppkey"), "l_linenumber")
        removed.select("l_orderkey", "l_suppkey", "l_linenumber")
          .orderBy("l_orderkey", "l_suppkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_suppkey, l_linenumber FROM (
             |  SELECT l_orderkey, l_suppkey, l_linenumber,
             |         row_number() OVER (PARTITION BY l_orderkey, l_suppkey ORDER BY l_linenumber) AS rn
             |  FROM lineitem) t WHERE rn > 1 ORDER BY 1, 2, 3""".stripMargin)),

    Q("q58_integrity_orphan_set",
      // Orphan SET strategy: drop the orders of customers with
      // c_custkey%83==0 (simulated link loss), then rewrite orphaned
      // customers' segment to 'ORPHAN'
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val survivingOrders = g.V("orders").df.where(col("o_custkey") % 83 =!= 0)
        Integrity.setOnOrphans(
          g.V("customer").df, "c_custkey",
          survivingOrders.select(col("o_custkey").as("src")),
          Map("c_mktsegment" -> lit("ORPHAN")))
          .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN EXISTS (SELECT 1 FROM orders o
             |                    WHERE o.o_custkey = c.c_custkey AND o.o_custkey % 83 <> 0)
             |       THEN c_mktsegment ELSE 'ORPHAN' END AS c_mktsegment
             |FROM customer c ORDER BY c_custkey""".stripMargin)),

    Q("q59_integrity_remove_orphans",
      // Orphan REMOVE strategy on the same simulated link loss
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val survivingOrders = g.V("orders").df.where(col("o_custkey") % 83 =!= 0)
        Integrity.removeOrphans(
          g.V("customer").df, "c_custkey",
          survivingOrders.select(col("o_custkey").as("src")))
          .select("c_custkey").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer c WHERE EXISTS (
             |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_custkey % 83 <> 0)
             |ORDER BY c_custkey""".stripMargin))
  )
}
