package graft

import org.apache.spark.sql.functions._
import graft.traversal._
import graft.query.{GlobalQueryExecutor, QueryExecutor}

/**
 * Compiles and runs the code examples in MIGRATION.md, so the switch
 * guide cannot drift from the real API: if a signature in an example
 * changes, this spec stops compiling and the guide gets fixed with it.
 * Each test name cites the guide section it pins.
 */
class MigrationGuideSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def g: Graph = graft.sources.TestData.graph(spark, sfDir)

  describe("MIGRATION.md examples") {

    it("'Declaring your schema': VertexTable / FkEdge / EdgeTable construction") {
      val customerDf = spark.read.parquet(s"$sfDir/customer.parquet")
      val nationDf = spark.read.parquet(s"$sfDir/nation.parquet")
      val guide = new Graph(spark,
        vertices = Map(
          "customer" -> VertexTable("customer", customerDf, idCol = "c_custkey"),
          "nation" -> VertexTable("nation", nationDf, idCol = "n_nationkey")),
        edges = Map(
          "cust_nation" -> FkEdge("cust_nation", "customer", "nation", "c_nationkey", "n_nationkey")))
      assert(guide.V("customer").out("cust_nation").toDF.count() > 0)
    }

    it("'Traversals': filter + sort + range, hop + has, groupCount") {
      val page = g.V("customer")
        .has("c_mktsegment", "BUILDING")
        .sort("c_name" -> true).range(0, 20)
      assert(page.toDF.count() <= 20)

      val french = g.V("customer").out("cust_nation").has("n_name", "FRANCE")
      assert(french.toDF.columns.contains("n_name"))

      val byPriority = g.V("orders").groupCount(col("o_orderpriority"))
      assert(byPriority.count() > 0)
    }

    it("'Traversals': cross-alias where via as/sel") {
      val t = g.V("customer").as("c").out("cust_nation").as("n")
      val filtered = t.where(t.sel("c", "c_acctbal") > t.sel("n", "n_regionkey"))
      assert(filtered.toDF.count() > 0)
    }

    it("'JSON query language': the guide's filter pipeline is wire-valid") {
      val ex = new QueryExecutor(g, QueryExecutor.defaultNamed(g))
      val df = ex.execute(
        """[{"_name": "all_customer"},
          | {"_name": "filter", "_query": {"_and": [
          |    {"_is": {"_field": "c_mktsegment", "_value": "BUILDING"}},
          |    {"_gt": {"c_acctbal": 1000}}]}},
          | {"_name": "sort", "_fields": [{"c_name": "asc"}]},
          | {"_name": "page", "from": 0, "to": 20}]""".stripMargin)
      val rows = df.collect()
      assert(rows.length <= 20)
      assert(rows.forall(_.getAs[String]("c_mktsegment") == "BUILDING"))
    }

    it("'JSON query language': the guide's recursive aggregation is wire-valid") {
      val ex = new QueryExecutor(g, QueryExecutor.defaultNamed(g))
      val js = ex.executeJson(
        """[{"_name": "all_customer"},
          | {"_name": "aggregation",
          |  "_agg": "field", "_field": "c_mktsegment", "_order": "-count", "_size": 3,
          |  "_select": [{"_agg": "field", "_field": "c_nationkey",
          |               "_select": [{"_agg": "count"}]}]}]""".stripMargin)
      assert(js.isInstanceOf[org.json4s.JObject])
      assert(js.asInstanceOf[org.json4s.JObject].obj.size <= 3)
    }

    it("'JSON query language': version-routed executor setup") {
      val v0 = new QueryExecutor(g, QueryExecutor.defaultNamed(g),
        limitedCountThreshold = 1000L, version = (0, 0))
      val v1 = new QueryExecutor(g, QueryExecutor.defaultNamed(g), version = (1, 1))
      val routed = new GlobalQueryExecutor(Seq(v0, v1))
      assert(routed.get(1).execute("""[{"_name":"all_nation"},{"_name":"count"}]""")
        .collect().head.getLong(0) > 0)
      intercept[IllegalArgumentException](routed.get(7))
    }

    it("'Write path': mutations return the rewritten dataset") {
      import graft.services.Mutations
      val nations = g.V("nation").df
      val renamed = Mutations.updateWhere(nations,
        col("n_nationkey") === 0, Map("n_name" -> lit("RENAMED")),
        by = "migration-guide", at = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      assert(renamed.where(col("n_name") === "RENAMED").count() == 1)
      assert(nations.where(col("n_name") === "RENAMED").count() == 0)
    }
  }
}
