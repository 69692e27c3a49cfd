package graft

import org.apache.spark.sql.types._
import org.json4s.jackson.JsonMethods
import graft.query._

/** Traversal-based public-property semantics on the Modern fixture
  * (reference: PublicProperty.scala:80-105 — filter on a computed property
  * is EXISTS over the sub-traversal's values). */
class TraversalPropsSpec extends SparkSpec {

  private lazy val g = ModernFixture.graph(spark)

  // person property "created_lang": languages of the software they created
  // (multi-valued for nobody here, but absent for vadas/marc/franck);
  // "created_weight": weights of their created edges (multi-valued for josh)
  private lazy val props = Properties(
    PublicProperty.fromTraversal("created_lang", StringType)(_.out("created").value("lang")),
    PublicProperty.fromTraversal("created_weight", DoubleType)(_.outE("created").value("weight"))
  ) ++ Properties.passthrough

  private def filtered(json: String): Seq[String] = {
    val t = TraversalProps.applyFilter(g.V("person"), JsonMethods.parse(json), props)
    t.toDF.collect().map(_.getAs[String]("name")).toSeq.sorted
  }

  describe("traversal-property filters") {
    it("EXISTS: any sub-traversal value matching keeps the element") {
      assert(filtered("""{"_is":{"created_lang":"java"}}""") == Seq("josh", "marko", "peter"))
      // josh created both ripple(1.0) and lop(0.4): EXISTS weight >= 1 keeps him
      assert(filtered("""{"_gte":{"created_weight":1}}""") == Seq("josh"))
    }
    it("NOT EXISTS via _not; _contains is existence") {
      assert(filtered("""{"_not":{"_contains":"created_lang"}}""") == Seq("franck", "marc", "vadas"))
    }
    it("flags compose with plain predicates under _and/_or") {
      assert(filtered(
        """{"_or":[{"_gte":{"created_weight":1}},{"_is":{"name":"vadas"}}]}""") == Seq("josh", "vadas"))
      assert(filtered(
        """{"_and":[{"_contains":"created_lang"},{"_lt":{"age":30}}]}""") == Seq("marko"))
    }
    it("filter output drops the internal flag columns") {
      val t = TraversalProps.applyFilter(
        g.V("person"), JsonMethods.parse("""{"_contains":"created_lang"}"""), props)
      assert(!t.df.columns.exists(_.startsWith("__tpflag")))
    }
  }

  describe("aggregation _query pre-filters") {
    // josh's created weights are [1.0, 0.4]: EXISTS(weight >= 1) keeps him,
    // min-resolution (0.4 >= 1) would drop him — this pins the EXISTS route
    it("compile as EXISTS, not min-resolution, for multi-valued links") {
      val exec = new QueryExecutor(g, QueryExecutor.defaultNamed(g), Map("person" -> props))
      val df = exec.execute(
        """[{"_name":"all_person"},
          |  {"_name":"aggregation","_agg":"count",
          |   "_query":{"_gte":{"created_weight":1}}}]""".stripMargin)
      assert(df.collect().head.getLong(0) == 1L)
    }
    it("compose EXISTS leaves with plain predicates inside _query") {
      val exec = new QueryExecutor(g, QueryExecutor.defaultNamed(g), Map("person" -> props))
      val df = exec.execute(
        """[{"_name":"all_person"},
          |  {"_name":"aggregation","_agg":"field","_field":"age",
          |   "_query":{"_or":[{"_gte":{"created_weight":1}},{"_is":{"name":"vadas"}}]},
          |   "_select":[{"_agg":"count","_name":"cnt"}]}]""".stripMargin)
      val byAge = df.collect().map(r => r.getAs[Number]("age").intValue -> r.getAs[Long]("cnt")).toMap
      assert(byAge == Map(27 -> 1L, 32 -> 1L)) // vadas(27), josh(32)
    }
  }

  describe("traversal-property value resolution (sort/agg)") {
    it("joins min(value) per element, null when absent") {
      val t = TraversalProps.resolveValueColumns(g.V("person"), props, Seq("created_weight"))
      val m = t.df.collect().map(r => r.getAs[String]("name") -> Option(r.getAs[Any]("created_weight"))).toMap
      assert(m("josh").contains(0.4)) // min of (1.0, 0.4)
      assert(m("peter").contains(0.2))
      assert(m("vadas").isEmpty)
    }
  }
}
