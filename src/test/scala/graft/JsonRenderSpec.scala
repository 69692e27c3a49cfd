package graft

import org.json4s._
import graft.query._

/**
 * Golden JSON rendering on the Modern fixture — byte-for-byte the
 * reference's QueryTest expectations (core-test/.../models/QueryTest.scala:
 * :38-61 sorted-people array, :63-89 field-agg on age, :91-104 field-agg on
 * lang), through the composed-JSON executor end to end.
 *
 * The reference compares play-json `JsObject`s (unordered); here the
 * rendered string is canonical — aggregation keys in the compiler's group
 * order (ascending key), row objects in renderer field order — so the
 * assertion is on exact bytes.
 */
class JsonRenderSpec extends SparkSpec {

  private lazy val g = ModernFixture.auditedGraph(spark)

  /** allPeople/allSoftware + the OutputPerson renderer, as the reference's
    * ModernQueryExecutor registers them (ModernQuery.scala:22-29,73-74). */
  private lazy val exec =
    new QueryExecutor(g, Map(
      "allPeople" -> ((_: JValue, g) => g.V("person")),
      "allSoftware" -> ((_: JValue, g) => g.V("software"))))
      .withRenderer("person") { row =>
        JObject(List(
          "createdBy" -> JString(row.getAs[String]("_createdBy")),
          "label" -> JString("Mister " + row.getAs[String]("name")),
          "name" -> JString(row.getAs[String]("name")),
          "age" -> JInt(BigInt(row.getAs[Int]("age")))))
      }

  private def run(q: String): String = JsonRenderer.compact(exec.executeJson(q))

  describe("golden Modern outputs") {
    it("sorted people render as the reference's OutputPerson array (QueryTest.scala:38-61)") {
      val out = run(
        """[{"_name":"allPeople"},
          |  {"_name":"sort","_fields":[{"age":"incr"}]}]""".stripMargin)
      assert(out ==
        """[{"createdBy":"admin","label":"Mister vadas","name":"vadas","age":27},""" +
        """{"createdBy":"admin","label":"Mister franck","name":"franck","age":28},""" +
        """{"createdBy":"admin","label":"Mister marko","name":"marko","age":29},""" +
        """{"createdBy":"admin","label":"Mister josh","name":"josh","age":32},""" +
        """{"createdBy":"admin","label":"Mister marc","name":"marc","age":34},""" +
        """{"createdBy":"admin","label":"Mister peter","name":"peter","age":35}]""")
    }

    it("field aggregation on age renders {key: {count: n}} (QueryTest.scala:63-89)") {
      val out = run(
        """[{"_name":"allPeople"},
          |  {"_name":"aggregation","_agg":"field","_field":"age",
          |   "_select":[{"_agg":"count"}]}]""".stripMargin)
      // same pairs as the reference golden, keys in canonical ascending order
      assert(out ==
        """{"27":{"count":1},"28":{"count":1},"29":{"count":1},""" +
        """"32":{"count":1},"34":{"count":1},"35":{"count":1}}""")
    }

    it("field aggregation on lang renders {java: {count: 2}} (QueryTest.scala:91-104)") {
      val out = run(
        """[{"_name":"allSoftware"},
          |  {"_name":"aggregation","_agg":"field","_field":"lang",
          |   "_select":[{"_agg":"count"}]}]""".stripMargin)
      assert(out == """{"java":{"count":2}}""")
    }
  }

  describe("edge and value rendering through the executor") {
    it("renders edges through a label-keyed edge renderer (knows with weight)") {
      val edgeExec = new QueryExecutor(g, Map(
        "allPeople" -> ((_: JValue, g) => g.V("person"))))
        .withContinuation("knowsE")((t, _) => t.outE("knows"))
        .withRenderer("knows") { row =>
          JObject(List(
            "to" -> JString(row.getAs[String]("_dst")),
            "weight" -> JDouble(row.getAs[Double]("weight"))))
        }
      val out = JsonRenderer.compact(edgeExec.executeJson(
        """[{"_name":"allPeople"},
          |  {"_name":"knowsE"},
          |  {"_name":"sort","_fields":[{"weight":"incr"}]}]""".stripMargin))
      assert(out == """[{"to":"vadas","weight":0.5},{"to":"josh","weight":1.0}]""")
    }

    it("renders a value traversal as bare JSON values, not row objects") {
      val valExec = new QueryExecutor(g, Map(
        "allPeople" -> ((_: JValue, g) => g.V("person"))))
        .withContinuation("names")((t, _) => t.value("name"))
      val out = JsonRenderer.compact(valExec.executeJson(
        """[{"_name":"allPeople"},
          |  {"_name":"names"},
          |  {"_name":"sort","_fields":[{"name":"incr"}]},
          |  {"_name":"page","from":0,"to":3}]""".stripMargin))
      assert(out == """["franck","josh","marc"]""")
    }
  }

  describe("bounded list rendering (round-8: executeJson must not collect unpaginated tables)") {
    it("a list render past limitedCountThreshold fails loudly instead of collecting") {
      // threshold 3 against the 6-person fixture = the over-cap case;
      // counting renderer invocations proves the render drew at most
      // cap rows off the iterator — no whole-table collect() happened
      val rendered = new java.util.concurrent.atomic.AtomicInteger(0)
      val small = new QueryExecutor(g, Map(
        "allPeople" -> ((_: JValue, g) => g.V("person"))),
        limitedCountThreshold = 3L)
        .withRenderer("person") { row =>
          rendered.incrementAndGet()
          JObject(List("name" -> JString(row.getAs[String]("name"))))
        }
      val e = intercept[IllegalArgumentException](
        small.executeJson("""[{"_name":"allPeople"}]"""))
      assert(e.getMessage.contains("page the query or use executeStream"))
      assert(rendered.get() <= 3, s"rendered ${rendered.get()} rows past the cap")
      // a paged query through the same executor still renders fine
      val ok = JsonRenderer.compact(small.executeJson(
        """[{"_name":"allPeople"},
          |  {"_name":"sort","_fields":[{"age":"incr"}]},
          |  {"_name":"page","from":0,"to":2}]""".stripMargin))
      assert(ok == """[{"name":"vadas"},{"name":"franck"}]""")
    }

    it("a value-traversal list render respects the same cap") {
      val small = new QueryExecutor(g, Map(
        "allPeople" -> ((_: JValue, g) => g.V("person"))),
        limitedCountThreshold = 3L)
        .withContinuation("names")((t, _) => t.value("name"))
      val e = intercept[IllegalArgumentException](
        small.executeJson("""[{"_name":"allPeople"},{"_name":"names"}]"""))
      assert(e.getMessage.contains("page the query or use executeStream"))
    }
  }

  describe("aggregation rendering shapes (reference Aggregation.scala:201-330)") {
    it("scalar aggregation over empty input renders JsNull") {
      val out = run(
        """[{"_name":"allPeople"},
          |  {"_name":"filter","_query":{"_gt":{"age":100}}},
          |  {"_name":"aggregation","_agg":"sum","_field":"age"}]""".stripMargin)
      assert(out == "null")
    }

    it("count over empty input renders 0, not JsNull") {
      val out = run(
        """[{"_name":"allPeople"},
          |  {"_name":"filter","_query":{"_gt":{"age":100}}},
          |  {"_name":"aggregation","_agg":"count"}]""".stripMargin)
      assert(out == """{"count":0}""")
    }

    it("field aggregation over empty input renders the empty object") {
      val out = run(
        """[{"_name":"allPeople"},
          |  {"_name":"filter","_query":{"_gt":{"age":100}}},
          |  {"_name":"aggregation","_agg":"field","_field":"age",
          |   "_select":[{"_agg":"count"}]}]""".stripMargin)
      assert(out == "{}")
    }

    it("scalar sum renders {name: value} with the default name") {
      val out = run(
        """[{"_name":"allPeople"},
          |  {"_name":"aggregation","_agg":"sum","_field":"age"}]""".stripMargin)
      assert(out == """{"sum_age":185}""")
    }

    it("sub-aggregations merge into one object per group; null sub-results are omitted") {
      val out = run(
        """[{"_name":"allSoftware"},
          |  {"_name":"aggregation","_agg":"field","_field":"lang",
          |   "_select":[{"_agg":"count","_name":"cnt"},
          |              {"_agg":"min","_field":"name","_name":"first_name"}]}]""".stripMargin)
      assert(out == """{"java":{"cnt":2,"first_name":"lop"}}""")
    }

    it("count terminal step renders its bare number") {
      val out = run("""[{"_name":"allPeople"},{"_name":"count"}]""")
      assert(out == "6")
    }
  }
}
