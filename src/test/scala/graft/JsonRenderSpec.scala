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

  /** The reference's grammar is RECURSIVE: `_select` may nest `field`/`time`
    * aggregations (Aggregation.scala:151,167), each re-run per group
    * (:369-384), and a nested agg's `{innerKey: obj}` entries merge
    * DIRECTLY AS SIBLINGS of the scalar sub-agg names (:383-391
    * `acc ++ jsObject` — the nested `_name` never reaches the payload).
    * Fixture mirrors a TheHive case dashboard: tickets per status per
    * severity per month. `ts` is deliberately TIMESTAMP_NTZ
    * (LocalDateTime) to pin the NTZ nested-bucket render path. */
  describe("nested grouping aggregations (reference Aggregation.scala:151,369-384)") {
    import graft.traversal.{Graph, VertexTable}

    lazy val ticketExec: QueryExecutor = {
      import spark.implicits._
      def d(s: String) = java.time.LocalDateTime.parse(s + "T00:00:00")
      val tickets = Seq(
        ("t1", "open", "high", d("2020-01-05"), 10.0),
        ("t2", "open", "high", d("2020-01-20"), 5.0),
        ("t3", "open", "low", d("2020-02-01"), 1.0),
        ("t4", "open", "med", d("2020-01-07"), 2.0),
        ("t5", "closed", "low", d("2020-02-10"), 4.0),
        ("t6", "closed", "low", d("2020-01-02"), 8.0),
        ("t7", "closed", "high", d("2020-02-03"), 3.0)
      ).toDF("tid", "status", "severity", "ts", "cost")
      val tg = new Graph(spark, Map("ticket" -> VertexTable("ticket", tickets, "tid")), Map.empty)
      new QueryExecutor(tg, Map("allTickets" -> ((_: JValue, g) => g.V("ticket"))))
    }
    def runT(q: String): String = JsonRenderer.compact(ticketExec.executeJson(q))

    it("field-in-field honors the inner _order/_size within each outer group") {
      val out = runT(
        """[{"_name":"allTickets"},
          |  {"_name":"aggregation","_agg":"field","_field":"status",
          |   "_select":[{"_agg":"count","_name":"cnt"},
          |              {"_agg":"field","_field":"severity",
          |               "_order":["-c2"],"_size":2,
          |               "_select":[{"_agg":"count","_name":"c2"}]}]}]""".stripMargin)
      // closed: low(2) > high(1); open: high(2) > low(1)=med(1), size-2 keeps
      // low by the ascending-key tie-break — med is cut
      assert(out ==
        """{"closed":{"cnt":3,"low":{"c2":2},"high":{"c2":1}},""" +
        """"open":{"cnt":4,"high":{"c2":2},"low":{"c2":1}}}""")
    }

    it("time-in-field buckets each outer group's months as epoch-millis keys (NTZ column)") {
      val out = runT(
        """[{"_name":"allTickets"},
          |  {"_name":"aggregation","_agg":"field","_field":"status",
          |   "_select":[{"_agg":"time","_field":"ts","_interval":"1M",
          |               "_select":[{"_agg":"count","_name":"c"}]}]}]""".stripMargin)
      assert(out ==
        """{"closed":{"1577836800000":{"c":1},"1580515200000":{"c":2}},""" +
        """"open":{"1577836800000":{"c":3},"1580515200000":{"c":1}}}""")
    }

    it("three-level nesting (field-in-field-in-time) recurses") {
      val out = runT(
        """[{"_name":"allTickets"},
          |  {"_name":"aggregation","_agg":"field","_field":"status",
          |   "_select":[{"_agg":"field","_field":"severity",
          |               "_select":[{"_agg":"time","_field":"ts","_interval":"1M",
          |                           "_select":[{"_agg":"count","_name":"c"}]}]}]}]""".stripMargin)
      assert(out ==
        """{"closed":{"high":{"1580515200000":{"c":1}},"low":{"1577836800000":{"c":1},"1580515200000":{"c":1}}},""" +
        """"open":{"high":{"1577836800000":{"c":2}},"low":{"1580515200000":{"c":1}},"med":{"1577836800000":{"c":1}}}}""")
    }

    it("a nested _query pre-filter scopes only the nested agg; an emptied outer group merges nothing") {
      val out = runT(
        """[{"_name":"allTickets"},
          |  {"_name":"aggregation","_agg":"field","_field":"status",
          |   "_select":[{"_agg":"count","_name":"cnt"},
          |              {"_agg":"field","_field":"severity",
          |               "_query":{"_gt":{"cost":8}},
          |               "_select":[{"_agg":"sum","_field":"cost","_name":"sc"}]}]}]""".stripMargin)
      // only t1 (open/high/10.0) survives cost>8: outer counts keep ALL
      // rows; closed's nested slice is empty and merges nothing
      assert(out == """{"closed":{"cnt":3},"open":{"cnt":4,"high":{"sc":10.0}}}""")
    }
  }
}
