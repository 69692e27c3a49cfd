package graft

import org.apache.spark.sql.functions._

/** Branch operators on the Modern fixture: coalesceBranch first-non-empty
  * semantics, chooseBranch routing, match pattern binding + cycle close. */
class BranchSpec extends SparkSpec {

  private lazy val g = ModernFixture.graph(spark)

  describe("coalesceBranch") {
    it("emits all rows of the first non-empty branch, default when all empty") {
      val t = g.V("person").as("p")
        .coalesceBranch("v", Some(-1.0),
          _.outE("knows").where(col("weight") >= 1.0).value("weight"),
          _.outE("created").value("weight"))
      val rows = t.project("name" -> t.sel("p", "name"), "v" -> col("v"))
        .toDF.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sorted
      // marko knows josh at 1.0 → branch 0 wins (created 0.4 suppressed);
      // josh/peter have no knows>=1 → created weights; others → default
      assert(rows == Seq(
        "franck" -> -1.0, "josh" -> 0.4, "josh" -> 1.0, "marc" -> -1.0,
        "marko" -> 1.0, "peter" -> 0.2, "vadas" -> -1.0))
    }
  }

  describe("chooseBranch") {
    it("routes each element through its matching option or none") {
      val t = g.V("person")
        .chooseBranch(col("name"), "v",
          Seq("marko" -> (_.out("knows").value("name")),
              "josh" -> (_.out("created").value("name"))),
          none = Some(_.value("name")))
      val vs = t.toDF.collect().map(_.getString(0)).toSeq.sorted
      // marko → {vadas, josh}; josh → {lop, ripple}; rest → own names
      assert(vs == Seq("franck", "josh", "lop", "marc", "peter", "ripple", "vadas", "vadas"))
    }
    it("drops unmatched elements when no none branch is declared") {
      val t = g.V("person")
        .chooseBranch(col("name"), "v",
          Seq("marko" -> (_.out("knows").value("name"))))
      assert(t.toDF.collect().map(_.getString(0)).toSeq.sorted == Seq("josh", "vadas"))
    }
    it("routes null selectors to none; any receives every element") {
      // nullif makes vadas's selector null: a null selector and an
      // unmatched value both land in none (TinkerPop 3.5+ Pick.none)
      val t = g.V("person")
        .chooseBranch(nullif(col("name"), lit("vadas")), "v",
          Seq("marko" -> (_.constant("M"))),
          none = Some(_.constant("N")),
          any = Some(_.constant("A")))
      val byV = t.toDF.collect().map(_.getString(0)).toSeq.groupBy(identity).view.mapValues(_.size).toMap
      // 6 people: marko→M; vadas (null selector) + 4 unmatched → N; all 6 → A
      assert(byV == Map("M" -> 1, "N" -> 5, "A" -> 6))
    }
    it("an explicit option(null) claims null selectors before none") {
      val t = g.V("person")
        .chooseBranch(nullif(col("name"), lit("vadas")), "v",
          Seq("marko" -> (_.constant("M")), (null: Any) -> (_.constant("NULLOPT"))),
          none = Some(_.constant("N")))
      val byV = t.toDF.collect().map(_.getString(0)).toSeq.groupBy(identity).view.mapValues(_.size).toMap
      assert(byV == Map("M" -> 1, "NULLOPT" -> 1, "N" -> 4))
    }
  }

  describe("projectBy") {
    it("projects entity columns plus correlated sub-traversal aggregations") {
      import graft.traversal.ProjectBy
      val rows = g.V("person").projectBy(
        ProjectBy.Col("name", col("name")),
        ProjectBy.Sub("created_count", _.out("created"), "count"),
        ProjectBy.Sub("max_weight", _.outE("created").value("weight"), "max"))
        .toDF.collect().map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
      assert(rows("josh") == ((2L, Some(1.0))))
      assert(rows("vadas") == ((0L, None))) // empty sub-traversal: count 0, value null
    }
  }

  describe("sack") {
    it("carries an accumulator through hops and folds visited values") {
      val t = g.V("person", "marko").withSack(lit(0.0))
        .outE("knows").mapSack(_ + col("weight")).inV
        .outE("created").mapSack(_ + col("weight"))
        .sackValue("total")
      // marko -knows(0.5)-> vadas (no created); -knows(1.0)-> josh -created(1.0/0.4)->
      val totals = t.toDF.collect().map(_.getDouble(0)).sorted.toSeq
      assert(totals == Seq(1.4, 2.0))
    }
  }

  describe("aggregateGlobal") {
    it("stashes all values into a named collection visible to later steps") {
      val t = g.V("person").aggregateGlobal("ages", col("age"))
      val withAgg = t.where(col("age") === array_max(t.aggregated("ages")))
      assert(withAgg.toDF.collect().map(_.getAs[String]("name")).toSeq == Seq("peter"))
    }
  }

  describe("tryValue (opt-in permissive conversion)") {
    it("drops rows whose non-null value fails to convert, keeps nulls") {
      import spark.implicits._
      val df = Seq(("1", 1L), ("oops", 2L), (null, 3L), ("42", 4L)).toDF("v", "id")
      val g2 = ModernFixture.graph(spark)
      val t = graft.traversal.Traversal(g2, graft.traversal.Element.Mixed, df)
      val out = t.tryValue("v", "BIGINT").df.select("v").collect().map(r => Option(r.get(0))).toSeq
      assert(out.toSet == Set(Some(1L), Some(42L), None)) // "oops" row dropped, null kept
    }
  }

  describe("keysetPage") {
    it("returns the id-ordered page after a cursor") {
      val page = g.V("person").keysetPage("josh", 2)
        .toDF.collect().map(_.getAs[String]("name")).toSeq
      assert(page == Seq("marc", "marko"))
    }
  }

  describe("isEmptyId / nonEmptyId") {
    it("matches eq/neq empty string on an id field") {
      assert(g.V("person").isEmptyId("name").toDF.count() == 0)
      assert(g.V("person").nonEmptyId("name").toDF.count() == 6)
    }
  }

  describe("executeStream") {
    it("delivers a row iterator plus the limitedCount total") {
      import graft.query.QueryExecutor
      val ex = new QueryExecutor(g, QueryExecutor.defaultNamed(g), limitedCountThreshold = 4L)
      val out = ex.executeStream("""[{"_name":"all_person"}]""")
      assert(out.total == -4L) // 6 people saturate the threshold of 4
      assert(out.rows.size == 6)
      val small = ex.executeStream("""[{"_name":"all_software"}]""")
      assert(small.total == 2L)
    }
  }

  describe("matchPattern") {
    it("binds aliases along patterns and dedups bindings") {
      val t = g.V("person").matchPattern("p",
        ("p", _.out("created"), "sw"),
        ("sw", _.in("created"), "other"))
      val pairs = t.project(
        "p" -> t.sel("p", "name"), "other" -> t.sel("other", "name"))
        .toDF.collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      // co-creation pairs including self-pairs, deduped over bindings
      assert(pairs.contains("marko" -> "josh"))
      assert(pairs.contains("josh" -> "peter"))
      assert(pairs.count(_ == ("josh", "marko")) == 1) // josh→lop & josh→ripple→... dedup
    }
    it("cycle-closes on an existing binding") {
      val t = g.V("person").matchPattern("p",
        ("p", _.out("created"), "sw"),
        ("sw", _.in("created"), "other"),
        ("other", _.out("created"), "sw")) // other must have created sw (always true here)
      assert(t.toDF.count() > 0)
    }
  }
}
