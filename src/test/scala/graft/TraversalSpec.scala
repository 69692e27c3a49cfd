package graft

import org.apache.spark.sql.functions._
import graft.traversal.{Element, Traversal}

/** Operator semantics on the Modern fixture — pinned to the reference's
  * behavior (duplicates preserved through hops, dedup explicit, null-
  * tolerant sort, limitedCount saturation). */
class TraversalSpec extends SparkSpec {

  private lazy val g = ModernFixture.graph(spark)

  private def names(t: Traversal): Seq[String] =
    t.toDF.collect().map(_.getAs[String]("name")).toSeq

  describe("hops over edge tables") {
    it("out() preserves multiplicity (one row per edge)") {
      val created = g.V("person").out("created")
      assert(names(created).sorted == Seq("lop", "lop", "lop", "ripple"))
      assert(names(created.dedup()).sorted == Seq("lop", "ripple"))
    }
    it("in() follows reverse direction") {
      assert(names(g.V("software", "lop").in("created")).sorted == Seq("josh", "marko", "peter"))
    }
    it("both() unions applicable directions") {
      // vadas has no outgoing knows; only the in-side contributes
      assert(names(g.V("person", "vadas").both("knows")) == Seq("marko"))
      // marko: out to vadas+josh, no incoming
      assert(names(g.V("person", "marko").both("knows")).sorted == Seq("josh", "vadas"))
    }
    it("outE/inV expose the edge element") {
      val e = g.V("person", "marko").outE("knows")
      assert(e.toDF.select("weight").collect().map(_.getDouble(0)).sorted.toSeq == Seq(0.5, 1.0))
      assert(names(e.inV).sorted == Seq("josh", "vadas"))
    }
    it("otherV returns the non-origin endpoint") {
      assert(names(g.V("software", "ripple").inE("created").otherV) == Seq("josh"))
    }
    it("E() scans the edge table") {
      assert(g.E("created").toDF.count() == 4)
    }
  }

  describe("alias correlation") {
    it("as/select + cross-alias predicate closes the pattern") {
      val t = g.V("person").as("a").out("knows")
      val olderFriends = t.where(t.sel("a", "age") < col("age"))
      assert(names(olderFriends) == Seq("josh")) // marko(29) knows josh(32); vadas(27) younger
    }
    it("select(label) recalls the aliased element") {
      val back = g.V("person").as("a").out("created").select("a")
      assert(back.toDF.columns.toSeq == Seq("name", "age"))
      assert(names(back).sorted == Seq("josh", "josh", "marko", "peter"))
    }
  }

  describe("semi/anti sub-traversal filters") {
    it("filter keeps elements with a non-empty sub-traversal") {
      assert(names(g.V("person").filter(_.out("created"))).sorted == Seq("josh", "marko", "peter"))
    }
    it("filterNot keeps elements with an empty sub-traversal") {
      assert(names(g.V("person").filterNot(_.out("created"))).sorted == Seq("franck", "marc", "vadas"))
    }
    it("or() combines sub-traversals") {
      val t = g.V("person").or(_.out("created"), _.has("age", 27))
      assert(names(t).sorted == Seq("josh", "marko", "peter", "vadas"))
    }
  }

  describe("branching") {
    it("optional keeps unmatched elements") {
      val t = g.V("person").optional(_.out("knows").values("age"))
      assert(t.toDF.count() == 7) // marko twice (two knows), 5 others once
    }
    it("unionFlat concatenates branch results per element") {
      val t = g.V("person", "marko").unionFlat(
        _.out("knows").project("n" -> col("name")),
        _.project("n" -> col("name")))
      assert(t.toDF.collect().map(_.getString(0)).sorted.toSeq == Seq("josh", "marko", "vadas"))
    }
  }

  describe("aggregation terminals") {
    it("limitedCount saturates to -threshold") {
      assert(g.V("person").limitedCount(3).collect().head.getLong(0) == -3L)
      assert(g.V("person").limitedCount(100).collect().head.getLong(0) == 6L)
    }
    it("groupCount") {
      val m = g.V("person").out("created").groupCount(col("name"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m == Map("lop" -> 3, "ripple" -> 1))
    }
    it("scalar aggregates") {
      assert(g.V("person").sum("age").collect().head.getLong(0) == 185L)
      assert(g.V("person").mean("age").collect().head.getDouble(0) === 185.0 / 6)
    }
    it("fold/unfold round-trip") {
      val folded = g.V("person").fold("age")
      val t = Traversal(g, Element.Value("folded"), folded).unfold("folded")
      assert(t.toDF.collect().map(_.getInt(0)).sorted.toSeq == Seq(27, 28, 29, 32, 34, 35))
    }
  }

  describe("paging and sorting") {
    it("range is offset+limit in sorted order") {
      val t = g.V("person").sort("age" -> true).range(2, 4).value("age")
      assert(t.toDF.collect().map(_.getInt(0)).toSeq == Seq(29, 32))
    }
    it("dedup by alias columns") {
      val t = g.V("person").as("p").out("created").dedup("p")
      assert(t.toDF.count() == 3) // josh's two creations collapse
    }
  }

  describe("label / hasLabel (reference TraversalOps.scala:548,580-581)") {
    it("label on a homogeneous traversal is a plan-time constant") {
      val t = g.V("person").label()
      assert(t.toDF.collect().forall(_.getString(0) == "person"))
      // no Spark filter/expression reads data: the plan is scan + project
      assert(!t.df.queryExecution.optimizedPlan.toString.contains("Filter"))
    }
    it("hasLabel folds to identity or the statically-empty frame on a typed traversal") {
      assert(g.V("person").hasLabel("person").toDF.count() == 6)
      val none = g.V("person").hasLabel("software")
      assert(none.toDF.count() == 0)
      // empty via limit(0): the optimizer collapses to LocalRelation —
      // no scan of the mismatched table survives
      assert(none.df.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    }
    it("hasLabel on a tagged union filters the discriminator and re-types") {
      val mixed = g.union(g.V("person"), g.V("software"))
      val sw = mixed.hasLabel("software")
      assert(sw.toDF.count() == 2)
      // re-typed: a typed step composes downstream
      assert(sw.has("lang", "java").toDF.count() == 2)
      assert(mixed.label().toDF.collect().map(_.getString(0)).count(_ == "person") == 6)
    }
    it("label on an untagged traversal fails loudly") {
      val e = intercept[IllegalArgumentException](g.V("person").value("name").label())
      assert(e.getMessage.contains("untagged"))
    }
    it("a nested union preserves the inner union's per-row labels") {
      val nested = g.union(g.union(g.V("person"), g.V("software")), g.V("person"))
      // inner-union rows keep their own labels — not null
      assert(nested.hasLabel("software").toDF.count() == 2)
      assert(nested.hasLabel("person").toDF.count() == 12)
      val labels = nested.label("l").toDF.collect().map(_.getString(0))
      assert(!labels.contains(null) && labels.count(_ == "person") == 12)
    }
    it("hasLabel's re-typed traversal renders the same entity shape as a direct scan") {
      val sw = g.union(g.V("person"), g.V("software")).hasLabel("software")
      // other branches' (all-null) columns and the discriminator are
      // pruned — same columns as g.V("software")
      assert(sw.df.columns.sorted.toSeq == g.V("software").df.columns.sorted.toSeq)
    }
  }
}
