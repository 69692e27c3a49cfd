package graft

import org.json4s._
import graft.query.{GlobalQueryExecutor, QueryExecutor}
import graft.traversal.Graph

/**
 * Version-merged executor registry (reference: ScalligraphRouter.scala:
 * 38-49 `GlobalQueryExecutor.get(version)` + query/QueryExecutor.scala:
 * 162-170 `++`): a request at version v runs against the merge of every
 * executor whose window contains v — how the reference serves a v0 and a
 * v1 API side by side from independently registered modules.
 */
class QueryRegistrySpec extends SparkSpec {

  private lazy val g: Graph = ModernFixture.graph(spark)

  // a base module serving every version (scans), a v0-only module and a
  // v1-only module each contributing one named query and a renderer for
  // the same label — the v-module's renderer must win the merge
  private def base = new QueryExecutor(g, QueryExecutor.defaultNamed(g))
  private def v0 = new QueryExecutor(
    g, Map("seniors" -> ((_, gg) => gg.V("person").has("age", (c: org.apache.spark.sql.Column) => c >= 30))),
    version = (0, 0))
    .withRenderer("person")(r => JString("v0:" + r.getAs[String]("name")))
  private def v1 = new QueryExecutor(
    g, Map("youngsters" -> ((_, gg) => gg.V("person").has("age", (c: org.apache.spark.sql.Column) => c < 30))),
    version = (1, 1))
    .withRenderer("person")(r => JString("v1:" + r.getAs[String]("name")))

  private def global = new GlobalQueryExecutor(Seq(base, v0, v1))

  describe("GlobalQueryExecutor.get(version)") {
    it("routes a v0-only named query at version 0 and rejects it at version 1") {
      assert(global.get(0).execute("""[{"_name":"seniors"},{"_name":"count"}]""")
        .collect().head.getLong(0) == 3L)
      val e = intercept[IllegalArgumentException](
        global.get(1).execute("""[{"_name":"seniors"},{"_name":"count"}]"""))
      assert(e.getMessage.contains("seniors"))
    }

    it("routes a v1-only named query at version 1 and rejects it at version 0") {
      assert(global.get(1).execute("""[{"_name":"youngsters"},{"_name":"count"}]""")
        .collect().head.getLong(0) == 3L)
      intercept[IllegalArgumentException](
        global.get(0).execute("""[{"_name":"youngsters"},{"_name":"count"}]"""))
    }

    it("serves base-module queries at every version, including ones no module narrows") {
      Seq(0, 1, 7).foreach { v =>
        assert(global.get(v).execute("""[{"_name":"all_person"},{"_name":"count"}]""")
          .collect().head.getLong(0) == 6L)
      }
    }

    it("merges right-biased: the version module's renderer wins over the base's") {
      val JArray(rendered) = global.get(1).executeJson(
        """[{"_name":"youngsters"},{"_name":"sort","_fields":[{"name":"asc"}]}]"""): @unchecked
      assert(rendered == List(JString("v1:franck"), JString("v1:marko"), JString("v1:vadas")))
    }

    it("narrows the merged window to the intersection (reference ++ semantics)") {
      assert((base ++ v1).version == (1, 1))
      assert((v0 ++ v1).version._1 > (v0 ++ v1).version._2) // disjoint → empty window
    }

    it("fails on a version no executor serves") {
      val e = intercept[IllegalArgumentException](new GlobalQueryExecutor(Seq(v0, v1)).get(3))
      assert(e.getMessage.contains("version 3"))
    }

    it("get (no version) merges everything") {
      // both version-scoped named queries resolve on the unfiltered merge
      assert(global.get.execute("""[{"_name":"seniors"},{"_name":"count"}]""")
        .collect().head.getLong(0) == 3L)
      assert(global.get.execute("""[{"_name":"youngsters"},{"_name":"count"}]""")
        .collect().head.getLong(0) == 3L)
    }

    it("caches the merged executor per version") {
      val gq = global
      assert(gq.get(0) eq gq.get(0))
    }

    it("registration is immutable: a post-merge withRenderer never mutates a cached snapshot") {
      val baseExec = new QueryExecutor(g, Map(
        "allPeople" -> ((_, gg) => gg.V("person"))))
      val gq = new GlobalQueryExecutor(Seq(baseExec))
      val before = gq.get(1).executeJson(
        """[{"_name":"allPeople"},{"_name":"sort","_fields":[{"name":"incr"}]},{"_name":"page","from":0,"to":1}]""")
      // "register" a renderer afterwards — returns a NEW executor; the
      // cached merge must be unaffected (in-place mutation would make the
      // renderer appear at never-served versions but not at v1)
      val enriched = baseExec.withRenderer("person")(r => JString("late:" + r.getAs[String]("name")))
      val after = gq.get(1).executeJson(
        """[{"_name":"allPeople"},{"_name":"sort","_fields":[{"name":"incr"}]},{"_name":"page","from":0,"to":1}]""")
      assert(before == after) // snapshot stable
      // and the new executor carries the renderer without touching the old
      val fresh = new GlobalQueryExecutor(Seq(enriched)).get(1).executeJson(
        """[{"_name":"allPeople"},{"_name":"sort","_fields":[{"name":"incr"}]},{"_name":"page","from":0,"to":1}]""")
      assert(fresh == JArray(List(JString("late:franck"))))
    }

    it("merges public-property catalogs per label (reference publicProperties ++)") {
      import graft.query.{Properties, PublicProperty}
      import org.apache.spark.sql.functions._
      // the base module publishes a computed property; the v1 module adds
      // another — the merged executor must resolve BOTH through filters
      val baseP = new QueryExecutor(g, QueryExecutor.defaultNamed(g),
        Map("person" -> Properties(PublicProperty("ageDecade", (col("age") / 10).cast("int")))))
      val v1P = new QueryExecutor(g, Map.empty,
        Map("person" -> Properties(PublicProperty("nameLen", length(col("name"))))),
        version = (1, 1))
      val merged = new GlobalQueryExecutor(Seq(baseP, v1P)).get(1)
      assert(merged.execute(
        """[{"_name":"all_person"},{"_name":"filter","_query":{"_is":{"ageDecade":2}}},{"_name":"count"}]""")
        .collect().head.getLong(0) == 3L) // vadas 27, franck 28, marko 29
      assert(merged.execute(
        """[{"_name":"all_person"},{"_name":"filter","_query":{"_is":{"nameLen":5}}},{"_name":"count"}]""")
        .collect().head.getLong(0) == 3L) // marko, vadas, peter
    }
  }

  /** Registry hygiene at 170 queries across 16 contributing files: the
    * `registry.toMap` in SparkEntry would silently COLLAPSE a duplicate
    * name (last file wins, the shadowed query vanishes from the driver's
    * correctness gate looking green), and a query registered without an
    * oracle only fails at driver time (tools/check.py:50-57). Both must
    * fail HERE, in `sbt test`, before a round ships. */
  describe("SparkEntry registry hygiene") {
    it("query names are unique across all contributing files") {
      val names = SparkEntry.registry.map(_.name)
      val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.toSeq.sorted
      assert(dups.isEmpty, s"duplicate query names (one is being shadowed): $dups")
    }

    it("every registered query carries a DuckDB oracle") {
      // the driver records a weaker rows-only check for oracle-less
      // queries; this engine's contract is every entry oracle-checked —
      // a non-SQL-expressible operator still gets a string/JSON-shaped
      // oracle (the jNN render family is the pattern)
      val missing = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).sorted
      assert(missing.isEmpty, s"registered without an oracle: $missing")
    }

    it("the executable map serves exactly the registry key set") {
      assert(SparkEntry.queries.keySet == SparkEntry.registry.map(_.name).toSet)
      assert(SparkEntry.oracleSql.keySet == SparkEntry.registry.map(_.name).toSet)
    }
  }
}
