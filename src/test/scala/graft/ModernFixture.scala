package graft

import org.apache.spark.sql.SparkSession
import graft.traversal.{EdgeTable, Graph, VertexTable}

/**
 * The reference's canonical test fixture — TinkerPop's "Modern" graph as
 * extended by the reference's test suite (core-test/.../Modern.scala:13-100):
 * people + software vertices, `knows` and `created` weighted edges. Stored
 * here as real edge tables so specs exercise the [[EdgeTable]] hop path
 * (two joins) — the TPC-H testdata covers the [[graft.traversal.FkEdge]]
 * path (one join).
 */
object ModernFixture {

  final case class Person(name: String, age: Int)
  final case class Software(name: String, lang: String)

  def graph(spark: SparkSession): Graph = {
    import spark.implicits._
    val person = Seq(
      Person("marko", 29), Person("vadas", 27), Person("josh", 32),
      Person("peter", 35), Person("marc", 34), Person("franck", 28)).toDF
    val software = Seq(Software("lop", "java"), Software("ripple", "java")).toDF
    val knows = Seq(
      ("marko", "vadas", 0.5), ("marko", "josh", 1.0)).toDF("_src", "_dst", "weight")
    val created = Seq(
      ("marko", "lop", 0.4), ("josh", "ripple", 1.0),
      ("josh", "lop", 0.4), ("peter", "lop", 0.2)).toDF("_src", "_dst", "weight")
    new Graph(
      spark,
      Map(
        "person" -> VertexTable("person", person, "name"),
        "software" -> VertexTable("software", software, "name")),
      Map(
        "knows" -> EdgeTable("knows", "person", "person", knows),
        "created" -> EdgeTable("created", "person", "software", created)))
  }

  /** The same graph written through the audit path (reference: the Modern
    * fixture is built via `Database.createVertex`, which stamps the audit
    * envelope with the system user — core-test/.../Modern.scala:85-100,
    * models/Model.scala:25-32) so golden outputs that project `_createdBy`
    * (QueryTest.scala:38-61) have their column. */
  def auditedGraph(spark: SparkSession): Graph = {
    val at = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val g = graph(spark)
    def audited(label: String, t: VertexTable): VertexTable =
      t.copy(df = graft.services.Mutations.withAudit(t.df, label, "admin", at))
    new Graph(
      spark,
      g.vertices.map { case (l, t) => l -> audited(l, t) },
      g.edges)
  }
}
