package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.TestData
import graft.query.QueryExecutor
import CoreQueries.Q

/** A typed row for the q85 domainMap oracle. */
final case class RegionUp(rkey: Long, rname: String)

/**
 * Oracle coverage for the last spec-only operator families from
 * SURVEY.md §2: sack accumulators, aggregateGlobal/Local, keyset
 * pagination, isEmptyId/nonEmptyId, identity/barrier/sideEffect,
 * domainMap/graphMap, streamed/chunked result delivery, and the
 * enum↔string round-trip. Each was already scalatest-proven on the
 * modern-graph fixture; these entries pin the same semantics against
 * the DuckDB oracle on the TPC-H-shaped tables.
 */
object SideChannelQueries {

  private def G(s: org.apache.spark.sql.SparkSession, dir: String) = TestData.graph(s, dir)

  val all: Seq[Q] = Seq(
    Q("q80_sack_carry",
      // sack (reference: TraversalOps.scala:668-676): seed a per-traverser
      // accumulator, carry it across a hop (the alias-prefixed column rides
      // the equi-join), fold a visited value in, project it out. The seed
      // is the unique customer key so the output order is deterministic.
      (s, dir) => G(s, dir).V("customer")
        .withSack(col("c_custkey").cast("double"))
        .out("cust_nation")
        .mapSack(_ * 100d + col("n_nationkey"))
        .sackValue("sack")
        .sortBy(col("sack")).toDF,
      Some("""SELECT CAST(c_custkey AS DOUBLE) * 100 + n_nationkey AS sack
             |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
             |ORDER BY sack""".stripMargin)),

    Q("q81_aggregate_global",
      // aggregateGlobal (reference: TraversalOps.scala:653-654): stash all
      // current values into a named collection (broadcast cross join), then
      // filter later steps against it — here "customers at the global max
      // balance". aggregateLocal is the same relational shape (rows have no
      // per-traverser collection), so this row covers both.
      (s, dir) => {
        val t = G(s, dir).V("customer").aggregateGlobal("bals", col("c_acctbal"))
        t.where(col("c_acctbal") === array_max(t.aggregated("bals")))
          .project("key" -> col("c_custkey"), "name" -> col("c_name"))
          .sortBy(col("key")).toDF
      },
      Some("""SELECT c_custkey AS key, c_name AS name FROM customer
             |WHERE c_acctbal = (SELECT max(c_acctbal) FROM customer)
             |ORDER BY key""".stripMargin)),

    Q("q82_keyset_page",
      // keyset-paged incremental scan (reference: models/Database.scala:
      // 258-319): the id-ordered page strictly after a cursor — the
      // restartable-background-job pagination contract.
      (s, dir) => G(s, dir).V("customer").keysetPage(100L, 25)
        .project("key" -> col("c_custkey"), "name" -> col("c_name"), "bal" -> col("c_acctbal"))
        .sortBy(col("key")).toDF,
      Some("""SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal
             |FROM customer WHERE c_custkey > 100
             |ORDER BY key LIMIT 25""".stripMargin)),

    Q("q83_empty_id_filter",
      // isEmptyId / nonEmptyId (reference: TraversalOps.scala:562-563):
      // eq/neq "" on an id-typed string field, exercised on a derived id
      // column so both branches are non-trivial.
      (s, dir) => {
        val g = G(s, dir)
        val base = g.V("customer").project(
          "key" -> col("c_custkey"),
          "sid" -> when(col("c_custkey") % 7 === 0, lit(""))
            .otherwise(concat(lit("~"), col("c_custkey"))))
        val e = base.isEmptyId("sid").project("key" -> col("key"), "kind" -> lit("empty"))
        val n = base.nonEmptyId("sid").project("key" -> col("key"), "kind" -> lit("nonempty"))
        g.union(e, n).sortBy(col("key"), col("kind")).toDF
      },
      Some("""WITH base AS (SELECT c_custkey AS key,
             |  CASE WHEN c_custkey % 7 = 0 THEN '' ELSE '~' || CAST(c_custkey AS VARCHAR) END AS sid
             |  FROM customer)
             |SELECT key, 'empty' AS kind FROM base WHERE sid = ''
             |UNION ALL SELECT key, 'nonempty' AS kind FROM base WHERE sid <> ''
             |ORDER BY key, kind""".stripMargin)),

    Q("q84_identity_barrier",
      // identity (no-op unit step), sideEffect (eager peek — here a count
      // the result does not depend on) and barrier (materialization via
      // localCheckpoint) composed; the pipeline's OUTPUT is the plain scan,
      // which is exactly the operators' contract.
      (s, dir) => {
        var peeked = -1L
        val t = G(s, dir).V("nation").identity
          .sideEffect(d => peeked = d.count())
          .barrier()
        // the sideEffect runs eagerly at construction — pin it so the
        // peek can't silently become dead code under a refactor
        require(peeked > 0, s"sideEffect peek did not run (peeked=$peeked)")
        t.sortBy(col("n_nationkey")).toDF
      },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    Q("q85_domain_map",
      // domainMap/graphMap (reference: traversal/Traversal.scala:29-32):
      // typed row→case-class mapping that leaves the declarative plan. The
      // two collapse here (rows ARE the storage representation) — one row
      // covers both.
      (s, dir) => {
        import s.implicits._
        G(s, dir).V("region")
          .domainMap(r => RegionUp(
            r.getAs[Number]("r_regionkey").longValue,
            r.getAs[String]("r_name").toUpperCase(java.util.Locale.ROOT)))
          .toDF.orderBy("rkey")
      },
      Some("""SELECT CAST(r_regionkey AS BIGINT) AS rkey, upper(r_name) AS rname
             |FROM region ORDER BY rkey""".stripMargin)),

    Q("q86_stream_iterator",
      // streamed/chunked result delivery (reference: QueryExecutor.scala:
      // 39-45, IteratorOutput.scala:7-15): drain a registered query through
      // the driver-side row iterator and surface the X-Total limitedCount.
      // The driver-side materialization IS the operator (result delivery to
      // a client), not a distributed step — the plan behind it ran on
      // executors and was checkpointed once.
      (s, dir) => {
        val g = G(s, dir)
        // threshold pinned ABOVE any SF's nation count: the oracle emits
        // the true total, which is only valid while the limitedCount
        // doesn't saturate (saturation emits -threshold)
        val ex = new QueryExecutor(g, QueryExecutor.defaultNamed(g), limitedCountThreshold = 1000000L)
        val out = ex.executeStream("""[{"_name":"all_nation"}]""")
        val schema = g.V("nation").toDF.schema
        import scala.jdk.CollectionConverters._
        s.createDataFrame(out.rows.toSeq.asJava, schema)
          .withColumn("total", lit(out.total))
          .orderBy("n_nationkey")
      },
      Some("""SELECT *, CAST((SELECT count(*) FROM nation) AS BIGINT) AS total
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    Q("q87_enum_roundtrip",
      // enum ↔ string (reference: Mapping.scala enum codecs): project the
      // status enum to its ordinal and decode it back — both directions in
      // one row, on native string columns.
      (s, dir) => {
        val ord = when(col("o_orderstatus") === "F", 0)
          .when(col("o_orderstatus") === "O", 1).otherwise(2)
        G(s, dir).V("orders").project(
          "key" -> col("o_orderkey"),
          "ord" -> ord.cast("int"),
          "back" -> element_at(array(lit("F"), lit("O"), lit("P")), ord.cast("int") + 1))
          .sortBy(col("key")).toDF
      },
      Some("""SELECT o_orderkey AS key,
             |  CAST(CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END AS INTEGER) AS ord,
             |  CASE o_orderstatus WHEN 'F' THEN 'F' WHEN 'O' THEN 'O' ELSE 'P' END AS back
             |FROM orders ORDER BY key""".stripMargin)),
  )
}
