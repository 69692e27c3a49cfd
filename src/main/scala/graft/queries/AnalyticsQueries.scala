package graft.queries

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics
import graft.services.Mutations
import graft.sources.TestData
import CoreQueries.Q

/**
 * Whole-graph analytics (GraphX) and write-path/maintenance compound jobs
 * (reference: services/IntegrityCheckOps.scala — dedup resolve/copyEdge).
 *
 * Vertex id scheme for the exported region–nation–customer graph:
 * region = r_regionkey, nation = 100 + n_nationkey,
 * customer = 1000 + c_custkey — disjoint ranges, so the component of every
 * customer is exactly its region's id (the smallest id in the component),
 * which gives connected components an exact relational oracle.
 */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(
    Q("g01_connected_components",
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val nr = g.V("nation").df
          .select((col("n_nationkey") + 100).as("src"), col("n_regionkey").cast("long").as("dst"))
        val cn = g.V("customer").df
          .select((col("c_custkey") + 1000).as("src"), (col("c_nationkey") + 100).as("dst"))
        GraphAnalytics.connectedComponents(s, nr.unionByName(cn))
          .orderBy("vid")
      },
      Some("""SELECT vid, component FROM (
             |  SELECT CAST(r_regionkey AS BIGINT) AS vid, CAST(r_regionkey AS BIGINT) AS component FROM region
             |  UNION ALL
             |  SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation
             |  UNION ALL
             |  SELECT CAST(1000 + c_custkey AS BIGINT), CAST(n_regionkey AS BIGINT)
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |ORDER BY vid""".stripMargin)),

    Q("g02_pagerank",
      // 5 fixed iterations over supplier→nation, decimal-exact ranks: the
      // DuckDB oracle unrolls the same iteration (all contributors have
      // out-degree 1, so no decimal-division rounding is involved and the
      // two engines agree bit-for-bit)
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val edges = g.V("supplier").df
          .select((col("s_suppkey") + 100).as("src"), col("s_nationkey").cast("long").as("dst"))
        GraphAnalytics.pageRankDecimal(s, edges, iters = 5).orderBy("vid")
      },
      Some {
        val step = (k: Int) =>
          s"""r$k AS (
             |  SELECT v.vid, CAST(CAST(0.15 AS DECIMAL(28,10)) +
             |    CAST(CAST(0.85 AS DECIMAL(3,2)) * COALESCE(s.insum, CAST(0 AS DECIMAL(28,10))) AS DECIMAL(28,10))
             |    AS DECIMAL(28,10)) AS rank
             |  FROM verts v LEFT JOIN (
             |    SELECT e.dst AS vid, SUM(CAST(r.rank / d.odeg AS DECIMAL(28,10))) AS insum
             |    FROM edges e JOIN r${k - 1} r ON r.vid = e.src JOIN odeg d ON d.src = e.src
             |    GROUP BY 1) s ON s.vid = v.vid)""".stripMargin
        s"""WITH edges AS (SELECT CAST(s_suppkey + 100 AS BIGINT) AS src, CAST(s_nationkey AS BIGINT) AS dst FROM supplier),
           |verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges UNION ALL SELECT dst FROM edges)),
           |odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY 1),
           |r0 AS (SELECT vid, CAST(1 AS DECIMAL(28,10)) AS rank FROM verts),
           |${(1 to 5).map(step).mkString(",\n")}
           |SELECT vid, CAST(rank AS DOUBLE) AS rank FROM r5 ORDER BY vid""".stripMargin
      }),

    Q("g06_label_propagation",
      // community detection: 4 deterministic synchronous LPA rounds over
      // the undirected customer–nation–region graph (most-frequent
      // neighbor label, min-label tie-break); customers converge to their
      // region's community. The oracle unrolls the identical iteration.
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val nr = g.V("nation").df
          .select((col("n_nationkey") + 100).as("src"), col("n_regionkey").cast("long").as("dst"))
        val cn = g.V("customer").df
          .select((col("c_custkey") + 1000).as("src"), (col("c_nationkey") + 100).as("dst"))
        GraphAnalytics.labelPropagation(s, nr.unionByName(cn), iters = 4)
          .orderBy("vid")
      },
      Some {
        val step = (k: Int) =>
          s"""l$k AS (SELECT vid, label FROM (
             |  SELECT e.dst AS vid, l.label, count(*) AS cnt,
             |    row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, l.label) AS rn
             |  FROM edges e JOIN l${k - 1} l ON l.vid = e.src GROUP BY e.dst, l.label) t WHERE rn = 1)""".stripMargin
        s"""WITH edges0 AS (
           |  SELECT CAST(100 + n_nationkey AS BIGINT) AS src, CAST(n_regionkey AS BIGINT) AS dst FROM nation
           |  UNION ALL
           |  SELECT CAST(1000 + c_custkey AS BIGINT), CAST(100 + c_nationkey AS BIGINT) FROM customer),
           |edges AS (SELECT src, dst FROM edges0 UNION ALL SELECT dst, src FROM edges0),
           |l0 AS (SELECT DISTINCT src AS vid, src AS label FROM edges),
           |${(1 to 4).map(step).mkString(",\n")}
           |SELECT vid, label FROM l4 ORDER BY vid""".stripMargin
      }),

    Q("g04_triangle_count",
      // per-nation triangle count over the co-region graph (nations
      // connected when they share a region) — a K5 per region, so each
      // nation sits in C(4,2)=6 triangles; the oracle counts connected
      // neighbor pairs relationally
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val n = g.V("nation").df
        val edges = n.alias("a").join(n.alias("b"),
          col("a.n_regionkey") === col("b.n_regionkey") &&
            col("a.n_nationkey") < col("b.n_nationkey"))
          .select(col("a.n_nationkey").cast("long").as("src"), col("b.n_nationkey").cast("long").as("dst"))
        GraphAnalytics.triangleCount(s, edges).orderBy("vid")
      },
      Some("""WITH e AS (
             |  SELECT CAST(a.n_nationkey AS BIGINT) AS src, CAST(b.n_nationkey AS BIGINT) AS dst
             |  FROM nation a JOIN nation b
             |    ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey),
             |nbr AS (SELECT src AS v, dst AS n FROM e UNION ALL SELECT dst, src FROM e),
             |tri AS (
             |  SELECT n1.v AS vid, count(*) AS t
             |  FROM nbr n1 JOIN nbr n2 ON n1.v = n2.v AND n1.n < n2.n
             |  JOIN e ON e.src = n1.n AND e.dst = n2.n
             |  GROUP BY 1)
             |SELECT v.vid AS vid, CAST(coalesce(t.t, 0) AS BIGINT) AS triangles
             |FROM (SELECT DISTINCT src AS vid FROM e UNION SELECT dst FROM e) v
             |LEFT JOIN tri t ON t.vid = v.vid
             |ORDER BY v.vid""".stripMargin)),

    Q("g05_shortest_paths",
      // BFS distance to the nearest region landmark over the
      // region–nation–customer tree: regions 0, nations 1, customers 2
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val nr = g.V("nation").df
          .select((col("n_nationkey") + 100).as("src"), col("n_regionkey").cast("long").as("dst"))
        val cn = g.V("customer").df
          .select((col("c_custkey") + 1000).as("src"), (col("c_nationkey") + 100).as("dst"))
        GraphAnalytics.nearestLandmark(s, nr.unionByName(cn), (0L until 5L)).orderBy("vid")
      },
      Some("""SELECT vid, dist FROM (
             |  SELECT CAST(r_regionkey AS BIGINT) AS vid, CAST(0 AS BIGINT) AS dist FROM region
             |  UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), 1 FROM nation
             |  UNION ALL SELECT CAST(1000 + c_custkey AS BIGINT), 2 FROM customer)
             |ORDER BY vid""".stripMargin)),

    Q("g03_merge_duplicates_repoint",
      (s, dir) => {
        val g = TestData.graph(s, dir)
        // treat customers sharing (nation, segment) as "duplicates", keep
        // the lowest custkey, re-point orders at the keeper — the
        // reference's DedupCheck.resolve + copyEdge as one batch rewrite
        val (keepers, mapping) = Mutations.mergeDuplicates(
          g.V("customer").df, "c_custkey",
          Seq("c_nationkey", "c_mktsegment"), "c_custkey")
        val repointed = Mutations.repointEdges(
          g.V("orders").df, "o_custkey", mapping)
        repointed.select("o_orderkey", "o_custkey").orderBy("o_orderkey")
          .join(keepers.select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_semi")
          .orderBy("o_orderkey")
      },
      Some("""WITH keeper AS (
             |  SELECT c_custkey, min(c_custkey) OVER (PARTITION BY c_nationkey, c_mktsegment) AS keeper_id
             |  FROM customer)
             |SELECT o_orderkey, k.keeper_id AS o_custkey
             |FROM orders o JOIN keeper k ON o.o_custkey = k.c_custkey
             |ORDER BY o_orderkey""".stripMargin))
  )
}
