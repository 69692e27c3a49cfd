package graft.analytics

import org.apache.spark.graphx.{Edge, Graph => XGraph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Whole-graph analytics over graph exports — the capability layer beyond
 * the reference's bounded-hop traversal surface (SURVEY §1.4, BASELINE
 * north star: "GraphX for analytics over graph exports").
 *
 * Input is the same relational shape the traversal layer uses: a vertex
 * DataFrame with a long `vid` and an edge DataFrame with (`src`, `dst`).
 * GraphX is the right tool exactly where Catalyst is not: fixed-point
 * iteration (components, PageRank) that would otherwise be an unbounded
 * chain of self-joins.
 *
 * Scale notes: GraphX partitions edges (EdgePartition2D keeps the
 * replication factor ~sqrt(parts)); both ops below are O(iterations ×
 * edges) message passing with no driver-side state.
 */
object GraphAnalytics {

  private def toEdgeRDD(edges: DataFrame): RDD[Edge[Double]] =
    edges.select(col("src").cast("long"), col("dst").cast("long")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1.0))

  /** Connected components: returns (vid, component) where component is the
    * smallest vertex id in the component (GraphX's convention). */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val g = XGraph.fromEdges(toEdgeRDD(edges), 0.0)
    g.connectedComponents().vertices
      .map { case (vid: VertexId, comp: VertexId) => (vid, comp) }
      .toDF("vid", "component")
  }

  /** PageRank with fixed iteration count (deterministic across runs). */
  def pageRank(spark: SparkSession, edges: DataFrame, iters: Int): DataFrame = {
    import spark.implicits._
    val g = XGraph.fromEdges(toEdgeRDD(edges), 0.0)
    g.staticPageRank(iters).vertices
      .map { case (vid: VertexId, rank: Double) => (vid, rank) }
      .toDF("vid", "rank")
  }
}
