package graft.traversal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Graph catalog: one DataFrame per vertex label, one per edge label
 * (reference: traversal/Graph.scala:25-42 — `graph.V[D]`, `graph.E[D]`,
 * `graph.union`).
 *
 * Scale design: a label scan here is a parquet scan of exactly that
 * label's dataset — the reference's `has("_label", ...)` start filter
 * (janus/JanusDatabase.scala:487-503) becomes dataset selection, i.e.
 * partition pruning by construction. Edges come in two physical shapes:
 *
 *  - [[EdgeTable]] — a real edge dataset `(_src, _dst, props…)`; a hop is
 *    two equi-joins (vertex→edge→vertex), each broadcast-able when small.
 *  - [[FkEdge]] — an edge *derived from a foreign-key column* of the source
 *    vertex table. A hop over it is ONE equi-join (src.fk == dst.id) with
 *    no intermediate edge materialization — at 100 TB this halves the
 *    shuffles for every FK-shaped relationship, which is all of the
 *    TPC-H-style testdata.
 */
sealed trait EdgeRel {
  def label: String
  def srcLabel: String
  def dstLabel: String
}

/** Edge stored as its own table with `_src`/`_dst` columns (+ properties). */
final case class EdgeTable(label: String, srcLabel: String, dstLabel: String, df: DataFrame)
    extends EdgeRel

/** Edge implied by a foreign key: `src.srcKey` references `dst.dstKey`. */
final case class FkEdge(label: String, srcLabel: String, dstLabel: String, srcKey: String, dstKey: String)
    extends EdgeRel

final case class VertexTable(label: String, df: DataFrame, idCol: String)

final class Graph(
    val spark: SparkSession,
    val vertices: Map[String, VertexTable],
    val edges: Map[String, EdgeRel]) {

  def vertex(label: String): VertexTable =
    vertices.getOrElse(label, throw new NoSuchElementException(s"no vertex label '$label'"))
  def edge(label: String): EdgeRel =
    edges.getOrElse(label, throw new NoSuchElementException(s"no edge label '$label'"))

  /** Scan vertices of a label (reference: graph.V[D], Graph.scala:25-28).
    * Optional id lookup stays a pushed-down `isin` filter on the scan. */
  def V(label: String, ids: Any*): Traversal = {
    val vt = vertex(label)
    val df = if (ids.isEmpty) vt.df else vt.df.where(col(vt.idCol).isin(ids: _*))
    Traversal(this, Element.Vertex(label, vt.idCol), df)
  }

  /** Scan edges of a label (reference: graph.E[D], Graph.scala:29-32).
    * FK edges materialize as `(_src, _dst)` projections of the source
    * vertex table — still a single column-pruned scan. */
  def E(label: String): Traversal = {
    val df = edgeDf(label)
    Traversal(this, Element.Edge(label, None), df)
  }

  private[traversal] def edgeDf(label: String): DataFrame = edge(label) match {
    case EdgeTable(_, _, _, df) => df
    case FkEdge(_, srcLabel, _, srcKey, _) =>
      val src = vertex(srcLabel)
      src.df.select(col(src.idCol).as("_src"), col(srcKey).as("_dst"))
  }

  /** The destination-vertex column an edge endpoint column references:
    * `_src` always holds the source vertex's idCol value; `_dst` holds the
    * dst idCol for [[EdgeTable]] but the declared `dstKey` for [[FkEdge]]
    * (which may differ from the dst idCol, e.g. a FK onto a non-key
    * column). Every edge→vertex join must go through this resolution. */
  private[traversal] def endpointRef(label: String, dstSide: Boolean): String = edge(label) match {
    case e: EdgeTable => if (dstSide) vertex(e.dstLabel).idCol else vertex(e.srcLabel).idCol
    case e: FkEdge => if (dstSide) e.dstKey else vertex(e.srcLabel).idCol
  }

  /** Global union of traversals (reference: Graph.scala:34-42). Schema is
    * unioned by name; labels diverge → untyped elements, each branch
    * tagged with its label in [[Traversal.LabelCol]] so `label`/`hasLabel`
    * stay answerable downstream (the relational analog of every graph
    * element carrying its label — a constant per branch, zero data cost). */
  def union(ts: Traversal*): Traversal = {
    require(ts.nonEmpty, "union of zero traversals")
    val homogeneous = ts.map(_.element).distinct.size == 1
    val dfs =
      if (homogeneous) ts.map(_.df)
      else ts.map { t =>
        val l = t.element match {
          case Element.Vertex(l0, _) => org.apache.spark.sql.functions.lit(l0)
          case Element.Edge(l0, _, _) => org.apache.spark.sql.functions.lit(l0)
          // a branch that is ITSELF a tagged union keeps its per-row
          // labels — overwriting with null would silently mislabel every
          // nested-union row; genuinely untagged branches (value
          // traversals) tag null, which hasLabel never matches
          case _ if t.df.columns.contains(Traversal.LabelCol) =>
            org.apache.spark.sql.functions.col(Traversal.LabelCol)
          case _ => org.apache.spark.sql.functions.lit(null).cast("string")
        }
        t.df.withColumn(Traversal.LabelCol, l)
      }
    val df = dfs.reduce(_.unionByName(_, allowMissingColumns = true))
    Traversal(this, if (homogeneous) ts.head.element else Element.Mixed, df)
  }

  /** Empty traversal (reference: Graph.scala:33). */
  def empty(label: String): Traversal = {
    val vt = vertex(label)
    Traversal(this, Element.Vertex(label, vt.idCol), vt.df.limit(0))
  }
}

/** What the traverser currently points at — the Spark analog of the
  * reference's runtime from-type check between composed query steps
  * (query/Query.scala:18-34). */
sealed trait Element
object Element {
  final case class Vertex(label: String, idCol: String) extends Element
  /** `otherLabel`/`otherRef` record which vertex label `otherV` resolves to
    * (and which vertex-table column the stored other-endpoint value
    * references) when the edge was reached directionally via outE/inE. */
  final case class Edge(label: String, otherLabel: Option[String] = None, otherRef: Option[String] = None)
      extends Element
  /** A projected scalar/struct value column named `col`. */
  final case class Value(col: String) extends Element
  /** Heterogeneous (post-union across labels). */
  case object Mixed extends Element
}
