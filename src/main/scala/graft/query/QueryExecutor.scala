package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import graft.traversal.{Element, Graph, Traversal}

/**
 * Composed JSON query execution — the rebuild of the reference's
 * `QueryExecutor` (reference: query/QueryExecutor.scala:115-170,
 * query/Query.scala:42-49): a query is a JSON array of named steps folded
 * left-to-right, the first resolved against the graph, each next against
 * the output of the previous, with a type check between steps.
 *
 * The reference type-checks with runtime scala-reflection `ru.Type`s
 * (Query.scala:18-34); here the "from type" is the [[QVal]] ADT — a
 * traversal (with its element tag) or a terminal result DataFrame — so
 * composition errors surface with the same step-name/type discipline but
 * no reflection.
 *
 * Built-in steps appended to every executor, as in the reference
 * (QueryExecutor.scala:25): `filter`, `sort`, `aggregation`, `count`,
 * `limitedCount`, plus `page` (the richPage/range pagination,
 * TraversalOps.scala:165-171).
 */
sealed trait QVal
object QVal {
  final case class Trav(t: Traversal) extends QVal
  final case class Result(df: DataFrame) extends QVal
  /** A terminal aggregation result, carrying the parsed [[Agg]] tree so
    * [[QueryExecutor.executeJson]] can render the reference's golden
    * `{key: {subAggName: value}}` shape. */
  final case class AggResult(df: DataFrame, agg: Agg) extends QVal
}

final class QueryExecutor(
    private val graph: Graph,
    /** App-registered named queries (reference: Query.init/withParam,
      * Query.scala:52-122), e.g. "allCustomers" → label scan. */
    private val namedQueries: Map[String, (JValue, Graph) => Traversal],
    /** Public-property catalog per vertex/edge label (reference:
      * PublicProperty lookup per type, query/PublicProperty.scala:143-158). */
    private val propsByLabel: Map[String, Properties] = Map.empty,
    private val limitedCountThreshold: Long = 1000L,
    /** Inclusive API version window this executor serves (reference:
      * QueryExecutor.scala:18 `version: (Int, Int)`; TheHive runs v0 and
      * v1 executors side by side through the version-filtered merge). */
    val version: (Int, Int) = (0, Int.MaxValue)) {

  /** reference: QueryExecutor.scala:33. */
  def versionCheck(v: Int): Boolean = version._1 <= v && v <= version._2

  /** Merge two executors serving an overlapping version window
    * (reference: QueryExecutor.scala:162-170): the right-hand executor's
    * threshold wins, the version window narrows to the intersection, and
    * right-hand registrations win name/label collisions (the reference
    * concatenates its `queries`/`publicProperties` sequences with the
    * right side appended; for map-backed registries that is right-bias). */
  def ++(other: QueryExecutor): QueryExecutor = {
    val mergedProps = (propsByLabel.keySet ++ other.propsByLabel.keySet).map { label =>
      label -> ((propsByLabel.get(label), other.propsByLabel.get(label)) match {
        case (Some(a), Some(b)) => a ++ b
        case (a, b) => a.orElse(b).get
      })
    }.toMap
    val merged = new QueryExecutor(
      other.graph,
      namedQueries ++ other.namedQueries,
      mergedProps,
      other.limitedCountThreshold,
      (math.max(version._1, other.version._1), math.min(version._2, other.version._2)))
    merged.continuations = continuations ++ other.continuations
    merged.renderers = renderers ++ other.renderers
    merged
  }

  private def propsFor(t: Traversal): Properties = t.element match {
    case Element.Vertex(l, id) => propsByLabel.getOrElse(l, Properties.passthrough).withId(id)
    case Element.Edge(l, _, _) => propsByLabel.getOrElse(l, Properties.passthrough)
    case _ => Properties.passthrough
  }

  def execute(json: String): DataFrame =
    executeJ(org.json4s.jackson.JsonMethods.parse(json))

  def executeJ(q: JValue): DataFrame = executeValue(q) match {
    case QVal.Result(df) => df
    case QVal.AggResult(df, _) => df
    case QVal.Trav(t) => t.toDF
  }

  /** Run the composed query and render its result as the reference's
    * golden JSON (reference: Output.toJson through
    * QueryExecutor.execute, QueryExecutor.scala:39-45): a traversal page
    * becomes a JSON array (one object per element, through the label's
    * registered renderer), an aggregation becomes
    * `{key: {subAggName: value}}` / JsNull-on-empty, a count becomes its
    * bare number. */
  def executeJson(json: String): JValue =
    executeValue(org.json4s.jackson.JsonMethods.parse(json)) match {
      case QVal.Trav(t) =>
        // List-shaped outputs render BOUNDED (partition-at-a-time
        // iterator, hard-capped at limitedCountThreshold): executeJson's
        // in-memory JSON is for pages and aggregates; an unpaginated
        // whole-table list belongs on executeStream, and used to
        // collect() the full table here.
        t.element match {
          // a value traversal renders as bare JSON values, not row
          // objects (reference: Output of a value step serializes the
          // scalar itself — core-test/.../QueryTest golden arrays)
          case Element.Value(c) =>
            JsonRenderer.renderRowsBounded(t.toDF,
              r => JsonRenderer.toJson(r.get(r.fieldIndex(c))), limitedCountThreshold)
          case _ =>
            // label-keyed renderer lookup serves vertex AND edge labels
            val r = renderers.getOrElse(labelOf(t), JsonRenderer.defaultRow _)
            JsonRenderer.renderRowsBounded(t.toDF, r, limitedCountThreshold)
        }
      case QVal.AggResult(df, agg) => JsonRenderer.renderAggregation(df, agg)
      case QVal.Result(df) =>
        // count / limitedCount: a single numeric cell renders as its number
        val rows = df.collect()
        if (rows.length == 1 && rows.head.length == 1) JsonRenderer.toJson(rows.head.get(0))
        else JArray(rows.iterator.map(JsonRenderer.defaultRow).toList)
    }

  private def executeValue(q: JValue): QVal = {
    val steps = q match {
      case JArray(items) => items
      case single => List(single)
    }
    require(steps.nonEmpty, "empty query")
    val folded = steps.zipWithIndex.foldLeft[Option[QVal]](None) { case (acc, (step, i)) =>
      Some(applyStep(acc, step, i))
    }
    folded.get
  }

  private def labelOf(t: Traversal): String = t.element match {
    case Element.Vertex(l, _) => l
    case Element.Edge(l, _, _) => l
    case _ => ""
  }

  private def stepName(step: JValue): String = step \ "_name" match {
    case JString(s) => s
    case _ => throw new IllegalArgumentException(s"query step without _name: $step")
  }

  private def applyStep(acc: Option[QVal], step: JValue, idx: Int): QVal = {
    val name = stepName(step)
    (acc, name) match {
      case (None, _) =>
        val init = namedQueries.getOrElse(
          name,
          throw new IllegalArgumentException(s"unknown initial query '$name'"))
        QVal.Trav(init(step, graph))
      case (Some(QVal.Trav(t)), "filter") =>
        // traversal-based properties in the filter become EXISTS flags
        QVal.Trav(TraversalProps.applyFilter(t, step \ "_query", propsFor(t)))
      case (Some(QVal.Trav(t)), "sort") =>
        val props = propsFor(t)
        val resolved = TraversalProps.resolveValueColumns(t, props, TraversalProps.sortFields(step \ "_fields"))
        QVal.Trav(resolved.sortBy(SortParser.fromJValue(step \ "_fields", props): _*))
      case (Some(QVal.Trav(t)), "aggregation") =>
        val props = propsFor(t)
        val resolved = TraversalProps.resolveValueColumns(t, props, TraversalProps.aggFields(step))
        // the top-level `_name` is the step selector ("aggregation"), not
        // the aggregation's own name — drop it (top level only; sub-agg
        // `_name`s in `_select` must survive) so name defaulting works
        val aggJson = step match {
          case JObject(fields) => JObject(fields.filterNot(_._1 == "_name"))
          case other => other
        }
        // `_query` pre-filter leaves on traversal-based properties compile
        // to EXISTS flags through the same compiler the filter step uses
        // (reference routes one filterParser through both,
        // Aggregation.scala:136-141,229-231) — min-resolution would be
        // wrong for multi-valued links
        val compiler = new TraversalProps.ExistsLeafCompiler(resolved, props)
        val agg = AggregationParser.fromJValue(aggJson, props, compiler.leaf)
        QVal.AggResult(AggCompiler(compiler.traversal.df, agg, props), agg)
      case (Some(QVal.Trav(t)), "count") =>
        QVal.Result(t.count)
      case (Some(QVal.Trav(t)), "limitedCount") =>
        QVal.Result(t.limitedCount(limitedCountThreshold))
      case (Some(QVal.Trav(t)), "page") =>
        val from = (step \ "from") match { case JInt(n) => n.toInt; case _ => 0 }
        val to = (step \ "to") match { case JInt(n) => n.toInt; case _ => Int.MaxValue }
        QVal.Trav(t.range(from, to))
      case (Some(QVal.Trav(t)), other) =>
        // named continuation (e.g. a registered hop like "created")
        namedQueries.get(other) match {
          case Some(_) =>
            throw new IllegalArgumentException(
              s"step $idx: '$other' is an initial query, not applicable mid-stream")
          case None =>
            continuations.get(other) match {
              case Some(f) => QVal.Trav(f(t, step))
              case None => throw new IllegalArgumentException(s"step $idx: unknown step '$other'")
            }
        }
      case (Some(QVal.Result(_) | QVal.AggResult(_, _)), other) =>
        throw new IllegalArgumentException(
          s"step $idx: '$other' cannot follow a terminal step (type check, cf. reference Query.scala:18-34)")
    }
  }

  /** Mid-stream registered continuations: traversal → traversal steps (the
    * analog of app-registered non-initial named queries like "created" in
    * core-test/.../ModernQuery.scala:72-86). */
  private var continuations: Map[String, (Traversal, JValue) => Traversal] = Map(
    "out" -> ((t, j) => t.out(FilterParser.str(j \ "_edge"))),
    "in" -> ((t, j) => t.in(FilterParser.str(j \ "_edge"))),
    "both" -> ((t, j) => t.both(FilterParser.str(j \ "_edge"))),
    "dedup" -> ((t, _) => t.dedup())
  )

  /** Returns a NEW executor with the registration added — registration is
    * immutable on purpose: [[GlobalQueryExecutor]] caches merged
    * snapshots per version, and in-place mutation after the first
    * `get(v)` would be visible at some versions and silently invisible
    * at already-served ones. */
  def withContinuation(name: String)(f: (Traversal, JValue) => Traversal): QueryExecutor = {
    val copy = new QueryExecutor(graph, namedQueries, propsByLabel, limitedCountThreshold, version)
    copy.continuations = continuations + (name -> f)
    copy.renderers = renderers
    copy
  }

  /** Per-label entity renderers for [[executeJson]] (the analog of the
    * reference's `Query.output[D, T]` + implicit `Renderer`, e.g.
    * core-test/.../ModernQuery.scala:22-29 OutputPerson). */
  private var renderers: Map[String, org.apache.spark.sql.Row => JValue] = Map.empty

  /** Returns a NEW executor with the renderer added (immutable — see
    * [[withContinuation]]). */
  def withRenderer(label: String)(f: org.apache.spark.sql.Row => JValue): QueryExecutor = {
    val copy = new QueryExecutor(graph, namedQueries, propsByLabel, limitedCountThreshold, version)
    copy.continuations = continuations
    copy.renderers = renderers + (label -> f)
    copy
  }

  /** Streamed result delivery (reference: QueryExecutor.scala:39-45,
    * traversal/IteratorOutput.scala:7-15 — a query drained as a chunked
    * source with an `X-Total` header): rows as a driver-side iterator
    * (one partition in memory at a time, never a full collect) plus the
    * limitedCount total, `-threshold` when saturated, exactly the
    * reference's pagination contract. */
  def executeStream(json: String): QueryExecutor.IteratorOutput = {
    import scala.jdk.CollectionConverters._
    // materialize once — the limited count and the iterator would
    // otherwise each re-run the whole plan
    val df = execute(json).localCheckpoint()
    val t = limitedCountThreshold
    val capped = df.limit(t.toInt).count()
    val total = if (capped >= t) -t else capped
    QueryExecutor.IteratorOutput(df.toLocalIterator().asScala, total)
  }
}

object QueryExecutor {
  /** Default named queries for a graph: `all<Label>` scans per vertex label. */
  def defaultNamed(graph: Graph): Map[String, (JValue, Graph) => Traversal] =
    graph.vertices.keys.map { label =>
      s"all_$label" -> ((_: JValue, g: Graph) => g.V(label))
    }.toMap

  final case class IteratorOutput(rows: Iterator[org.apache.spark.sql.Row], total: Long)
}

/** The version-routed executor registry (reference:
  * ScalligraphRouter.scala:38-49): every registered module contributes a
  * [[QueryExecutor]] with a version window; a request at `/api/v{n}/query`
  * runs against the MERGE of all executors whose window contains `n` —
  * this is how the reference serves v0 and v1 APIs side by side. The
  * merged executor per version is cached (the reference uses
  * AsyncCacheApi; a concurrent map is the sync analog). */
final class GlobalQueryExecutor(executors: Seq[QueryExecutor]) {
  require(executors.nonEmpty, "no query executors registered")

  private val cache = scala.collection.concurrent.TrieMap.empty[Int, QueryExecutor]

  /** The merged executor serving API version `v` (reference:
    * ScalligraphRouter.scala:40-46, incl. the failure on an unserved
    * version). */
  def get(v: Int): QueryExecutor =
    cache.getOrElseUpdate(v,
      executors.filter(_.versionCheck(v)).reduceOption(_ ++ _)
        .getOrElse(throw new IllegalArgumentException(s"No available query executor for version $v")))

  /** All executors merged, version filter ignored (reference:
    * ScalligraphRouter.scala:48). */
  def get: QueryExecutor = executors.reduce(_ ++ _)
}
