package graft.traversal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lazy traversal over the labeled property graph — the Spark rebuild of the
 * reference's typed traversal DSL (reference: traversal/TraversalOps.scala,
 * one implicit-class method ≈ one operator, each a TinkerPop step).
 *
 * Everything here is a *declarative DataFrame transformation*: no step is
 * executed until a terminal action, so Catalyst sees the whole query and
 * applies pushdown / pruning / join planning across hops. Gremlin
 * multiplicity is preserved exactly: `out()` emits one row per edge
 * (inner join keeps duplicates); `dedup` is explicit, as in the reference
 * (SURVEY §2.4).
 *
 * Alias columns: `as(name)` (reference: TraversalOps.scala:216-219) stashes
 * the current element as a struct column `__as_<name>` that is carried
 * through subsequent hops — the relational rendering of Gremlin step labels.
 * At 100 TB carrying a struct through a join is strictly cheaper than the
 * reference's per-traverser path bookkeeping, and Catalyst prunes unused
 * alias fields out of the scan.
 */
final case class Traversal(
    graph: Graph,
    element: Element,
    df: DataFrame,
    /** Element type per step label, so `select(label)` can restore not just
      * the columns but the TYPE of an aliased position (needed by `match`
      * patterns that continue hopping from a recalled binding). */
    aliasTypes: Map[String, Element] = Map.empty) {

  import Traversal._

  def idCol: String = element match {
    case Element.Vertex(_, id) => id
    case _ => throw new IllegalStateException(s"current element has no id column: $element")
  }

  /** Plain (non-alias) columns = the current element's own fields. */
  def elementCols: Array[String] = df.columns.filterNot(_.startsWith(AliasPrefix))
  private def aliasCols: Array[String] = df.columns.filter(_.startsWith(AliasPrefix))

  // ---------------------------------------------------------------- filters

  /** Typed property predicate (reference: has, TraversalOps.scala:550-563).
    * Deliberate semantics: DSL `has(field, value)` uses SQL `===` (a NULL
    * field never matches, mirroring the reference's typed Gremlin `has`
    * which cannot see missing properties), while the JSON `_is` filter is
    * null-safe `<=>` (a runtime language comparing possibly-absent public
    * properties). Both drop NULL rows for non-null literals; they differ
    * only for an explicit `null` literal. */
  def has(field: String, p: Column => Column): Traversal = copy(df = df.where(p(col(field))))
  def has(field: String, value: Any): Traversal = copy(df = df.where(col(field) === lit(value)))
  /** Property exists / is missing (reference: _contains filter,
    * query/Filter.scala:32-46; hasNot TraversalOps.scala:548). */
  def hasPresent(field: String): Traversal = copy(df = df.where(col(field).isNotNull))
  def hasAbsent(field: String): Traversal = copy(df = df.where(col(field).isNull))
  def hasNot(field: String, value: Any): Traversal = copy(df = df.where(!(col(field) <=> lit(value))))
  def hasId(ids: Any*): Traversal = copy(df = df.where(col(idCol).isin(ids: _*)))
  /** Arbitrary predicate on this element (reference: where(P)/is(P),
    * TraversalOps.scala:576-578,681-682). */
  def where(pred: Column): Traversal = copy(df = df.where(pred))
  /** eq/neq "" on an id-typed string field (reference: isEmptyId/
    * nonEmptyId, TraversalOps.scala:562-563, TraversalMacro.scala:112-123). */
  def isEmptyId(field: String): Traversal = copy(df = df.where(col(field) <=> lit("")))
  def nonEmptyId(field: String): Traversal = copy(df = df.where(!(col(field) <=> lit(""))))
  def is(p: Column => Column): Traversal = element match {
    case Element.Value(c) => copy(df = df.where(p(col(c))))
    case _ => throw new IllegalStateException("is() requires a value traversal")
  }

  /** EXISTS of a sub-traversal (reference: filter(f),
    * TraversalOps.scala:645-648) → left-semi join on the element id. Valid
    * because the sub-traversal's outcome is a function of the element alone,
    * so all duplicate traversers of one id are kept or dropped together. */
  def filter(f: Traversal => Traversal): Traversal = semiJoin(f, "left_semi")
  /** NOT EXISTS (reference: filterNot/not, TraversalOps.scala:645-648,690). */
  def filterNot(f: Traversal => Traversal): Traversal = semiJoin(f, "left_anti")

  private def semiJoin(f: Traversal => Traversal, joinType: String): Traversal = {
    val key = idCol
    // Stash the element id before the sub-traversal so its hops can't lose
    // it, then semi/anti-join the surviving ids back. Explicit DataFrame
    // aliases keep the self-join lineage unambiguous for the analyzer.
    val sub = f(this.as(SubKeyAlias))
    val keys = sub.df.select(col(s"$AliasPrefix$SubKeyAlias.$key").as(key)).distinct()
    val joined = df
      .alias("__fl")
      .join(keys.alias("__fr"), col(s"__fl.$key") === col(s"__fr.$key"), joinType)
    copy(df = joined)
  }

  /** Boolean combinators over sub-traversals (reference: or/and/not,
    * TraversalOps.scala:684-691). */
  def or(fs: (Traversal => Traversal)*): Traversal =
    filter(t => Traversal(graph, t.element, fs.map(f => f(t).df).reduce(_.unionByName(_, allowMissingColumns = true)), t.aliasTypes))
  def and(fs: (Traversal => Traversal)*): Traversal = fs.foldLeft(this)((t, f) => t.filter(f))
  def not(f: Traversal => Traversal): Traversal = filterNot(f)

  // ------------------------------------------------------------------ hops

  /** Follow outgoing edges to adjacent vertices (reference: out[E],
    * TraversalOps.scala:429-434). FK edges compile to ONE equi-join. */
  def out(edgeLabel: String): Traversal = hopVertex(edgeLabel, forward = true)
  /** Incoming (reference: in[E], TraversalOps.scala:443-448). */
  def in(edgeLabel: String): Traversal = hopVertex(edgeLabel, forward = false)
  /** Either direction (reference: both[E], TraversalOps.scala:464-469).
    * Gremlin both() follows whichever directions exist for this vertex; a
    * side whose endpoint label doesn't match contributes nothing. */
  def both(edgeLabel: String): Traversal = {
    val e = graph.edge(edgeLabel)
    val sides = Seq(
      if (e.srcLabel == vertexLabel) Some(out(edgeLabel)) else None,
      if (e.dstLabel == vertexLabel) Some(in(edgeLabel)) else None).flatten
    require(sides.nonEmpty, s"edge $edgeLabel does not touch label $vertexLabel")
    sides.reduce((a, b) => Traversal(graph, a.element, a.df.unionByName(b.df, allowMissingColumns = true), a.aliasTypes))
  }

  /** Hop onto the edge element itself (reference: outE/inE,
    * TraversalOps.scala:436-455). */
  def outE(edgeLabel: String): Traversal = hopEdge(edgeLabel, forward = true)
  def inE(edgeLabel: String): Traversal = hopEdge(edgeLabel, forward = false)

  /** Edge → head vertex (reference: inV, TraversalOps.scala:457-462). */
  def inV: Traversal = edgeToVertex(_.dstLabel, "_dst", dstSide = true)
  /** Edge → tail vertex (reference: outV). */
  def outV: Traversal = edgeToVertex(_.srcLabel, "_src", dstSide = false)
  /** Edge → the endpoint we did not come from (reference: otherV); requires
    * the edge was reached via outE/inE/bothE which record the origin side. */
  def otherV: Traversal = element match {
    case Element.Edge(_, Some(otherLabel), Some(otherRef)) if df.columns.contains(OtherKeyCol) =>
      joinToVertexFromEdge(graph.vertex(otherLabel), OtherKeyCol, otherRef)
    case _ => throw new IllegalStateException("otherV requires an edge traversal reached via outE/inE/bothE")
  }

  def bothE(edgeLabel: String): Traversal = {
    val e = graph.edge(edgeLabel)
    val sides = Seq(
      if (e.srcLabel == vertexLabel) Some(outE(edgeLabel)) else None,
      if (e.dstLabel == vertexLabel) Some(inE(edgeLabel)) else None).flatten
    require(sides.nonEmpty, s"edge $edgeLabel does not touch label $vertexLabel")
    sides.reduce { (a, b) =>
      val el = (a.element, b.element) match {
        case (Element.Edge(l, x, rx), Element.Edge(_, y, ry)) if x == y && rx == ry => Element.Edge(l, x, rx)
        case (Element.Edge(l, _, _), _) => Element.Edge(l, None, None)
        case _ => Element.Mixed
      }
      Traversal(graph, el, a.df.unionByName(b.df, allowMissingColumns = true), a.aliasTypes)
    }
  }

  private def vertexLabel: String = element match {
    case Element.Vertex(l, _) => l
    case other => throw new IllegalStateException(s"hop requires a vertex traversal, found $other")
  }

  private def hopVertex(edgeLabel: String, forward: Boolean): Traversal = {
    val e = graph.edge(edgeLabel)
    val (fromLabel, toLabel) = if (forward) (e.srcLabel, e.dstLabel) else (e.dstLabel, e.srcLabel)
    require(vertexLabel == fromLabel, s"cannot hop $edgeLabel ${if (forward) "out" else "in"} from $vertexLabel")
    val dst = graph.vertex(toLabel)
    e match {
      case FkEdge(_, _, _, srcKey, dstKey) =>
        val (myKey, theirKey) = if (forward) (srcKey, dstKey) else (dstKey, srcKey)
        joinToVertex(dst, myKey, theirKey)
      case _: EdgeTable =>
        hopEdge(edgeLabel, forward)
          .joinToVertexFromEdge(dst, if (forward) "_dst" else "_src", graph.endpointRef(edgeLabel, dstSide = forward))
    }
  }

  /** Single equi-join: carried aliases + my key vs. destination table. */
  private def joinToVertex(dst: VertexTable, myKey: String, theirKey: String): Traversal = {
    val left = df.select((aliasCols.map(df(_)) :+ df(myKey).as(HopKeyCol)): _*).alias("__l")
    val right = dst.df.alias("__r")
    val joined = left
      .join(right, col(s"__l.$HopKeyCol") === col(s"__r.$theirKey"))
      .select((col("__r.*") +: aliasCols.map(c => col(s"__l.$c"))): _*)
    Traversal(graph, Element.Vertex(dst.label, dst.idCol), joined, aliasTypes)
  }

  private def hopEdge(edgeLabel: String, forward: Boolean): Traversal = {
    val e = graph.edge(edgeLabel)
    val fromLabel = if (forward) e.srcLabel else e.dstLabel
    require(vertexLabel == fromLabel, s"cannot hop ${if (forward) "outE" else "inE"} $edgeLabel from $vertexLabel")
    val (nearKey, farKey) = if (forward) ("_src", "_dst") else ("_dst", "_src")
    // the vertex column the near edge column references: the idCol when we
    // sit on the edge's source side, the edge's declared dstKey otherwise
    // (FkEdge dstKey may differ from the destination idCol)
    val nearRef = graph.endpointRef(edgeLabel, dstSide = !forward)
    val edf = graph.edgeDf(edgeLabel)
    val left = df.select((aliasCols.map(df(_)) :+ df(nearRef).as(HopKeyCol)): _*).alias("__l")
    val right = edf.alias("__r")
    val joined = left
      .join(right, col(s"__l.$HopKeyCol") === col(s"__r.$nearKey"))
      .select((col("__r.*") +: (aliasCols.map(c => col(s"__l.$c")) :+ col(s"__r.$farKey").as(OtherKeyCol))): _*)
    Traversal(
      graph,
      Element.Edge(
        edgeLabel,
        Some(if (forward) e.dstLabel else e.srcLabel),
        Some(graph.endpointRef(edgeLabel, dstSide = forward))),
      joined,
      aliasTypes)
  }

  private def edgeToVertex(pick: EdgeRel => String, key: String, dstSide: Boolean): Traversal = element match {
    case Element.Edge(label, _, _) =>
      val dst = graph.vertex(pick(graph.edge(label)))
      joinToVertexFromEdge(dst, key, graph.endpointRef(label, dstSide))
    case other => throw new IllegalStateException(s"inV/outV requires an edge traversal, found $other")
  }

  /** Join an edge endpoint column onto its vertex table; `theirKey` is the
    * vertex column the endpoint value references (idCol for EdgeTable ends,
    * the declared dstKey for FkEdge destination ends). */
  private def joinToVertexFromEdge(dst: VertexTable, key: String, theirKey: String): Traversal = {
    val left = df.select((aliasCols.map(df(_)) :+ df(key).as(HopKeyCol)): _*).alias("__l")
    val right = dst.df.alias("__r")
    val joined = left
      .join(right, col(s"__l.$HopKeyCol") === col(s"__r.$theirKey"))
      .select((col("__r.*") +: aliasCols.map(c => col(s"__l.$c"))): _*)
    Traversal(graph, Element.Vertex(dst.label, dst.idCol), joined, aliasTypes)
  }

  // ------------------------------------------------------------ projections

  /** Project one property (reference: value(_.field),
    * TraversalOps.scala:611-631). */
  def value(field: String): Traversal =
    Traversal(graph, Element.Value(field), df.select((col(field) +: aliasCols.map(df(_))): _*), aliasTypes)

  /** Per-row error-tolerance mode — SURVEY §4's "decide explicitly"
    * decision, decided: the engine is FAIL-FAST by default (ANSI mode,
    * Spark's native semantics); permissive iteration is opt-in per
    * conversion via this method, which converts with try_cast and DROPS
    * rows whose non-null value fails to convert — mirroring the
    * reference's swallow-and-skip iterator (TraversalOps.scala:56-87)
    * without making silent data loss the default. */
  def tryValue(field: String, dataType: String): Traversal = {
    val casted = expr(s"try_cast($field AS $dataType)")
    val failed = col(field).isNotNull && casted.isNull
    Traversal(
      graph,
      Element.Value(field),
      df.where(!failed).select((expr(s"try_cast($field AS $dataType)").as(field) +: aliasCols.map(df(_))): _*),
      aliasTypes)
  }

  /** Project several properties, keeping the traversal typed on them. */
  def values(fields: String*): Traversal =
    copy(df = df.select((fields.map(col) ++ aliasCols.map(df(_))): _*))

  /** N-ary projection (reference: project(_.by..),
    * TraversalOps.scala:408-413). Each entry is a named column expression;
    * sub-traversal `by`s are pre-joined columns in the caller. */
  def project(cols: (String, Column)*): Traversal =
    copy(element = Element.Mixed, df = df.select(cols.map { case (n, c) => c.as(n) }: _*))

  /** Replace value with a constant (reference: constant,
    * TraversalOps.scala:223-227). */
  def constant(v: Any): Traversal =
    Traversal(graph, Element.Value("const"), df.select((lit(v).as("const") +: aliasCols.map(df(_))): _*), aliasTypes)

  /** Selected properties as one JSON value per element (reference:
    * valueMap(keys*), TraversalOps.scala:619-622). */
  def valueMap(fields: String*): Traversal =
    Traversal(graph, Element.Value("vm"), aliasTypes = aliasTypes, df =
      df.select((to_json(struct(fields.map(col): _*)).as("vm") +: aliasCols.map(df(_))): _*))

  /** The whole element as JSON (reference: entityMap/entity,
    * TraversalOps.scala:490-546 — the dynamic any-element projection). */
  def entity: Traversal =
    Traversal(graph, Element.Value("entity"), aliasTypes = aliasTypes, df =
      df.select((to_json(struct(elementCols.map(col).toIndexedSeq: _*)).as("entity") +: aliasCols.map(df(_))): _*))

  /** N-ary untyped projection → array of strings (reference: flatProject,
    * TraversalOps.scala:415-427 — Seq[Any] per element). */
  def flatProject(cols: Column*): Traversal =
    Traversal(graph, Element.Value("fp"), aliasTypes = aliasTypes, df =
      df.select((array(cols.map(_.cast("string")): _*).as("fp") +: aliasCols.map(df(_))): _*))

  /** Key/value projection out of a map column (reference:
    * selectKeys/selectValues, TraversalOps.scala:356-365). */
  def selectKeys(field: String): Traversal =
    Traversal(graph, Element.Value("keys"), df.select(map_keys(col(field)).as("keys")))
  def selectValues(field: String): Traversal =
    Traversal(graph, Element.Value("values"), df.select(map_values(col(field)).as("values")))

  /** No-op step (reference: identity, TraversalOps.scala:606) — the unit
    * of step composition; useful as a branch arm. */
  def identity: Traversal = this

  /** Side-effecting peek at the current plan (reference: sideEffect,
    * TraversalOps.scala:606-609) — runs eagerly against the current df. */
  def sideEffect(f: DataFrame => Unit): Traversal = { f(df); this }

  /** Map rows through a typed Scala function (reference: domainMap,
    * traversal/Traversal.scala:29-32). Leaves the declarative plan — use
    * only where Column expressions genuinely cannot express the logic. */
  def domainMap[T: org.apache.spark.sql.Encoder](f: org.apache.spark.sql.Row => T): org.apache.spark.sql.Dataset[T] =
    df.map(f)

  /** Pre-conversion row map (reference: graphMap, traversal/Traversal.
    * scala:29-32). The reference distinguishes pre/post-conversion because
    * its rows pass through a Converter stack; here rows ARE the storage
    * representation, so both collapse to the same typed map. */
  def graphMap[T: org.apache.spark.sql.Encoder](f: org.apache.spark.sql.Row => T): org.apache.spark.sql.Dataset[T] =
    domainMap(f)

  // ---------------------------------------------------------------- aliases

  /** Stash the current element under a step label (reference: as,
    * TraversalOps.scala:216-219, StepLabel.scala:9-31). */
  def as(name: String): Traversal = {
    val self = struct(elementCols.map(col).toIndexedSeq: _*)
    copy(df = df.withColumn(s"$AliasPrefix$name", self), aliasTypes = aliasTypes + (name -> element))
  }

  /** Recall an aliased element (reference: select(label),
    * TraversalOps.scala:302-337) — restores its columns AND element type,
    * so the traversal can keep hopping from the recalled position. The
    * alias column itself is KEPT (a step label stays recallable after
    * select, as in Gremlin — `match` relies on this). */
  def select(name: String): Traversal = {
    val restored = df.select((col(s"$AliasPrefix$name.*") +: aliasCols.map(df(_))): _*)
    Traversal(graph, aliasTypes.getOrElse(name, Element.Mixed), restored, aliasTypes)
  }

  /** Column of a field of an aliased element — for cross-alias predicates
    * (reference: where(P.neq(label)) cycle-closing,
    * services/IntegrityCheckOps.scala:277-278). */
  def sel(name: String, field: String): Column = col(s"$AliasPrefix$name.$field")

  /** Multi-label tuple select (reference: select((l1, l2, ...)),
    * TraversalOps.scala:305-325, Selectors.scala:65-96): project several
    * aliased positions side by side, fields prefixed `<label>_`. */
  def selectTuple(names: String*): Traversal = {
    val cols = names.flatMap { n =>
      val structCol = s"$AliasPrefix$n"
      df.select(s"$structCol.*").columns.toIndexedSeq.map(f => col(s"$structCol.$f").as(s"${n}_$f"))
    }
    Traversal(graph, Element.Mixed, df.select(cols: _*), aliasTypes)
  }

  /** Re-type an untyped/mixed traversal to a vertex model (reference:
    * v[E], TraversalOps.scala:471-477) — validates the frame carries the
    * model's columns, the relational analog of the reference's cast. */
  def retype(label: String): Traversal = {
    val vt = graph.vertex(label)
    val missing = vt.df.columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"cannot re-type to '$label': missing columns ${missing.mkString(", ")}")
    copy(element = Element.Vertex(label, vt.idCol))
  }

  /** The element's label as a value traversal (reference: label,
    * TraversalOps.scala:580-581). A homogeneous traversal knows its label
    * STATICALLY, so this is a constant column — no data touched; a mixed
    * traversal reads the `__label` discriminator [[Graph.union]] tagged
    * each branch with (the relational analog of every graph element
    * carrying its label). */
  def label(as: String = "label"): Traversal = {
    val c = element match {
      case Element.Vertex(l, _) => lit(l)
      case Element.Edge(l, _, _) => lit(l)
      case Element.Mixed if df.columns.contains(LabelCol) => col(LabelCol)
      case other => throw new IllegalArgumentException(
        s"label: untagged $other traversal (only Graph.union produces labeled mixed frames)")
    }
    Traversal(graph, Element.Value(as), df.select((c.as(as) +: aliasCols.map(df(_))): _*), aliasTypes)
  }

  /** Filter by element label (reference: hasLabel,
    * TraversalOps.scala:548). On a homogeneous traversal this folds at
    * PLAN TIME — identity or the statically-empty frame, no scan; on a
    * tagged mixed traversal it filters the discriminator and RE-TYPES to
    * the matched vertex model when its columns survived the union, so
    * typed steps (has, hops) compose downstream. */
  def hasLabel(name: String): Traversal = element match {
    case Element.Vertex(l, _) => if (l == name) this else copy(df = df.limit(0))
    case Element.Edge(l, _, _) => if (l == name) this else copy(df = df.limit(0))
    case Element.Mixed if df.columns.contains(LabelCol) =>
      val kept = copy(df = df.where(col(LabelCol) === name))
      graph.vertices.get(name) match {
        case Some(vt) if vt.df.columns.forall(df.columns.contains) =>
          // prune to the matched model's columns (+ carried step labels,
          // minus the now-static discriminator): the narrowed traversal
          // must render the SAME entity shape as g.V(name) — other
          // branches' all-null columns would otherwise leak into
          // valueMap/entity output
          val keep = vt.df.columns ++
            aliasCols.filterNot(c => c == LabelCol || vt.df.columns.contains(c))
          Traversal(graph, Element.Vertex(name, vt.idCol),
            kept.df.select(keep.map(kept.df(_)): _*), aliasTypes)
        case _ => kept
      }
    case other => throw new IllegalArgumentException(
      s"hasLabel: untagged $other traversal (only Graph.union produces labeled mixed frames)")
  }

  // ------------------------------------------------- dedup / sort / paging

  /** Distinct elements (reference: dedup, TraversalOps.scala:650-651) —
    * by id for vertices, by value otherwise. */
  def dedup(): Traversal = element match {
    case Element.Vertex(_, id) =>
      // keep one arbitrary-but-deterministic row per id
      copy(df = df.dropDuplicates(Seq(id)))
    case _ => copy(df = df.dropDuplicates(elementCols.toIndexedSeq))
  }
  /** Distinct over aliased elements (reference: dedup(labels*)). */
  def dedup(aliases: String*): Traversal =
    copy(df = df.dropDuplicates(aliases.map(a => s"$AliasPrefix$a")))

  /** Multi-key global sort (reference: sort(_.by..),
    * TraversalOps.scala:352-353). Nulls sort first on asc, last on desc —
    * matching the reference's null-tolerant comparators
    * (janus/.../OrderAcceptNullStrategy.java). */
  def sort(keys: (String, Boolean)*): Traversal =
    copy(df = df.orderBy(keys.map { case (f, asc) => if (asc) col(f).asc_nulls_first else col(f).desc_nulls_last }: _*))
  def sortBy(cols: Column*): Traversal = copy(df = df.orderBy(cols: _*))

  def limit(n: Int): Traversal = copy(df = df.limit(n))
  /** Offset+limit page (reference: range, TraversalOps.scala:173-177). */
  def range(lo: Int, hi: Int): Traversal =
    copy(df = if (lo == 0) df.limit(hi) else df.offset(lo).limit(hi - lo))

  // ----------------------------------------------------------- aggregation

  /** Global count (reference: TraversalOps.scala:184-192; the reference
    * strips a trailing order step first — Catalyst's EliminateSorts does
    * the same rewrite). */
  def count: DataFrame = df.agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))

  /** Count capped at a threshold, returning -threshold when saturated
    * (reference: limitedCount, TraversalOps.scala:194-196). Spark shape:
    * LIMIT t pushes into the scan, so a saturated count touches only t rows. */
  def limitedCount(threshold: Long): DataFrame =
    df.limit(threshold.toInt).agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
      .select(when(col("c") >= threshold, lit(-threshold)).otherwise(col("c")).as("count"))

  def sum(field: String): DataFrame = df.agg(org.apache.spark.sql.functions.sum(col(field)).as("sum"))
  def min(field: String): DataFrame = df.agg(org.apache.spark.sql.functions.min(col(field)).as("min"))
  def max(field: String): DataFrame = df.agg(org.apache.spark.sql.functions.max(col(field)).as("max"))
  def mean(field: String): DataFrame = df.agg(avg(col(field)).as("mean"))

  /** key → count map (reference: groupCount, TraversalOps.scala:263-272). */
  def groupCount(key: Column): DataFrame =
    df.groupBy(key.as("key")).agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))

  /** key → aggregated value (reference: group(keyBy, valueBy),
    * TraversalOps.scala:229-246). One shuffle, map-side partials. */
  def group(key: Column, aggs: Column*): DataFrame = df.groupBy(key).agg(aggs.head, aggs.tail: _*)

  /** Collect all into one row (reference: fold, TraversalOps.scala:344-345). */
  def fold(field: String): DataFrame = df.agg(collect_list(col(field)).as("folded"))
  /** Explode a collection column back to rows (reference: unfold,
    * TraversalOps.scala:347-350). */
  def unfold(field: String): Traversal =
    Traversal(graph, Element.Value(field), df.select(explode(col(field)).as(field)), aliasTypes)

  /** Per-row collection size (reference: localCount, TraversalOps.scala:198). */
  def localCount(field: String): Traversal =
    Traversal(graph, Element.Value("count"), df.select(size(col(field)).as("count")), aliasTypes)

  // ------------------------------------------------------------- branching

  /** Per-element conditional (reference: choose(pred, onTrue, onFalse),
    * TraversalOps.scala:274-287) — scalar form compiles to when/otherwise,
    * staying inside whole-stage codegen. */
  def chooseValue(pred: Column, onTrue: Column, onFalse: Column, as: String): Traversal =
    Traversal(graph, Element.Value(as), df.select((when(pred, onTrue).otherwise(onFalse).as(as) +: aliasCols.map(df(_))): _*), aliasTypes)

  /** First non-null of several columns with constant fallback (reference:
    * coalesce/coalesceIdent, TraversalOps.scala:367-403, scalar case). */
  def coalesceValue(as: String, cols: Column*): Traversal =
    Traversal(graph, Element.Value(as), df.select((org.apache.spark.sql.functions.coalesce(cols: _*).as(as) +: aliasCols.map(df(_))): _*), aliasTypes)

  /** element → f(element) when non-empty else element (reference: optional,
    * TraversalOps.scala:405-406): left join + per-row fallback. */
  def optional(f: Traversal => Traversal): Traversal = {
    val key = idCol
    // Carry ALL element columns into the sub-traversal (not just the id):
    // its first hop may join on a foreign-key column, e.g.
    // customer.optional(_.out("cust_nation")) joins on c_nationkey.
    val sub = f(this.as(SubKeyAlias))
    // Sub-traversal columns that collide with the element's own columns
    // (e.g. a self-label hop) come back suffixed `_opt`.
    val subKeyed = sub.df
      .select((col(s"$AliasPrefix$SubKeyAlias.$key").as(OptKeyCol) +: sub.elementCols.map { c =>
        if (df.columns.contains(c)) sub.df(c).as(s"${c}_opt") else sub.df(c)
      }): _*)
    val joined = df.join(subKeyed, df(key) === subKeyed(OptKeyCol), "left_outer")
    Traversal(graph, Element.Mixed, joined.drop(OptKeyCol), aliasTypes)
  }

  /** Union of several branch traversals applied to this element (reference:
    * unionFlat, TraversalOps.scala:661-666). */
  def unionFlat(fs: (Traversal => Traversal)*): Traversal = {
    val branches = fs.map(f => f(this))
    Traversal(
      graph,
      if (branches.map(_.element).distinct.size == 1) branches.head.element else Element.Mixed,
      branches.map(_.df).reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /** Arithmetic expression on the current value (reference: math(expr),
    * TraversalOps.scala:678-679). */
  def math(expression: String, as: String = "math"): Traversal =
    Traversal(graph, Element.Value(as), df.select(expr(expression).as(as)), aliasTypes)

  /** N-ary projection with sub-traversal `by`s (reference:
    * `project(_.by..by(f))`, ProjectionBuilder.scala:14-80): each
    * [[ProjectBy.Sub]] entry is a correlated sub-traversal aggregated per
    * element — the reference's most common shape is entity + sub-traversal
    * count (e.g. case + taskCount). Compiles to one groupBy(id) + left
    * join per sub entry; `count` of an empty sub-traversal is 0 and `list`
    * is sorted, both matching the reference's drained-iterator semantics
    * deterministically. */
  def projectBy(bys: ProjectBy*): Traversal = {
    val key = idCol
    var acc = df
    bys.collect { case s: ProjectBy.Sub => s }.foreach { s =>
      val sub = s.f(this.as(SubKeyAlias))
      val keyCol = col(s"$AliasPrefix$SubKeyAlias.$key").as("__pk")
      def vcol: Column = sub.element match {
        case Element.Value(c) => col(c)
        case other => throw new IllegalArgumentException(s"projectBy '${s.name}' (${s.agg}) needs a value sub-traversal, found $other")
      }
      val agged = s.agg match {
        case "count" => org.apache.spark.sql.functions.count(lit(1))
        case "first" | "min" => org.apache.spark.sql.functions.min(vcol)
        case "max" => org.apache.spark.sql.functions.max(vcol)
        case "sum" => org.apache.spark.sql.functions.sum(vcol)
        case "list" => sort_array(collect_list(vcol))
        case other => throw new IllegalArgumentException(s"unknown projectBy aggregation '$other'")
      }
      val grouped = sub.df.groupBy(keyCol).agg(agged.as(s.name))
      acc = acc.alias("__pl")
        .join(grouped.alias("__pr"), col(s"__pl.$key") === col("__pr.__pk"), "left_outer")
        .select(col("__pl.*"), col(s"__pr.${s.name}"))
    }
    val outCols = bys.map {
      case ProjectBy.Col(n, c) => c.as(n)
      case s: ProjectBy.Sub if s.agg == "count" =>
        org.apache.spark.sql.functions.coalesce(col(s.name), lit(0L)).as(s.name)
      case s: ProjectBy.Sub => col(s.name)
    }
    Traversal(graph, Element.Mixed, acc.select(outCols: _*), aliasTypes)
  }

  /** Branch-traversal coalesce (reference: coalesceMulti/coalesceIdent,
    * TraversalOps.scala:367-403): per element, emit ALL results of the
    * FIRST branch that is non-empty for it, or `default` if every branch
    * is empty. Each branch must end in a value; values are unified under
    * `name`.
    *
    * Relational shape: union the branch results (keyed by element id,
    * tagged with the branch index) with the default as a LOWEST-priority
    * synthetic branch, then keep rows whose index equals
    * `min(index) over (partition by id)` — ONE shuffle on the element id,
    * no self-joins and no subplan recomputation (the previous
    * groupBy+join+anti-join shape evaluated the branch union three times).
    * Alias columns ride along through the union, so nothing is re-joined. */
  def coalesceBranch(name: String, default: Option[Any], fs: (Traversal => Traversal)*): Traversal = {
    require(fs.nonEmpty, "coalesceBranch needs at least one branch")
    val key = idCol
    val carried = aliasCols
    val branchDfs = fs.zipWithIndex.map { case (f, i) =>
      val b = f(this.as(SubKeyAlias))
      val vcol = b.element match {
        case Element.Value(c) => c
        case other => throw new IllegalArgumentException(s"coalesceBranch branch $i must end in a value, found $other")
      }
      b.df.select((Seq(
        col(s"$AliasPrefix$SubKeyAlias.$key").as("__cbk"),
        lit(i).as("__cbi"),
        col(vcol).as(name)) ++ carried.map(b.df(_))): _*)
    }
    val defaultDf = default.map { d =>
      df.select((Seq(
        df(key).as("__cbk"),
        lit(fs.length).as("__cbi"),
        lit(d).as(name)) ++ carried.map(df(_))): _*)
    }
    // null element ids are dropped outright (the join-based formulation
    // never matched them) — without this, every null-id row would share
    // ONE window partition and steal each other's winning branch
    val unioned = (branchDfs ++ defaultDf).reduce(_.unionByName(_)).where(col("__cbk").isNotNull)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__cbk"))
    val picked = unioned
      .withColumn("__cbw", org.apache.spark.sql.functions.min(col("__cbi")).over(w))
      .where(col("__cbi") === col("__cbw"))
      .select((col(name) +: carried.map(col(_))): _*)
    Traversal(graph, Element.Value(name), picked, aliasTypes)
  }

  /** Multi-way branch routing (reference: chooseBranch + BranchSelector,
    * TraversalOps.scala:274-287, BranchSelector.scala:6-45, delegating to
    * TinkerPop's ChooseStep picks). Routing, per element:
    *
    *  - matches an option value  → that option's branch
    *  - matches no option        → the `none` branch if declared, else
    *    dropped (TinkerPop BranchStep: unmatched choice falls to the
    *    Pick.none options or dies)
    *  - a NULL selector also routes to `none`: TinkerPop 3.4 threw
    *    ("traverser does not map to a value") on a non-productive choice
    *    traversal; 3.5+ maps it to Pick.none, which is the only sane
    *    columnar rendering — a throw per null row is not an option at
    *    scale, and null-safe option matching (`<=>`) still lets an
    *    explicit `option(null, f)` claim nulls first
    *  - the `any` branch, if declared, additionally receives EVERY
    *    element regardless of its routing (TinkerPop Pick.any is a copy,
    *    not an alternative)
    *
    * Compiles to a union of branches each applied to its filtered subset —
    * one scan per branch, predicates pushed down; no shuffle beyond what
    * the branches themselves do. */
  def chooseBranch(
      on: Column,
      name: String,
      options: Seq[(Any, Traversal => Traversal)],
      none: Option[Traversal => Traversal] = None,
      any: Option[Traversal => Traversal] = None): Traversal = {
    def run(pred: Column, f: Traversal => Traversal): DataFrame = {
      val b = f(this.where(pred))
      val vcol = b.element match {
        case Element.Value(c) => c
        case other => throw new IllegalArgumentException(s"chooseBranch branch must end in a value, found $other")
      }
      b.df.withColumnRenamed(vcol, name)
    }
    // null-safe per-option equality (not isin): an explicit option(null)
    // matches null selectors, and the none-predicate is its exact negation
    val matched = options.map { case (v, _) => on <=> lit(v) }
      .reduceOption(_ || _).getOrElse(lit(false))
    val optionDfs = options.map { case (v, f) => run(on <=> lit(v), f) }
    val noneDf = none.map(f => run(!matched, f))
    val anyDf = any.map(f => run(lit(true), f))
    val unioned = (optionDfs ++ noneDf ++ anyDf).reduce(_.unionByName(_, allowMissingColumns = true))
    Traversal(graph, Element.Value(name), unioned, aliasTypes)
  }

  /** Declarative pattern match (reference: `match`, TraversalOps.scala:
    * 289-300, MatchElement.scala:5-41): this traversal seeds the binding
    * `seedAlias`; each pattern `(from, f, to)` runs `f` from the `from`
    * binding and either binds the result as `to` (new alias) or closes a
    * cycle (existing alias: the result must BE that binding — an id
    * equality filter). Bindings dedup at the end, as the reference's
    * MatchStep does over its match keys. Catalyst reorders the resulting
    * join chain freely — the declarative-pattern promise of `match`. */
  def matchPattern(seedAlias: String, patterns: (String, Traversal => Traversal, String)*): Traversal = {
    var cur = this.as(seedAlias)
    var bound = Vector(seedAlias)
    patterns.foreach { case (from, f, to) =>
      require(bound.contains(from), s"match pattern references unbound alias '$from'")
      val stepped = f(cur.select(from))
      if (!bound.contains(to)) {
        cur = stepped.as(to)
        bound :+= to
      } else {
        // cycle close: the stepped element must BE the existing `to` binding
        val closeKey = cur.aliasTypes(to) match {
          case Element.Vertex(_, id) => id
          case other => throw new IllegalArgumentException(s"cannot cycle-close on non-vertex binding '$to' ($other)")
        }
        cur = stepped.where(col(stepped.idCol) === col(s"$AliasPrefix$to.$closeKey"))
      }
    }
    // binding dedup on vertex IDS, not full structs: identity of a vertex
    // binding is its id column, so the distinct hashes narrow keys — at
    // scale this is the difference between shuffling ids and shuffling
    // every bound entity's full row
    val keys = bound.map { n =>
      cur.aliasTypes.get(n) match {
        case Some(Element.Vertex(_, id)) => col(s"$AliasPrefix$n.$id")
        case _ => col(s"$AliasPrefix$n")
      }
    }
    val keyNames = bound.map(n => s"__mk_$n")
    val withKeys = keys.zip(keyNames).foldLeft(cur.df) { case (d, (c, n)) => d.withColumn(n, c) }
    cur.copy(df = withKeys.dropDuplicates(keyNames).drop(keyNames: _*))
  }

  // -------------------------------------------- sack / global side-effects

  /** Per-traverser accumulator (reference: sack, TraversalOps.scala:
    * 668-676): a value carried alongside the element through hops —
    * relationally, an alias-prefixed column (so joins preserve it like
    * step labels). `withSack` seeds it, `mapSack` folds a visited value
    * into it, `sackValue` projects it out. */
  def withSack(init: Column): Traversal = copy(df = df.withColumn(SackCol, init))
  def mapSack(f: Column => Column): Traversal = copy(df = df.withColumn(SackCol, f(col(SackCol))))
  def sackValue(name: String = "sack"): Traversal =
    Traversal(graph, Element.Value(name),
      df.select((col(SackCol).as(name) +: aliasCols.filterNot(_ == SackCol).map(df(_))): _*), aliasTypes)

  /** Stash ALL current values of a column into a named collection
    * available to later steps (reference: aggregateGlobal,
    * TraversalOps.scala:653-654): a broadcast single-row cross join, the
    * relational barrier + side-effect collection. The array is sorted for
    * determinism; read it back with [[aggregated]]. */
  def aggregateGlobal(label: String, value: Column): Traversal = {
    val agged = df.agg(sort_array(collect_list(value)).as(s"$AliasPrefix$label"))
    copy(df = df.crossJoin(broadcast(agged)))
  }
  /** The collection stashed by [[aggregateGlobal]]. */
  def aggregated(label: String): Column = col(s"$AliasPrefix$label")

  /** Reference `aggregateLocal` (TraversalOps.scala:653-654) stashes the
    * traverser's CURRENT collection; our traversers are rows, so local
    * and global collection coincide — kept as an explicit name so call
    * sites translate one-to-one. */
  def aggregateLocal(label: String, value: Column): Traversal = aggregateGlobal(label, value)

  /** Keyset-paged incremental scan (reference: models/Database.scala:
    * 258-319 — `_createdAt`-ordered pages with id exclusion so background
    * jobs progress under concurrent writes). Spark scans are restartable,
    * so this exists as an iteration utility only: the page after
    * `afterId` in id order. */
  def keysetPage(afterId: Any, pageSize: Int): Traversal =
    copy(df = df.where(col(idCol) > lit(afterId)).orderBy(col(idCol)).limit(pageSize))

  // -------------------------------------------------------------- terminal

  def toDF: DataFrame = df.select(elementCols.map(col).toIndexedSeq: _*)
  /** Materialization barrier (reference: barrier, TraversalOps.scala:606). */
  def barrier(): Traversal = copy(df = df.localCheckpoint())
}

/** One `by` of a [[Traversal.projectBy]] projection: a plain column or a
  * correlated sub-traversal aggregated per element
  * (reference: ProjectionBuilder.scala:14-80). */
sealed trait ProjectBy { def name: String }
object ProjectBy {
  final case class Col(name: String, c: Column) extends ProjectBy
  /** agg ∈ count | first (= deterministic min) | min | max | sum | list. */
  final case class Sub(name: String, f: Traversal => Traversal, agg: String = "first") extends ProjectBy
}

object Traversal {
  val AliasPrefix = "__as_"
  val HopKeyCol = "__hopkey"
  val OtherKeyCol = "__otherv"
  val OptKeyCol = "__optkey"
  val SubKeyAlias = "__subkey"
  /** Alias-prefixed so hops carry the sack like any step label. */
  val SackCol = s"${AliasPrefix}_sack"
  /** Label discriminator [[Graph.union]] tags heterogeneous unions with
    * (alias-prefixed so hops and projections carry it like a step label). */
  val LabelCol = s"${AliasPrefix}_label"
}
