package graft.query

import org.apache.spark.sql.functions._
import org.json4s._
import graft.traversal.{Element, Traversal}

/**
 * Traversal-based public properties — the Spark rendering of the
 * reference's computed-property surface (reference:
 * query/PublicProperty.scala:80-105, query/PropertyBuilder.scala:22-56):
 * a published property whose value comes from a sub-traversal of the
 * element (a linked-entity field, e.g. "case.assignee").
 *
 * Two resolution modes, matching the reference's two uses:
 *
 *  - **Filter** ([[applyFilter]]): a predicate on the property means
 *    "EXISTS a traversal value matching the predicate"
 *    (reference filter = `t.filter(select(t).is(pred))`,
 *    PublicProperty.scala:80-91). Each such leaf compiles to a boolean
 *    flag: the sub-traversal's values are aggregated per element id with
 *    `max(pred)` (one shuffle on the id) and left-joined back, so the
 *    flags compose under `_and`/`_or`/`_not` as plain boolean columns —
 *    NOT EXISTS is `!flag`, exactly the reference's filterNot semantics.
 *  - **Sort/aggregate** ([[resolveValueColumns]]): the property becomes a
 *    real column: sub-traversal values aggregated `min()` per element id,
 *    left-joined. (The reference's order-by-traversal takes the
 *    traversal's first emitted value, which is iteration-order-dependent;
 *    `min` is the deterministic choice and identical for single-valued
 *    links, the dominant case.)
 *
 * Scale notes: each distinct filter leaf / resolved property costs one
 * groupBy(id) + one left join — both on the element id, so they co-locate
 * with the element's own partitioning; the flag/value DF is
 * aggregate-narrow (id + 1 column) and broadcast-able when the filtered
 * side is small.
 */
object TraversalProps {

  private val SubAlias = "__tprop"

  private def valueColOf(name: String, sub: Traversal): String = sub.element match {
    case Element.Value(c) => c
    case other =>
      throw new IllegalArgumentException(s"traversal property '$name' must end in a value, found $other")
  }

  /** Stateful filter-leaf compiler: a leaf on a traversal-based property
    * attaches an EXISTS flag column to the carried traversal (one
    * `groupBy(id).agg(max(pred))` + left join per leaf) and compiles to
    * the flag, so the flags compose under `_and`/`_or`/`_not` as plain
    * boolean columns — the reference's filter semantics
    * (PublicProperty.scala:80-91). Shared by the `filter` step and by
    * aggregation `_query` pre-filters (Aggregation.scala:229-231 routes
    * the same filterParser). */
  final class ExistsLeafCompiler(t0: Traversal, props: Properties) {
    private var current = t0
    private var flagList = List.empty[String]

    /** The traversal with all flag columns attached so far. */
    def traversal: Traversal = current
    def flags: Seq[String] = flagList

    val leaf: FilterParser.Leaf = (field, op, jv) =>
      props.props.get(field).filter(_.traversal.isDefined) match {
        case Some(p) =>
          val key = current.idCol
          val subT = p.traversal.get(current.as(SubAlias))
          val vcol = valueColOf(field, subT)
          // predicate evaluated against the sub-traversal's value column,
          // with the property's declared type driving literal coercion
          val vprops = Properties(PublicProperty(field, col(vcol), p.dataType))
          val pred = FilterParser.defaultLeaf(vprops)(field, op, jv)
          val flagName = s"__tpflag_${flagList.size}"
          val flagDf = subT.df
            .groupBy(col(s"${Traversal.AliasPrefix}$SubAlias.$key").as("__tpk"))
            .agg(max(pred).as(flagName))
          val joined = current.df.alias("__tl")
            .join(flagDf.alias("__tr"), col(s"__tl.$key") === col("__tr.__tpk"), "left_outer")
            .select(col("__tl.*"), col(s"__tr.$flagName"))
          current = current.copy(df = joined)
          flagList ::= flagName
          coalesce(col(flagName), lit(false))
        case None => FilterParser.defaultLeaf(props)(field, op, jv)
      }
  }

  /** Apply a JSON filter, compiling leaves on traversal-based properties
    * into EXISTS flags and everything else to plain Column predicates. */
  def applyFilter(t: Traversal, j: JValue, props: Properties): Traversal = {
    val compiler = new ExistsLeafCompiler(t, props)
    val pred = FilterParser.build(j, props, compiler.leaf)
    val current = compiler.traversal
    current.copy(df = compiler.flags.foldLeft(current.df.where(pred))(_.drop(_)))
  }

  /** Left-join the resolved value column for each referenced
    * traversal-based property (for sort/aggregation steps). */
  def resolveValueColumns(t: Traversal, props: Properties, names: Seq[String]): Traversal =
    names.distinct.foldLeft(t) { (acc, name) =>
      props.props.get(name).filter(_.traversal.isDefined) match {
        case Some(p) if !acc.df.columns.contains(name) =>
          val key = acc.idCol
          val subT = p.traversal.get(acc.as(SubAlias))
          val vcol = valueColOf(name, subT)
          val vals = subT.df
            .groupBy(col(s"${Traversal.AliasPrefix}$SubAlias.$key").as("__tpk"))
            .agg(min(col(vcol)).as(name))
          val joined = acc.df.alias("__tl")
            .join(vals.alias("__tr"), col(s"__tl.$key") === col("__tr.__tpk"), "left_outer")
            .select(col("__tl.*"), col(s"__tr.$name"))
          acc.copy(df = joined)
        case _ => acc
      }
    }

  /** Property names a JSON sort spec references. */
  def sortFields(j: JValue): Seq[String] =
    FilterParser.asArray(j).flatMap {
      case JString(s) => Seq(s.stripPrefix("+").stripPrefix("-"))
      case JObject(fields) => fields.map(_._1)
      case _ => Nil
    }

  /** Property names an aggregation JSON needs as VALUE columns: group keys
    * and scalar fields only. `_query` pre-filter leaves are deliberately
    * excluded — they compile through [[ExistsLeafCompiler]] (the same
    * EXISTS path the `filter` step uses), because min-resolution is wrong
    * for multi-valued links: a pre-filter `p = "x"` must keep an element
    * whose link values are `["a","x"]`. */
  def aggFields(j: JValue): Seq[String] =
    (j \ "_field" match { case JString(s) => Seq(s); case _ => Nil }) ++
      (j \ "_select" match { case JNothing => Nil; case s => FilterParser.asArray(s).flatMap(aggFields) })
}
