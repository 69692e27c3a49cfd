package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Public-property catalog — the analog of the reference's
 * `PublicProperties` / `PublicPropertyListBuilder`
 * (reference: query/PropertyBuilder.scala:14-152,
 * query/PublicProperty.scala:143-158): the published name a JSON query may
 * use, mapped to a column expression (a rename, a computed expression, or a
 * custom filter builder), plus the declared type used to coerce JSON
 * literals into typed Spark literals (the reference parses values with the
 * property's own parser, query/Filter.scala:105-110).
 */
final case class PublicProperty(
    name: String,
    column: Column,
    dataType: DataType = NullType,
    /** Custom filter builder (reference: PropertyBuilder.scala:95-116). */
    customFilter: Option[(String, Any) => Column] = None,
    /** Traversal-based property (reference: PublicProperty.scala:80-91,
      * PropertyBuilder.scala:22-56): the value is computed by a
      * sub-traversal from the element (a linked-entity field like
      * "case.assignee"). Filtering on it becomes an EXISTS semi-join;
      * sorting/aggregating joins the resolved value column
      * (TraversalProps). The sub-traversal must end in a value. */
    traversal: Option[graft.traversal.Traversal => graft.traversal.Traversal] = None)

object PublicProperty {
  /** A property whose value is computed by a sub-traversal; `column` is
    * the post-resolution column name (joined in by TraversalProps). */
  def fromTraversal(name: String, dataType: DataType = NullType)(
      sub: graft.traversal.Traversal => graft.traversal.Traversal): PublicProperty =
    PublicProperty(name, col(name), dataType, None, Some(sub))
}

final case class Properties(
    props: Map[String, PublicProperty],
    passthrough: Boolean = true,
    /** The element's id column, resolved by the executor from the current
      * traversal (reference: `_id` filters go through the element id,
      * query/Filter.scala:94-101 — ids are per-model, e.g. `c_custkey`,
      * never a literal `_id` column). */
    idName: Option[String] = None) {

  def withId(name: String): Properties = copy(idName = Some(name))

  def idColumn: Column =
    col(idName.getOrElse(throw new IllegalArgumentException(
      "_id filter: no id column in scope (not a vertex traversal)")))

  def apply(name: String): PublicProperty =
    props.getOrElse(
      name,
      if (passthrough) PublicProperty(name, col(name))
      else throw new IllegalArgumentException(s"unknown public property '$name'"))

  def column(name: String): Column = apply(name).column

  /** Coerce a JSON-parsed literal to the property's declared type — the
    * plan-build-time literal rewrite the reference does via `Converter`
    * (traversal/Converter.scala:17-30). */
  def literal(name: String, value: Any): Column = {
    val p = apply(name)
    (p.dataType, value) match {
      case (TimestampType, s: String) => to_timestamp(lit(s))
      case (TimestampType, n: Number) => timestamp_millis(lit(n.longValue()))
      case (DateType, s: String) => to_date(lit(s))
      case (_: NumericType, s: String) => lit(s).cast(p.dataType)
      case (NullType, _) => lit(value) // untyped passthrough: Spark coerces
      case _ => lit(value).cast(p.dataType)
    }
  }

  def ++(other: Properties): Properties =
    Properties(props ++ other.props, passthrough || other.passthrough, other.idName.orElse(idName))
}

object Properties {
  /** Passthrough catalog: every name is its own column (the common case for
    * parquet-backed labels whose fields are already public). */
  val passthrough: Properties = Properties(Map.empty, passthrough = true)

  def apply(ps: PublicProperty*): Properties =
    Properties(ps.map(p => p.name -> p).toMap, passthrough = false)
}
