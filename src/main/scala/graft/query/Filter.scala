package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._

/**
 * JSON filter grammar → Catalyst `Column` predicate — the rebuild of the
 * reference's runtime filter language (reference: query/Filter.scala:146-195).
 * Every combinator becomes a plain boolean Column, so the whole tree stays
 * inside whole-stage codegen and is pushed down to the parquet scan by
 * Catalyst (the reference needed a custom TinkerPop strategy for the same
 * effect, janus/.../IndexOptimizerStrategy.java:20-62).
 *
 * Grammar (JSON key → semantics, reference line refs):
 *  - `_and` / `_or` / `_not` / `_any`      (Filter.scala:48-92,147-152)
 *  - `_is` `_ne` `_lt` `_gt` `_lte` `_gte` (Filter.scala:105-110,153-164)
 *  - `_between` {_field,_from,_to}: [from, to)  (Filter.scala:112-113,174-176)
 *  - `_in` {_field,_values}                (Filter.scala:114,180-186)
 *  - `_startsWith` `_endsWith`             (Filter.scala:115-116,165-168)
 *  - `_like` / `_wildcard`: `*` affixes    (Filter.scala:122-129,188-191)
 *  - `_contains` field-name: existence     (Filter.scala:32-46,187)
 *  - `_id`                                 (Filter.scala:94-101,169-173)
 *  - bare `{field: value}`: equality (deprecated form, Filter.scala:192-194)
 */
object FilterParser {

  def parse(json: String, props: Properties): Column =
    fromJValue(org.json4s.jackson.JsonMethods.parse(json), props)

  def fromJValue(j: JValue, props: Properties): Column = j match {
    case JObject(fields) if fields.nonEmpty => parseObject(fields, props)
    case JObject(_) => lit(true)
    case other => throw new IllegalArgumentException(s"filter must be a JSON object, got $other")
  }

  private def parseObject(fields: List[JField], props: Properties): Column =
    fields.map { case (k, v) => parseOne(k, v, props) }.reduce(_ && _)

  private def parseOne(key: String, v: JValue, props: Properties): Column = key match {
    case "_and" => asArray(v).map(fromJValue(_, props)).reduce(_ && _)
    case "_or" => asArray(v).map(fromJValue(_, props)).reduce(_ || _)
    case "_not" => !fromJValue(v, props)
    case "_any" => lit(true)
    case "_is" => cmp(key, v, props)(_ <=> _)
    case "_ne" => cmp(key, v, props)((c, l) => !(c <=> l))
    case "_lt" => cmp(key, v, props)(_ < _)
    case "_gt" => cmp(key, v, props)(_ > _)
    case "_lte" => cmp(key, v, props)(_ <= _)
    case "_gte" => cmp(key, v, props)(_ >= _)
    case "_between" =>
      val (f, from, to) = (str(v \ "_field"), v \ "_from", v \ "_to")
      val c = props.column(f)
      c >= props.literal(f, value(from)) && c < props.literal(f, value(to))
    case "_in" =>
      val f = str(v \ "_field")
      val vs = asArray(v \ "_values").map(value)
      props.column(f).isin(vs: _*)
    case "_startsWith" => strCmp(key, v, props)((c, s) => c.startsWith(s))
    case "_endsWith" => strCmp(key, v, props)((c, s) => c.endsWith(s))
    case "_like" | "_wildcard" => strCmp(key, v, props)(likePattern)
    case "_contains" => props.column(str(v)).isNotNull
    case "_id" =>
      props.idColumn <=> lit(value(v \ "_id" match { case JNothing => v; case x => x }))
    case field if !field.startsWith("_") =>
      // deprecated bare {field: value} equality
      custom(props, field, "_is", value(v))
        .getOrElse(props.column(field) <=> props.literal(field, value(v)))
    case other => throw new IllegalArgumentException(s"unknown filter operator '$other'")
  }

  /** Reference `_like`/`_wildcard` semantics (query/Filter.scala:122-129):
    * only LEADING/TRAILING '*' are wildcards, interior '*' is literal, and
    * a pattern with no affix star is plain equality. SQL metacharacters in
    * the literal portion ('%', '_', '\') are escaped. */
  private[query] def likePattern(c: Column, pattern: String): Column = {
    val lead = pattern.startsWith("*")
    val trail = pattern.length > (if (lead) 1 else 0) && pattern.endsWith("*")
    if (!lead && !trail) c <=> lit(pattern)
    else {
      val core = pattern.substring(if (lead) 1 else 0, pattern.length - (if (trail) 1 else 0))
      val esc = core.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      c.like((if (lead) "%" else "") + esc + (if (trail) "%" else ""))
    }
  }

  /** Consult the property's custom filter builder, if declared (reference:
    * PropertyBuilder.scala:95-116 — a property may replace the default
    * predicate construction wholesale). */
  private def custom(props: Properties, field: String, op: String, v: Any): Option[Column] =
    props(field).customFilter.map(cf => cf(op, v))

  private def cmp(op: String, v: JValue, props: Properties)(std: (Column, Column) => Column): Column = {
    val (f, jv) = fieldValue(v)
    custom(props, f, op, value(jv)).getOrElse(std(props.column(f), props.literal(f, value(jv))))
  }

  private def strCmp(op: String, v: JValue, props: Properties)(std: (Column, String) => Column): Column = {
    val (f, jv) = fieldValue(v)
    custom(props, f, op, str(jv)).getOrElse(std(props.column(f), str(jv)))
  }

  private def fieldValue(v: JValue): (String, JValue) = v match {
    case JObject(List((f, jv))) if f != "_field" => (f, jv)
    case _ => (str(v \ "_field"), v \ "_value")
  }

  private[query] def asArray(v: JValue): List[JValue] = v match {
    case JArray(items) => items
    case other => List(other)
  }

  private[query] def str(v: JValue): String = v match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }

  /** JSON scalar → Scala value (typed-literal coercion happens later via
    * the property catalog). */
  private[query] def value(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => if (i.isValidLong) i.longValue else i.toString
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case JNull => null
    case other => throw new IllegalArgumentException(s"expected scalar, got $other")
  }
}
