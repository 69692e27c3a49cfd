package graft.query

import org.apache.spark.sql.Column
import org.json4s._

/**
 * JSON sort spec → ordered Column list (reference: query/InputSort.scala:13-47).
 * Accepts `[{"field": "asc"|"desc"}, ...]`, `"+field"`, `"-field"`, `"field"`.
 * Null ordering matches the reference's null-tolerant comparators
 * (janus/.../OrderAcceptNullStrategy.java): nulls first on asc, last on desc.
 */
object SortParser {

  def parse(json: String, props: Properties): Seq[Column] =
    fromJValue(org.json4s.jackson.JsonMethods.parse(json), props)

  def fromJValue(j: JValue, props: Properties): Seq[Column] =
    FilterParser.asArray(j).flatMap {
      case JString(s) => Seq(fromString(s, props))
      case JObject(fields) =>
        fields.map {
          case (f, JString(dir)) => order(props.column(f), dir != "desc" && dir != "decr")
          case (f, other) => throw new IllegalArgumentException(s"bad sort direction for $f: $other")
        }
      case other => throw new IllegalArgumentException(s"bad sort entry: $other")
    }

  private def fromString(s: String, props: Properties): Column = s match {
    case _ if s.startsWith("-") => order(props.column(s.drop(1)), asc = false)
    case _ if s.startsWith("+") => order(props.column(s.drop(1)), asc = true)
    case _ => order(props.column(s), asc = true)
  }

  private def order(c: Column, asc: Boolean): Column =
    if (asc) c.asc_nulls_first else c.desc_nulls_last
}
