package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.json4s._

/**
 * Golden JSON rendering of query results — the rebuild of the reference's
 * `Output`/`Renderer` layer (reference: query/Aggregation.scala:201-216
 * empty → JsNull; :218-330 scalar shapes `{name: value}`; :383-397 +
 * :460-479 grouped shapes `{key: {subAggName: value}}` with JsNull
 * sub-results folded out of the merge; controllers/Renderer.scala for the
 * per-entity row renderer, e.g. core-test/.../ModernQuery.scala:22-29).
 *
 * Rendering is the API-payload step, inherently driver-side in the
 * reference too: its input is an aggregation result (one row per group,
 * `_size`-capped) or one page of a traversal — never the raw table. The
 * distributed path stays the DataFrame; this collects only the final,
 * already-reduced result.
 *
 * Key order is canonical = the DataFrame's row order (AggCompiler orders
 * groups by the group key ascending unless `_order` says otherwise), so
 * the rendered string is deterministic and cross-engine reproducible.
 */
object JsonRenderer {

  /** A traversal result as a JSON array, bounded: rows stream to the
    * driver one partition at a time (`toLocalIterator`, never a full
    * `collect`) and rendering FAILS once `cap` rows have been drawn —
    * an unpaginated list query large enough to hit the cap is an API
    * misuse (the reference defaults list outputs to the streamed source,
    * reference QueryExecutor.scala:39-45; the in-memory golden-JSON shape
    * is for pages and aggregates). No silent truncation: a capped result
    * rendered as-if-complete would be a wrong answer. A list genuinely
    * larger than any sane cap belongs on the streamed delivery path —
    * [[graft.query.QueryExecutor]]'s `executeStream` — not in one JSON
    * payload. */
  def renderRowsBounded(df: DataFrame, renderer: Row => JValue, cap: Long): JValue = {
    import scala.jdk.CollectionConverters._
    val it = df.limit(math.addExact(cap, 1L).toInt).toLocalIterator().asScala
    val buf = List.newBuilder[JValue]
    var n = 0L
    while (it.hasNext) {
      require(n < cap,
        s"list render exceeds $cap rows — page the query or use executeStream")
      buf += renderer(it.next()); n += 1
    }
    JArray(buf.result())
  }

  /** Default row renderer: every non-system column, in schema order. */
  def defaultRow(row: Row): JValue =
    JObject(row.schema.fields.iterator.zipWithIndex.collect {
      case (f, i) if !f.name.startsWith("_") => f.name -> toJson(row.get(i))
    }.toList)

  /** An aggregation result in the reference's golden shapes. */
  def renderAggregation(df: DataFrame, agg: Agg): JValue = agg match {
    case Agg.Count(name, _) =>
      // count on empty input emits 0, never JsNull (reference :319-330)
      JObject(List(name -> toJson(df.collect().head.get(0))))
    case s: Agg.Scalar =>
      // sum/avg/min/max coalesce to Output(null, JsNull) on empty input
      // (reference :231-239 and peers)
      df.collect().headOption.flatMap(r => Option(r.get(0))) match {
        case Some(v) => JObject(List(s.name -> toJson(v)))
        case None => JNull
      }
    case Agg.ByField(field, _, subs, _, _, _) =>
      val rows = df.collect()
      JObject(rows.iterator.map { r =>
        val key = Option(r.get(r.fieldIndex(field))).map(keyString).getOrElse("null")
        key -> subObject(r, subs)
      }.toList)
    case Agg.ByTime(field, _, _, _, subs, _) =>
      // time keys are epoch-millis strings (reference :430,:479 dateToKey)
      val rows = df.collect()
      JObject(rows.iterator.map { r =>
        keyString(r.get(r.fieldIndex(s"${field}_bucket"))) -> subObject(r, subs)
      }.toList)
  }

  /** One group's merged sub-aggregation object, exactly the reference's
    * per-group fold (Aggregation.scala:383-391, `acc ++ jsObject`):
    * - a scalar sub-result that rendered JsNull (empty/all-null slice) is
    *   omitted — non-JsObject results fold out of the merge;
    * - a NESTED `field`/`time` sub-agg contributes its own
    *   `{innerKey: innerObj}` entries DIRECTLY AS SIBLINGS of the scalar
    *   names (the inner aggregation's toJson is keyed by group key, not
    *   by agg name, and `++` splices it in — so the nested agg's `_name`
    *   never appears in the payload);
    * - on a (pathological) key collision the later entry wins at its
    *   first position, matching play-json `JsObject ++`. */
  private def subObject(r: Row, subs: Seq[Agg]): JValue = {
    val merged = new java.util.LinkedHashMap[String, JValue]
    subEntries(r, subs).foreach { case (k, v) => merged.put(k, v) }
    import scala.jdk.CollectionConverters._
    JObject(merged.asScala.toList)
  }

  private def subEntries(r: Row, subs: Seq[Agg]): List[(String, JValue)] =
    subs.flatMap {
      case Agg.Count(n, _) =>
        List(n -> toJson(Option(r.get(r.fieldIndex(n))).getOrElse(0L)))
      case s: Agg.Scalar =>
        Option(r.get(r.fieldIndex(s.name))).map(v => s.name -> toJson(v)).toList
      case nb: Agg.ByField =>
        nestedEntries(r, nb.name, nb.subs,
          e => Option(e.get(e.fieldIndex(nb.field))).map(keyString).getOrElse("null"))
      case nt: Agg.ByTime =>
        nestedEntries(r, nt.name, nt.subs,
          e => keyString(e.get(e.fieldIndex(s"${nt.field}_bucket"))))
    }.toList

  /** A nested agg's ordered `array<struct<key, subCols…>>` column →
    * `(innerKey, innerObj)` entries; a NULL array (parent group emptied by
    * the nested `_query` pre-filter) merges nothing, like the reference's
    * empty-group fold. Deeper nesting recurses through [[subEntries]]. */
  private def nestedEntries(r: Row, name: String, subs: Seq[Agg], key: Row => String): List[(String, JValue)] =
    Option(r.get(r.fieldIndex(name))) match {
      case None => Nil
      case Some(v) =>
        v.asInstanceOf[scala.collection.Seq[Row]].iterator
          .map(e => key(e) -> subObject(e, subs)).toList
    }

  /** Group keys stringify as the reference's `kv._1.toString`
    * (Aggregation.scala:397): integral doubles shed no precision, dates
    * become epoch millis (time buckets too, :430,:479 dateToKey). */
  private def keyString(v: Any): String = v match {
    case t: Timestamp => t.getTime.toString
    case t: java.time.LocalDateTime => // TIMESTAMP_NTZ buckets collect as LocalDateTime
      t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli.toString
    case other => other.toString
  }

  def toJson(v: Any): JValue = v match {
    case null => JNull
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case s: Short => JInt(BigInt(s.toInt))
    case b: Byte => JInt(BigInt(b.toInt))
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case d: BigDecimal => JDecimal(d)
    case s: String => JString(s)
    case t: Timestamp => JInt(BigInt(t.getTime)) // dates render as epoch millis
    case t: java.time.LocalDateTime => // TIMESTAMP_NTZ rows collect as LocalDateTime
      JInt(BigInt(t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
    case d: java.sql.Date => JString(d.toString)
    case seq: scala.collection.Seq[_] => JArray(seq.iterator.map(toJson).toList)
    case m: scala.collection.Map[_, _] =>
      JObject(m.iterator.map { case (k, x) => String.valueOf(k) -> toJson(x) }.toList)
    case row: Row =>
      JObject(row.schema.fields.iterator.zipWithIndex.map { case (f, i) => f.name -> toJson(row.get(i)) }.toList)
    case other => JString(other.toString)
  }

  def compact(j: JValue): String = org.json4s.jackson.JsonMethods.compact(j)
}
