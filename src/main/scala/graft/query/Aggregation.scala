package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

/**
 * JSON aggregation language → a single multi-aggregate `groupBy`
 * (reference: query/Aggregation.scala).
 *
 * The reference physically collects each group's elements and re-iterates
 * them once per sub-aggregation
 * (`group(key).unfold.sort.limit.project(subAggs).fold`,
 * Aggregation.scala:353-397) — fine row-at-a-time, fatal at scale. Here
 * every sub-aggregation is one aggregate expression over the same grouping,
 * so the whole tree is ONE shuffle with map-side partial aggregation, and a
 * sub-aggregation's `_query` pre-filter becomes a conditional aggregate
 * (`sum(when(pred, x))`) instead of a second pass.
 *
 * Determinism at scale: `sum`/`avg` over float/double columns accumulate in
 * DECIMAL(38,6) and cast back to double. Float addition is non-associative,
 * so a plain double sum depends on partitioning; exact decimal accumulation
 * makes the distributed result bit-stable regardless of partition count —
 * required for the oracle gate and the right default for a 1000-executor
 * deployment. min/max/count are order-insensitive and stay native.
 */
sealed trait Agg { def name: String }

object Agg {
  final case class Count(name: String, filter: Option[Column]) extends Agg
  /** kind ∈ sum|avg|min|max (reference: Aggregation.scala:218-313; empty
    * input → null output, which is Spark's native semantics too). */
  final case class Scalar(kind: String, field: String, name: String, filter: Option[Column]) extends Agg
  /** Group-by a property with nested sub-aggs, `_order`, `_size` top-k
    * (reference: FieldAggregation, Aggregation.scala:332-399). */
  final case class ByField(
      field: String,
      name: String,
      subs: Seq[Agg],
      order: Seq[String],
      size: Option[Int],
      filter: Option[Column])
      extends Agg
  /** Time-bucketed group-by (reference: TimeAggregation,
    * Aggregation.scala:401-480): s/m/h/d fixed-width epoch buckets; weeks
    * are MONDAY-anchored — the reference's roundToWeek shifts by +3 days
    * before flooring (Aggregation.scala:409-414), encoded here as
    * `offsetMs` in the interval — and calendar truncation for months/years
    * (:419-424, UTC-pinned here). `interval` = (widthMs, offsetMs). */
  final case class ByTime(field: String, name: String, interval: Option[(Long, Long)], calendarUnit: Option[String], subs: Seq[Agg], filter: Option[Column])
      extends Agg
}

object AggregationParser {
  import FilterParser.{asArray, str, value}

  private val intervalRe = """(\d+)([smhdwMy])""".r

  def parse(json: String, props: Properties): Agg =
    fromJValue(org.json4s.jackson.JsonMethods.parse(json), props)

  def fromJValue(j: JValue, props: Properties): Agg =
    fromJValue(j, props, FilterParser.defaultLeaf(props))

  /** Variant with a caller-supplied filter-leaf compiler, so `_query`
    * pre-filters on traversal-based properties get the same EXISTS
    * semantics as the `filter` step (the reference routes one
    * filterParser through both, Aggregation.scala:136-141,229-231). */
  def fromJValue(j: JValue, props: Properties, leaf: FilterParser.Leaf): Agg = {
    val filter = j \ "_query" match {
      case JNothing | JNull => None
      case q => Some(FilterParser.build(q, props, leaf))
    }
    def nameOr(default: String) = j \ "_name" match {
      case JString(s) => s
      case _ => default
    }
    str(j \ "_agg") match {
      case "count" => Agg.Count(nameOr("count"), filter)
      case kind @ ("sum" | "avg" | "min" | "max") =>
        val f = str(j \ "_field")
        Agg.Scalar(kind, f, nameOr(s"${kind}_$f"), filter)
      case "field" =>
        val f = str(j \ "_field")
        val subs = asArray(j \ "_select" match { case JNothing => JArray(Nil); case x => x }).map(fromJValue(_, props, leaf))
        val order = j \ "_order" match {
          case JNothing | JNull => Nil
          case o => asArray(o).map(str)
        }
        val size = j \ "_size" match {
          case JInt(n) => Some(n.toInt)
          case _ => None
        }
        Agg.ByField(f, nameOr(s"field_$f"), subs, order, size, filter)
      case "time" =>
        val f = str(j \ "_field")
        val subs = asArray(j \ "_select" match { case JNothing => JArray(Nil); case x => x }).map(fromJValue(_, props, leaf))
        val (iv, cal) = j \ "_interval" match {
          case JString(intervalRe(n, unit)) => intervalOf(n.toLong, unit)
          case JObject(_) =>
            val n = (j \ "_interval" \ "_interval") match { case JInt(i) => i.toLong; case _ => 1L }
            val unit = str(j \ "_interval" \ "_unit")
            intervalOf(n, chronoToLetter(unit))
          case other => throw new IllegalArgumentException(s"bad _interval: $other")
        }
        Agg.ByTime(f, nameOr(s"time_$f"), iv, cal, subs, filter)
      case other => throw new IllegalArgumentException(s"unknown _agg '$other'")
    }
  }

  /** `(n, unit letter)` → fixed (width ms, anchor offset ms) for s/m/h/d/w
    * or calendar unit for M/y. Interval grammar per reference
    * Aggregation.scala:36-63. Weeks carry a +3-day offset so buckets start
    * on MONDAY, matching the reference's roundToWeek shift
    * (Aggregation.scala:409-414; epoch day 0 is a Thursday). */
  private def intervalOf(n: Long, unit: String): (Option[(Long, Long)], Option[String]) = unit match {
    case "s" => (Some((n * 1000L, 0L)), None)
    case "m" => (Some((n * 60000L, 0L)), None)
    case "h" => (Some((n * 3600000L, 0L)), None)
    case "d" => (Some((n * 86400000L, 0L)), None)
    case "w" => (Some((n * 604800000L, 3L * 86400000L)), None)
    case "M" =>
      require(n == 1, "calendar month buckets support _interval=1 only")
      (None, Some("month"))
    case "y" =>
      require(n == 1, "calendar year buckets support _interval=1 only")
      (None, Some("year"))
    case other => throw new IllegalArgumentException(s"unknown interval unit '$other'")
  }

  private def chronoToLetter(u: String): String = u.toUpperCase match {
    case "SECONDS" => "s"; case "MINUTES" => "m"; case "HOURS" => "h"
    case "DAYS" => "d"; case "WEEKS" => "w"; case "MONTHS" => "M"; case "YEARS" => "y"
    case other => throw new IllegalArgumentException(s"unknown ChronoUnit '$other'")
  }
}

object AggCompiler {

  /** Compile and run an aggregation over a DataFrame. Output schema:
    * standalone count/scalar → one row, one column per agg name; `field` →
    * one row per group (key column keeps the field name); `time` → one row
    * per bucket (key column `<field>_bucket`, timestamp). */
  def apply(df: DataFrame, agg: Agg, props: Properties): DataFrame = agg match {
    case Agg.Count(name, f) =>
      filtered(df, f).agg(count(lit(1)).as(name))
    case s: Agg.Scalar =>
      filtered(df, s.filter).agg(scalarExpr(df, s, props))
    case Agg.ByField(field, _, subs, order, size, f) =>
      val key = props.column(field).as(field)
      val subExprs = subs.map(sub => subAggExpr(df, sub, props))
      // hidden count for "-count" ordering when no count sub-agg was declared
      val needCount = order.exists(o => o.stripPrefix("-").stripPrefix("+") == "count") &&
        !subs.exists { case Agg.Count(_, _) => true; case _ => false }
      val exprs = if (needCount) subExprs :+ count(lit(1)).as("__ocount") else subExprs
      val grouped =
        if (exprs.isEmpty) filtered(df, f).groupBy(key).agg(count(lit(1)).as("__drop")).drop("__drop")
        else filtered(df, f).groupBy(key).agg(exprs.head, exprs.tail: _*)
      val countName = subs.collectFirst { case Agg.Count(n, _) => n }.getOrElse("__ocount")
      val orderCols = order.map { o =>
        val (desc, raw) = if (o.startsWith("-")) (true, o.drop(1)) else (false, o.stripPrefix("+"))
        val c = if (raw == "count" || raw == "_count") col(countName) else col(raw)
        if (desc) c.desc_nulls_last else c.asc_nulls_first
      } :+ col(field).asc_nulls_first // deterministic tie-break on the group key
      val ordered = grouped.orderBy(orderCols: _*)
      val limited = size.fold(ordered)(ordered.limit)
      limited.drop("__ocount")
    case Agg.ByTime(field, _, iv, cal, subs, f) =>
      val ts = props.column(field)
      val bucketName = s"${field}_bucket"
      val bucket = (iv, cal) match {
        case (Some((d, off)), _) =>
          // anchored fixed windows: ts - ((epochMs + offset) mod d). pmod
          // keeps floor semantics for pre-1970 timestamps too — a
          // DELIBERATE divergence from the reference, whose truncating
          // Java % collapses all t+3d in (-1w, 1w) into one double-width
          // epoch-spanning bucket (Aggregation.scala:411-414). Bit-parity
          // holds for every t+offset >= 0; the pre-epoch floor is pinned
          // by oracle t09 and the QueryLanguageSpec divergence probe.
          // offset=3d for weeks yields the reference's Monday anchor.
          timestamp_millis(unix_millis(ts) - pmod(unix_millis(ts) + lit(off), lit(d))).as(bucketName)
        case (_, Some(unit)) => date_trunc(unit, ts).as(bucketName)
        case _ => throw new IllegalStateException("time aggregation without interval")
      }
      val subExprs = subs.map(sub => subAggExpr(df, sub, props))
      val grouped =
        if (subExprs.isEmpty) filtered(df, f).groupBy(bucket).agg(count(lit(1)).as("count"))
        else filtered(df, f).groupBy(bucket).agg(subExprs.head, subExprs.tail: _*)
      grouped.orderBy(col(bucketName).asc_nulls_first)
  }

  private def filtered(df: DataFrame, f: Option[Column]): DataFrame = f.fold(df)(df.where)

  /** A sub-aggregation as a single aggregate expression; its `_query`
    * pre-filter becomes a conditional aggregate — one pass, no re-grouping
    * (cf. reference's per-sub-agg re-iteration, Aggregation.scala:383-396). */
  private def subAggExpr(df: DataFrame, sub: Agg, props: Properties): Column = sub match {
    case Agg.Count(name, None) => count(lit(1)).as(name)
    case Agg.Count(name, Some(p)) => count(when(p, 1)).as(name)
    case s: Agg.Scalar => scalarExpr(df, s, props)
    case other => throw new IllegalArgumentException(s"unsupported nested aggregation: $other")
  }

  private def scalarExpr(df: DataFrame, s: Agg.Scalar, props: Properties): Column = {
    val c0 = props.column(s.field)
    val inner = s.filter match {
      case Some(p) => when(p, c0)
      case None => c0
    }
    val isFloating = scala.util.Try(df.select(c0).schema.head.dataType).toOption.exists {
      case DoubleType | FloatType => true
      case _ => false
    }
    val result = s.kind match {
      case "sum" if isFloating =>
        graft.functions.DuckDecimalCast.duckDouble(
          sum(graft.functions.DuckDecimalCast.duckDecimal6(inner.cast(DoubleType))))
      case "avg" if isFloating =>
        (graft.functions.DuckDecimalCast.duckDouble(
          sum(graft.functions.DuckDecimalCast.duckDecimal6(inner.cast(DoubleType)))) / count(inner))
      case "sum" => sum(inner)
      case "avg" => avg(inner)
      case "min" => min(inner)
      case "max" => max(inner)
      case other => throw new IllegalArgumentException(s"unknown scalar agg '$other'")
    }
    result.as(s.name)
  }
}
