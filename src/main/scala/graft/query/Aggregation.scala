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
  import org.apache.spark.sql.expressions.Window

  /** Compile and run an aggregation over a DataFrame. Output schema:
    * standalone count/scalar → one row, one column per agg name; `field` →
    * one row per group (key column keeps the field name); `time` → one row
    * per bucket (key column `<field>_bucket`, timestamp). A NESTED
    * `field`/`time` sub-aggregation (the reference's grammar is recursive,
    * Aggregation.scala:151,167: `_select` may itself contain `field`/`time`
    * aggs, each re-run per group at :369-384) becomes one extra column per
    * nested agg holding an ORDERED `array<struct<key, subCols…>>` — its
    * groups honoring the nested `_order`/`_size` WITHIN each parent group.
    *
    * Scale shape: where the reference collects each group's elements and
    * re-traverses them once per nested agg (quadratic in fan-out, driver
    * lists), here every nesting level is ONE `groupBy` over
    * (parentKeys…, ownKey) — a single shuffle with map-side partials —
    * followed by a per-parent `row_number` window (top-k inside the
    * nested shuffle partition, no global sort) and a `collect_list`
    * collapse whose payload is the already-reduced per-group row, never
    * the input rows. The collapse joins back to the parent on the group
    * keys; both sides are post-aggregation (≤ one row per group), so at
    * 100 TB the join operands are |groups|-sized, not |rows|-sized. */
  def apply(df: DataFrame, agg: Agg, props: Properties): DataFrame = agg match {
    case Agg.Count(name, f) =>
      filtered(df, f).agg(count(lit(1)).as(name))
    case s: Agg.Scalar =>
      filtered(df, s.filter).agg(scalarExpr(df, s, props))
    case Agg.ByField(field, _, subs, order, size, f) =>
      val grouped = groupedWithSubs(
        filtered(df, f), Nil, field -> props.column(field), subs,
        needOrderCount(order, subs), emptyDefault = None, props)
      val ordered = grouped.orderBy(orderCols(order, field, countName(subs)): _*)
      size.fold(ordered)(ordered.limit).drop("__ocount")
    case Agg.ByTime(field, _, iv, cal, subs, f) =>
      val bucketName = s"${field}_bucket"
      val grouped = groupedWithSubs(
        filtered(df, f), Nil, bucketName -> timeBucket(props.column(field), iv, cal),
        subs, needCount = false, emptyDefault = Some("count"), props)
      grouped.orderBy(col(bucketName).asc_nulls_first)
  }

  /** Anchored fixed windows: ts - ((epochMs + offset) mod d). pmod keeps
    * floor semantics for pre-1970 timestamps too — a DELIBERATE divergence
    * from the reference, whose truncating Java % collapses all t+3d in
    * (-1w, 1w) into one double-width epoch-spanning bucket
    * (Aggregation.scala:411-414). Bit-parity holds for every
    * t+offset >= 0; the pre-epoch floor is pinned by oracle t09 and the
    * QueryLanguageSpec divergence probe. offset=3d for weeks yields the
    * reference's Monday anchor. Calendar months/years truncate in the
    * session zone (engine sessions pin UTC) — `date_trunc` is also the
    * only bucket form valid on a TIMESTAMP_NTZ column (fixed-width needs
    * `unix_millis`, which requires an instant; conform the column via
    * [[graft.model.Conform]] to use interval buckets). */
  private def timeBucket(ts: Column, iv: Option[(Long, Long)], cal: Option[String]): Column =
    (iv, cal) match {
      case (Some((d, off)), _) =>
        timestamp_millis(unix_millis(ts) - pmod(unix_millis(ts) + lit(off), lit(d)))
      case (_, Some(unit)) => date_trunc(unit, ts)
      case _ => throw new IllegalStateException("time aggregation without interval")
    }

  /** Hidden count needed for "-count" ordering when no count sub-agg was
    * declared. */
  private def needOrderCount(order: Seq[String], subs: Seq[Agg]): Boolean =
    order.exists(o => o.stripPrefix("-").stripPrefix("+") == "count") &&
      !subs.exists { case Agg.Count(_, _) => true; case _ => false }

  private def countName(subs: Seq[Agg]): String =
    subs.collectFirst { case Agg.Count(n, _) => n }.getOrElse("__ocount")

  /** `_order` spec → sort columns, with a deterministic tie-break on the
    * group key (the reference's group order is JVM-map order —
    * nondeterministic; canonical ascending key is this engine's pinned
    * choice, same at every nesting level). */
  private def orderCols(order: Seq[String], keyName: String, cntName: String): Seq[Column] =
    order.map { o =>
      val (desc, raw) = if (o.startsWith("-")) (true, o.drop(1)) else (false, o.stripPrefix("+"))
      val c = if (raw == "count" || raw == "_count") col(cntName) else col(raw)
      if (desc) c.desc_nulls_last else c.asc_nulls_first
    } :+ col(keyName).asc_nulls_first

  /** One grouping level: `groupBy(parents…, key)` with every scalar
    * sub-agg as one aggregate expression, plus one ordered-array column
    * per nested `field`/`time` sub-agg (computed one level deeper and
    * joined back on the group keys, null-safely — a null group key still
    * owns its nested slice). `emptyDefault` preserves the grammar's
    * empty-`_select` shapes: a bare `time` agg emits a default `count`
    * column; a bare `field` agg emits key-only rows.
    *
    * SINGLE-SCAN nesting: when a nested sub has no `_query` pre-filter,
    * this level's own scalar aggregates are not computed by a separate
    * pass over the base — they ride the nested level's `groupBy` as
    * two-phase PARTIALS (`__op*` columns) and are finalized as WINDOW
    * aggregates over the parent-key partition inside the collapse's own
    * window stage ([[partialize]]; decimal accumulation keeps float sums
    * exact across the re-aggregation, and the totals are computed BEFORE
    * the `_size` cut so dropped inner groups still count). One chain, so
    * a field-in-field dashboard aggregation reads the corpus ONCE and
    * shuffles twice — (keys, innerKey) then (keys) — total (gated in
    * PlanQualitySpec; a separate re-aggregation branch was tried first
    * and lost the shared scan to per-branch column pruning). A scalar
    * kind the two-phase form can't reproduce bit-exactly (decimal-typed
    * sums, integral avg) falls back to the dedicated pass, as does an
    * output-name collision with the host's own columns. `extraPartials`
    * is the recursion vehicle: the parent's partials attach to THIS
    * level's groupBy (one level only — no partials-of-partials). */
  private def groupedWithSubs(
      base: DataFrame,
      parents: Seq[String],
      key: (String, Column),
      subs: Seq[Agg],
      needCount: Boolean,
      emptyDefault: Option[String],
      props: Properties,
      extraPartials: Seq[Column] = Nil): DataFrame = {
    val (keyName, keyCol) = key
    require(!parents.contains(keyName),
      s"nested aggregation key '$keyName' collides with an enclosing group key")
    // materialize the (possibly computed — a time bucket, a renamed
    // property) group key as a real column so the nested recursion can
    // re-group the same base by name; a narrow projection, no extra pass
    val withKey = base.withColumn(keyName, keyCol)
    val groupKeys = parents :+ keyName
    val nested = subs.collect { case n @ (_: Agg.ByField | _: Agg.ByTime) => n }
    val scalarSubs: Seq[Agg] = subs.collect { case c: Agg.Count => c: Agg; case s: Agg.Scalar => s: Agg } ++
      (if (needCount) Seq(Agg.Count("__ocount", None)) else Nil)

    def innerTable(n: Agg, extras: Seq[Column]): DataFrame = {
      val nname = nestedKeyName(n, groupKeys)
      val (nkey, nsubs, norder) = n match {
        case Agg.ByField(field, _, ss, order, _, _) => ((nname, props.column(field)), ss, order)
        case Agg.ByTime(field, _, iv, cal, ss, _) =>
          ((nname, timeBucket(props.column(field), iv, cal)), ss, Seq.empty[String])
        case other => throw new IllegalArgumentException(s"not a grouping aggregation: $other")
      }
      groupedWithSubs(filtered(withKey, nestedFilter(n)), groupKeys, nkey, nsubs,
        needOrderCount(norder, nsubs), emptyDefault = None, props, extras)
    }

    // host delegation: an unfiltered nested sub whose level-1 groupBy can
    // carry every scalar as an exact two-phase partial. A level that is
    // itself hosting a PARENT's partials takes the direct path — partials
    // ride one level only; composing partials-of-partials is where exact
    // float semantics would quietly break. `_size <= 0` (a pathological
    // empty cap) also disqualifies: the spine would lose the group keys.
    val hostPlan: Option[(Agg, Seq[(Seq[Column], (Column => Column) => Column)])] =
      if (extraPartials.nonEmpty) None
      else nested.find(n => nestedFilter(n).isEmpty && nestedSize(n).forall(_ > 0)).flatMap { h =>
        val ps = scalarSubs.zipWithIndex.map { case (sc, i) => partialize(withKey, sc, props, i) }
        if (ps.forall(_.isDefined)) Some((h, ps.map(_.get))) else None
      }

    val inner: Seq[(Agg, DataFrame)] = nested.map { n =>
      val extras = hostPlan match {
        case Some((h, ps)) if h eq n => ps.flatMap(_._1)
        case _ => Nil
      }
      n -> innerTable(n, extras)
    }

    // output-name collision between this level's scalars and the host's
    // own columns would corrupt the spine — fall back to the direct pass
    val safeHost = hostPlan.filter { case (h, _) =>
      val hostCols = inner.collectFirst { case (n, df) if n eq h => df }.get.columns.toSet
      scalarSubs.map(_.name).forall(!hostCols.contains(_))
    }

    val (outer, hosted): (DataFrame, Option[Agg]) = safeHost match {
      case Some((h, ps)) =>
        // the host's collapse IS the outer spine: scalars finalize as
        // window aggregates over the parent-key partition the collapse
        // already shuffles on — no second pass over anything
        val hostDf = inner.collectFirst { case (n, df) if n eq h => df }.get
        (collapseNested(hostDf, groupKeys, h, scalarSubs.map(_.name).zip(ps.map(_._2))), Some(h))
      case None =>
        val scalarExprs = scalarSubs.map(sc => subAggExpr(withKey, sc, props)) ++ extraPartials
        val exprs =
          if (scalarExprs.nonEmpty) scalarExprs
          else if (nested.isEmpty && emptyDefault.isDefined) Seq(count(lit(1)).as(emptyDefault.get))
          else Seq(count(lit(1)).as("__drop"))
        (withKey.groupBy(groupKeys.map(col): _*).agg(exprs.head, exprs.tail: _*).drop("__drop"), None)
    }
    nested.foldLeft(outer) { case (acc, n) =>
      if (hosted.exists(_ eq n)) acc // already the spine
      else {
        val collapsed = collapseNested(inner.collectFirst { case (m, df) if m eq n => df }.get, groupKeys, n)
        joinNested(acc, collapsed, groupKeys)
      }
    }
  }

  /** The canonical grouping-column name a nested agg presents to the
    * renderer (`<field>` / `<field>_bucket`). */
  private def nestedKeyBase(n: Agg): String = n match {
    case Agg.ByField(field, _, _, _, _, _) => field
    case Agg.ByTime(field, _, _, _, _, _) => s"${field}_bucket"
    case other => throw new IllegalArgumentException(s"not a grouping aggregation: $other")
  }

  /** The WORKING grouping-column name for one nesting level: the grammar
    * is recursive over the same fields (time-in-time drill-downs group
    * `ts_bucket` inside `ts_bucket`), so a nested key colliding with an
    * enclosing group key is uniquified here and aliased BACK to the
    * canonical name inside the emitted struct by [[collapseNested]] —
    * the rendered shape never shows the disambiguation. */
  private def nestedKeyName(n: Agg, parents: Seq[String]): String = {
    val base = nestedKeyBase(n)
    if (!parents.contains(base)) base
    else Iterator.from(2).map(i => s"${base}__$i").find(!parents.contains(_)).get
  }

  private def nestedSize(n: Agg): Option[Int] = n match {
    case Agg.ByField(_, _, _, _, size, _) => size
    case _ => None
  }

  private def nestedFilter(n: Agg): Option[Column] = n match {
    case Agg.ByField(_, _, _, _, _, f) => f
    case Agg.ByTime(_, _, _, _, _, f) => f
    case _ => None
  }

  /** Exact two-phase split of a scalar sub-agg: `(partial exprs over rows,
    * final-expr builder over the partial columns)`. The builder takes a
    * LIFT applied to each aggregate call so the same finalization runs as
    * a plain `groupBy` aggregate (lift = identity) or as a window
    * aggregate over the parent partition (lift = `.over(w)`). Returns
    * None when the split cannot reproduce the single-phase result
    * bit-exactly. */
  private def partialize(df: DataFrame, s: Agg, props: Properties, idx: Int)
      : Option[(Seq[Column], (Column => Column) => Column)] = {
    import graft.functions.DuckDecimalCast.{duckDecimal6, duckDouble}
    def p(tag: String) = s"__op${idx}_$tag"
    s match {
      case Agg.Count(name, f) =>
        val partial = f.fold(count(lit(1)))(pred => count(when(pred, 1))).as(p("c"))
        Some((Seq(partial), lift => lift(sum(col(p("c")))).as(name)))
      case Agg.Scalar(kind, field, name, f) =>
        val c0 = props.column(field)
        val inner = f.fold(c0)(pred => when(pred, c0))
        val dt = scala.util.Try(df.select(c0).schema.head.dataType).toOption
        val isFloating = dt.exists { case DoubleType | FloatType => true; case _ => false }
        val isIntegral = dt.exists { case LongType | IntegerType | ShortType | ByteType => true; case _ => false }
        kind match {
          case "min" =>
            Some((Seq(min(inner).as(p("m"))), lift => lift(min(col(p("m")))).as(name)))
          case "max" =>
            Some((Seq(max(inner).as(p("m"))), lift => lift(max(col(p("m")))).as(name)))
          case "sum" if isFloating =>
            Some((Seq(sum(duckDecimal6(inner.cast(DoubleType))).as(p("s"))),
              lift => duckDouble(lift(sum(col(p("s"))))).as(name)))
          case "sum" if isIntegral =>
            Some((Seq(sum(inner).as(p("s"))), lift => lift(sum(col(p("s")))).as(name)))
          case "avg" if isFloating =>
            Some((Seq(sum(duckDecimal6(inner.cast(DoubleType))).as(p("s")), count(inner).as(p("n"))),
              lift => (duckDouble(lift(sum(col(p("s"))))) / lift(sum(col(p("n"))))).as(name)))
          case _ => None // decimal sums, integral avg: single-phase only
        }
      case _ => None
    }
  }

  /** Attach one nested agg's ordered-array column to the parent grouping.
    * Null-safe equi-join on the full parent key tuple; LEFT so a parent
    * group whose nested `_query` pre-filter removed every row renders the
    * reference's empty merge (Aggregation.scala:383-391). */
  private def joinNested(parent: DataFrame, arr: DataFrame, parentKeys: Seq[String]): DataFrame = {
    val renamed = parentKeys.zipWithIndex.foldLeft(arr) {
      case (d, (k, i)) => d.withColumnRenamed(k, s"__jk$i")
    }
    val cond = parentKeys.zipWithIndex.map { case (k, i) => parent(k) <=> renamed(s"__jk$i") }
      .reduce(_ && _)
    parent.join(renamed, cond, "left").drop(parentKeys.indices.map(i => s"__jk$i"): _*)
  }

  /** A nested agg's group table → `(parentKeys…, name)` where `name`
    * holds `array<struct<key, subCols…>>` ordered by the nested `_order`
    * (`_size`-capped) — `row_number` per parent group, `array_sort` on a
    * leading rank field, then the rank (and any `__o*` carrier columns:
    * the hidden order count and the host partials) is projected out.
    *
    * `parentScalars` (host-spine mode): the PARENT level's scalar finals,
    * computed as whole-partition window aggregates over the same
    * parent-key shuffle the rank window uses — BEFORE the `_size` cut, so
    * inner groups the cap drops still count — and carried through the
    * final groupBy with `first` (they are partition constants). The
    * result then serves as the parent's output spine directly. */
  private def collapseNested(
      grouped: DataFrame,
      parentKeys: Seq[String],
      n: Agg,
      parentScalars: Seq[(String, (Column => Column) => Column)] = Nil): DataFrame = {
    val (order, size, subs) = n match {
      case Agg.ByField(_, _, ss, order, size, _) => (order, size, ss)
      case Agg.ByTime(_, _, _, _, ss, _) => (Seq.empty[String], Option.empty[Int], ss)
      case other => throw new IllegalArgumentException(s"not a grouping aggregation: $other")
    }
    val keyName = nestedKeyName(n, parentKeys)
    val wAll = Window.partitionBy(parentKeys.map(col): _*)
    val withTotals =
      if (parentScalars.isEmpty) grouped
      else grouped.select(grouped.columns.map(col) ++ parentScalars.map { case (_, f) => f(c => c.over(wAll)) }: _*)
    val w = wAll.orderBy(orderCols(order, keyName, countName(subs)): _*)
    val ranked = withTotals.withColumn("__rn", row_number().over(w))
    val limited = size.fold(ranked)(s => ranked.where(col("__rn") <= s))
    val scalarNames = parentScalars.map(_._1).toSet
    val dataCols = limited.columns.filterNot(c =>
      parentKeys.contains(c) || c == "__rn" || c == "__ocount" || c.startsWith("__op") ||
        scalarNames.contains(c)).toSeq
    val aggs = array_sort(collect_list(struct((col("__rn") +: dataCols.map(col)): _*))).as("__arr") +:
      parentScalars.map { case (nm, _) => first(col(nm)).as(nm) }
    limited
      .groupBy(parentKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(n.name, transform(col("__arr"), e => struct(dataCols.map(c =>
        // alias a disambiguated working key back to its canonical name —
        // struct fields are namespaced, so the collision that forced the
        // rename cannot recur inside the array element
        e.getField(c).as(if (c == keyName) nestedKeyBase(n) else c)): _*)))
      .drop("__arr")
  }

  private def filtered(df: DataFrame, f: Option[Column]): DataFrame = f.fold(df)(df.where)

  /** A scalar sub-aggregation as a single aggregate expression; its
    * `_query` pre-filter becomes a conditional aggregate — one pass, no
    * re-grouping (cf. reference's per-sub-agg re-iteration,
    * Aggregation.scala:383-396). Nested `field`/`time` sub-aggs are not
    * single expressions — they take the [[collapsedNested]] path. */
  private def subAggExpr(df: DataFrame, sub: Agg, props: Properties): Column = sub match {
    case Agg.Count(name, None) => count(lit(1)).as(name)
    case Agg.Count(name, Some(p)) => count(when(p, 1)).as(name)
    case s: Agg.Scalar => scalarExpr(df, s, props)
    case other => throw new IllegalArgumentException(
      s"nested grouping aggregation '${other.name}' must be compiled via groupedWithSubs, not as a column")
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
