package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.query.{AggCompiler, AggregationParser, JsonRenderer, Properties}

/**
 * Property test for the recursive aggregation grammar (reference:
 * Aggregation.scala:151,167 — `_select` nests `field`/`time` aggs):
 * randomly generated aggregation trees (depth ≤ 3, mixed scalar subs,
 * `_query` pre-filters, `_order`/`_size` caps, field and time keys, null
 * group keys) are compiled by [[AggCompiler]], rendered by
 * [[JsonRenderer]], and compared byte-for-byte against an INDEPENDENT
 * in-memory evaluator implementing the documented semantics directly on
 * Scala collections. This is the regression net for the single-scan
 * host-delegation path and all its fallbacks (filtered nested subs,
 * non-partializable scalars, hidden order counts): whichever branch a
 * random tree takes, the rendered payload must be identical.
 *
 * Exactness: `v` values are multiples of 0.25, so the compiled DECIMAL(38,6)
 * accumulation and the evaluator's BigDecimal(scale 6) sums are both exact
 * and convert to the same doubles.
 */
object NestedAggPropertySpec {
  /** File-level so Spark's product encoder needs no outer scope. */
  final case class T(tid: Long, k1: Option[String], k2: Option[String],
      ts: Timestamp, v: Option[Double], n: Option[Long])
}

class NestedAggPropertySpec extends SparkSpec {
  import NestedAggPropertySpec.T

  // ~3 months of timestamps: distinct days, weeks, and calendar months
  private val t0 = 1577836800000L // 2020-01-01T00:00Z
  private val rows: Seq[T] = {
    val k1s = Seq(Some("a"), Some("b"), Some("c"), None)
    val k2s = Seq(Some("x"), Some("y"), Some("z"), Some("w"), None)
    (0 until 120).map { i =>
      T(i.toLong,
        k1s(i % k1s.size),
        k2s((i / 2) % k2s.size),
        new Timestamp(t0 + (i.toLong * 19L % 90L) * 86400000L + (i % 24) * 3600000L),
        if (i % 7 == 3) None else Some(((i * 13) % 40) * 0.25 - 2.0),
        if (i % 11 == 5) None else Some(((i * 7) % 17).toLong - 3L))
    }
  }

  private lazy val df: DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  // ------------------------------------------------------- tree generators

  private def obj(kv: (String, JValue)*): JValue = JObject(kv.toList)

  private val fresh = new java.util.concurrent.atomic.AtomicInteger(0)
  private def name(): String = "s" + fresh.incrementAndGet()

  private val filterGen: Gen[Option[JValue]] = Gen.frequency(
    3 -> Gen.const(None),
    1 -> (for {
      (f, lo, hi) <- Gen.oneOf(("v", -2.0, 8.0), ("n", -3.0, 13.0))
      op <- Gen.oneOf("_gt", "_lt", "_gte", "_lte")
      x <- Gen.choose(lo, hi).map(d => math.round(d * 4) / 4.0)
    } yield Some(obj(op -> obj(f -> JDouble(x))))))

  private val scalarGen: Gen[JValue] = for {
    kind <- Gen.oneOf("count", "sum", "avg", "min", "max")
    field <- Gen.oneOf("v", "n")
    f <- filterGen
  } yield {
    val base = List("_agg" -> JString(kind), "_name" -> JString(name())) ++
      (if (kind == "count") Nil else List("_field" -> JString(field))) ++
      f.map("_query" -> _).toList
    JObject(base)
  }

  /** A grouping node; `keys` = FIELD group keys already used on this path
    * (kept unique in generated specs). Time nodes recur freely — the
    * grammar's time-in-time drill-down is legal and the compiler
    * disambiguates the colliding `ts_bucket` working names itself. */
  private def groupGen(depth: Int, keys: Set[String]): Gen[JValue] = {
    val fieldChoices = Seq("k1", "k2").filterNot(keys)
    for {
      useTime <- if (fieldChoices.nonEmpty) Gen.oneOf(false, true) else Gen.const(true)
      node <- if (useTime) timeNode(depth, keys) else fieldNode(depth, fieldChoices, keys)
    } yield node
  }

  private def subsGen(depth: Int, keys: Set[String]): Gen[List[JValue]] = for {
    nScalar <- Gen.choose(0, 2)
    scalars <- Gen.listOfN(nScalar, scalarGen)
    withNested <- if (depth > 0) Gen.frequency(1 -> false, 2 -> true) else Gen.const(false)
    nested <- if (withNested) groupGen(depth - 1, keys).map(List(_)) else Gen.const(Nil)
  } yield scalars ++ nested

  private def fieldNode(depth: Int, choices: Seq[String], keys: Set[String]): Gen[JValue] = for {
    f <- Gen.oneOf(choices)
    subs <- subsGen(depth, keys + f)
    f0 <- filterGen
    order <- Gen.oneOf(None, Some("+"), Some("-"), Some("c+"), Some("c-"))
    size <- Gen.oneOf[Option[Int]](None, Some(1), Some(2), Some(3))
  } yield {
    val orderJ = order.map {
      case "+" => JArray(List(JString(f)))
      case "-" => JArray(List(JString(s"-$f")))
      case "c+" => JArray(List(JString("count")))
      case "c-" => JArray(List(JString("-count")))
    }
    JObject(List("_agg" -> JString("field"), "_field" -> JString(f),
      "_name" -> JString(name()),
      "_select" -> JArray(subs)) ++
      orderJ.map("_order" -> _).toList ++
      size.map(s => "_size" -> JInt(BigInt(s))).toList ++
      f0.map("_query" -> _).toList)
  }

  private def timeNode(depth: Int, keys: Set[String]): Gen[JValue] = for {
    iv <- Gen.oneOf("1d", "1w", "1M")
    subs <- subsGen(depth, keys)
    f0 <- filterGen
  } yield JObject(List("_agg" -> JString("time"), "_field" -> JString("ts"),
    "_name" -> JString(name()),
    "_interval" -> JString(iv),
    "_select" -> JArray(subs)) ++ f0.map("_query" -> _).toList)

  // ------------------------------------------- independent reference eval

  private def rowVal(r: T, f: String): Option[Double] = f match {
    case "v" => r.v
    case "n" => r.n.map(_.toDouble)
    case other => fail(s"unexpected field $other")
  }

  /** TRUE-only filter semantics, mirroring FilterParser's leaves. */
  private def passes(r: T, f: JValue): Boolean = f match {
    case JObject(List((op, JObject(List((field, jv)))))) =>
      val x = jv match { case JDouble(d) => d; case JInt(i) => i.toDouble; case o => fail(s"lit $o") }
      rowVal(r, field).exists { c =>
        op match {
          case "_gt" => c > x; case "_lt" => c < x
          case "_gte" => c >= x; case "_lte" => c <= x
          case o => fail(s"op $o")
        }
      }
    case other => fail(s"unexpected filter $other")
  }

  private def filteredRows(rs: Seq[T], j: JValue): Seq[T] = j \ "_query" match {
    case JNothing | JNull => rs
    case q => rs.filter(passes(_, q))
  }

  private def dec6(d: Double): BigDecimal =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** One scalar sub over a group's rows → optional (name, json). */
  private def evalScalar(rs: Seq[T], j: JValue): Option[(String, JValue)] = {
    val nm = (j \ "_name").asInstanceOf[JString].s
    val kind = (j \ "_agg").asInstanceOf[JString].s
    val in = filteredRows(rs, j)
    if (kind == "count") return Some(nm -> JInt(BigInt(in.size)))
    val field = (j \ "_field").asInstanceOf[JString].s
    val isLong = field == "n"
    val vals = in.flatMap(rowVal(_, field))
    if (vals.isEmpty) return None
    val json = kind match {
      case "sum" if isLong => JInt(BigInt(vals.map(_.toLong).sum))
      case "sum" => JDouble(vals.map(dec6).sum.toDouble)
      case "avg" if isLong => JDouble(vals.sum / vals.size) // exact small ints
      case "avg" => JDouble(vals.map(dec6).sum.toDouble / vals.size)
      case "min" if isLong => JInt(BigInt(vals.map(_.toLong).min))
      case "min" => JDouble(vals.min)
      case "max" if isLong => JInt(BigInt(vals.map(_.toLong).max))
      case "max" => JDouble(vals.max)
      case o => fail(s"kind $o")
    }
    Some(nm -> json)
  }

  private def subEntries(rs: Seq[T], subs: Seq[JValue]): List[(String, JValue)] =
    subs.flatMap { s =>
      (s \ "_agg").asInstanceOf[JString].s match {
        case "field" | "time" =>
          evalGroup(rs, s) match { case JObject(fields) => fields; case _ => Nil }
        case _ => evalScalar(rs, s).toList
      }
    }.toList

  private def bucketMs(ms: Long, iv: String): Long = iv match {
    case "1d" => ms - Math.floorMod(ms, 86400000L)
    case "1w" => ms - Math.floorMod(ms + 3L * 86400000L, 604800000L)
    case "1M" =>
      val d = java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
      d.toLocalDate.withDayOfMonth(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    case o => fail(s"interval $o")
  }

  /** A grouping agg over rows → the reference's `{key: mergedSubs}`. */
  private def evalGroup(rs0: Seq[T], j: JValue): JValue = {
    val rs = filteredRows(rs0, j)
    val subs = (j \ "_select" match { case JArray(l) => l; case _ => Nil })
    (j \ "_agg").asInstanceOf[JString].s match {
      case "time" =>
        val iv = (j \ "_interval").asInstanceOf[JString].s
        val groups = rs.groupBy(r => bucketMs(r.ts.getTime, iv)).toSeq.sortBy(_._1)
        // a bare time agg renders {} per bucket (the reference's empty
        // flatProject merge) — the compiled df's default count column is
        // the TABULAR shape only, it never reaches the JSON payload
        JObject(groups.map { case (b, g) =>
          b.toString -> JObject(subEntries(g, subs))
        }.toList)
      case "field" =>
        val field = (j \ "_field").asInstanceOf[JString].s
        def keyOf(r: T) = if (field == "k1") r.k1 else r.k2
        val groups = rs.groupBy(keyOf).toSeq
        // ordering: the declared _order (key or count), then ascending key
        // with nulls first — the compiler's canonical tie-break
        val countName = subs.collectFirst {
          case s if (s \ "_agg") == JString("count") => s
        }
        def groupCount(g: Seq[T]) = countName match {
          case Some(c) => filteredRows(g, c).size
          case None => g.size
        }
        implicit val keyOrd: Ordering[Option[String]] =
          Ordering.Option(Ordering.String) // None first
        val order = j \ "_order" match {
          case JArray(List(JString(o))) => Some(o)
          case _ => None
        }
        val sorted = order match {
          case Some(o) if o.stripPrefix("-").stripPrefix("+") == "count" =>
            val desc = o.startsWith("-")
            groups.sortBy { case (k, g) => ((if (desc) -1 else 1) * groupCount(g), k) }
          case Some(o) if o.startsWith("-") =>
            groups.sortBy(_._1)(keyOrd.reverse) // desc: nulls last (reverse of nulls-first asc)
          case _ => groups.sortBy(_._1)
        }
        val limited = j \ "_size" match {
          case JInt(s) => sorted.take(s.toInt)
          case _ => sorted
        }
        JObject(limited.map { case (k, g) =>
          k.getOrElse("null") -> JObject(subEntries(g, subs))
        }.toList)
      case o => fail(s"agg $o")
    }
  }

  // ----------------------------------------------------------------- test

  /** Attach a deterministic `_query` pre-filter to every NESTED (depth>0)
    * field/time node that lacks one. A filtered nested sub is exactly the
    * host-delegation disqualifier (Aggregation.scala `groupedWithSubs`:
    * hostPlan requires `nestedFilter(n).isEmpty`), so trees rewritten this
    * way are guaranteed to exercise the dedicated re-aggregation fallback
    * rather than the single-scan partials path — the branch the plain
    * random mix only hits occasionally. */
  private def forceInnerFilters(j: JValue, depth: Int, salt: Int): JValue = j match {
    case JObject(fields) =>
      val isGroup = fields.collectFirst { case ("_agg", JString(k)) => k }
        .exists(k => k == "field" || k == "time")
      val hasQuery = fields.exists(_._1 == "_query")
      val recursed = fields.map {
        case ("_select", JArray(subs)) =>
          "_select" -> JArray(subs.zipWithIndex.map { case (s, i) =>
            forceInnerFilters(s, depth + 1, salt * 31 + i)
          })
        case other => other
      }
      val injected =
        if (isGroup && depth > 0 && !hasQuery) {
          val x = ((math.abs(salt) % 24) - 4) * 0.25 // mix of thresholds incl. row-dropping ones
          recursed :+ ("_query" -> obj("_gte" -> obj("v" -> JDouble(x))))
        } else recursed
      JObject(injected)
    case other => other
  }

  private def hasInnerGroup(j: JValue, depth: Int = 0): Boolean = j match {
    case JObject(fields) =>
      val isGroup = fields.collectFirst { case ("_agg", JString(k)) => k }
        .exists(k => k == "field" || k == "time")
      (isGroup && depth > 0) || fields.exists {
        case ("_select", JArray(subs)) => subs.exists(hasInnerGroup(_, depth + 1))
        case _ => false
      }
    case _ => false
  }

  describe("random nested aggregation trees (compiled+rendered vs in-memory evaluator)") {
    it("agree byte-for-byte on 60 random trees") {
      val gen = groupGen(2, Set.empty)
      var failures = List.empty[String]
      (0 until 60).foreach { i =>
        val tree = gen(Gen.Parameters.default, Seed(7000L + i)).getOrElse(fail("gen failed"))
        val agg = AggregationParser.fromJValue(tree, Properties.passthrough)
        val compiled = JsonRenderer.compact(
          JsonRenderer.renderAggregation(AggCompiler(df, agg, Properties.passthrough), agg))
        val expected = JsonRenderer.compact(evalGroup(rows, tree))
        if (compiled != expected)
          failures ::= s"tree #$i\n  json: ${JsonRenderer.compact(tree)}\n  compiled: $compiled\n  expected: $expected"
      }
      assert(failures.isEmpty, failures.mkString("\n\n"))
    }

    it("agree byte-for-byte on 40 trees whose EVERY inner group agg carries a _query filter") {
      // the dedicated re-aggregation fallback, proven head-on: each tree
      // with nesting gets a filter on every inner field/time node, which
      // disqualifies single-scan host delegation by construction
      val gen = groupGen(2, Set.empty)
      var failures = List.empty[String]
      var exercised = 0
      (0 until 40).foreach { i =>
        val raw = gen(Gen.Parameters.default, Seed(9100L + i)).getOrElse(fail("gen failed"))
        val tree = forceInnerFilters(raw, 0, 17 * i + 3)
        if (hasInnerGroup(tree)) exercised += 1
        val agg = AggregationParser.fromJValue(tree, Properties.passthrough)
        val compiled = JsonRenderer.compact(
          JsonRenderer.renderAggregation(AggCompiler(df, agg, Properties.passthrough), agg))
        val expected = JsonRenderer.compact(evalGroup(rows, tree))
        if (compiled != expected)
          failures ::= s"tree #$i\n  json: ${JsonRenderer.compact(tree)}\n  compiled: $compiled\n  expected: $expected"
      }
      assert(failures.isEmpty, failures.mkString("\n\n"))
      // coverage floor: a generator drift toward flat trees must fail
      // loudly, not silently stop proving the fallback path
      assert(exercised >= 15, s"only $exercised/40 trees had a filtered inner group agg")
    }
  }
}
