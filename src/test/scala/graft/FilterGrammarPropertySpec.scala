package graft

import org.apache.spark.sql.functions.col
import org.json4s._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.query.{FilterParser, Properties}

/**
 * Property test for the JSON filter grammar (SURVEY §5: "scalacheck for
 * predicate/filter algebra — the `_and/_or/_not` grammar is a natural
 * property-testing target"): 150 randomly generated filter trees are
 * compiled to Column predicates and evaluated by Spark in ONE job (each
 * tree a boolean column), then compared row-by-row against an
 * independent reference evaluator implementing the documented semantics
 * with SQL three-valued logic (a row is kept iff the predicate is
 * exactly TRUE — a naive two-valued evaluator diverges on `_not` over a
 * null comparison, which is precisely the class of bug this hunts).
 */
class FilterGrammarPropertySpec extends SparkSpec {

  private case class R(id: Long, name: Option[String], age: Option[Long])

  private val rows: Seq[R] = {
    val names = Seq(None, Some(""), Some("alice"), Some("ALICE"), Some("al"),
      Some("bob"), Some("carol"), Some("alic"))
    val ages = Seq[Option[Long]](None, Some(-2L), Some(0L), Some(1L), Some(5L),
      Some(10L), Some(12L))
    // deterministic sample of the cross product
    (for (i <- names.indices; j <- ages.indices; if (i + j) % 2 == 0)
      yield R((i * 10 + j).toLong, names(i), ages(j)))
  }

  // ------------------------------------------------------- tree generators

  private val namePool = Seq("alice", "bob", "al", "", "ALICE", "xyz")
  private val likePool = Seq("*li*", "al*", "*ce", "alice", "a*e", "*", "**", "*al*")

  private def obj(kv: (String, JValue)*): JValue = JObject(kv.toList)

  private val nameLeaf: Gen[JValue] = for {
    op <- Gen.oneOf("_is", "_ne", "_startsWith", "_endsWith")
    v <- Gen.oneOf(namePool)
  } yield obj(op -> obj("name" -> JString(v)))

  private val likeLeaf: Gen[JValue] =
    Gen.oneOf(likePool).map(p => obj("_like" -> obj("name" -> JString(p))))

  private val ageLeaf: Gen[JValue] = for {
    op <- Gen.oneOf("_is", "_ne", "_lt", "_gt", "_lte", "_gte")
    v <- Gen.choose(-3L, 13L)
  } yield obj(op -> obj("age" -> JInt(BigInt(v))))

  private val betweenLeaf: Gen[JValue] = for {
    a <- Gen.choose(-3L, 11L); span <- Gen.choose(0L, 6L)
  } yield obj("_between" -> obj(
    "_field" -> JString("age"), "_from" -> JInt(BigInt(a)), "_to" -> JInt(BigInt(a + span))))

  private val inLeaf: Gen[JValue] = for {
    vs <- Gen.nonEmptyListOf(Gen.choose(-3L, 13L)).map(_.take(4))
  } yield obj("_in" -> obj(
    "_field" -> JString("age"), "_values" -> JArray(vs.map(v => JInt(BigInt(v))))))

  private val containsLeaf: Gen[JValue] =
    Gen.oneOf("name", "age").map(f => obj("_contains" -> JString(f)))

  private val bareLeaf: Gen[JValue] =
    Gen.oneOf(namePool).map(v => obj("name" -> JString(v)))

  private val anyLeaf: Gen[JValue] = Gen.const(obj("_any" -> JBool(true)))

  // legacy full-text filter: reference parity is ignore-with-warning →
  // match-all, whatever the payload (reference query/Filter.scala:177-179)
  private val stringLeaf: Gen[JValue] =
    Gen.oneOf(namePool).map(v => obj("_string" -> JString(v)))

  private val leaf: Gen[JValue] =
    Gen.oneOf(nameLeaf, likeLeaf, ageLeaf, betweenLeaf, inLeaf, containsLeaf, bareLeaf, anyLeaf, stringLeaf)

  private def tree(depth: Int): Gen[JValue] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, tree(depth - 1)))
        .map(l => obj("_and" -> JArray(l))),
      1 -> Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, tree(depth - 1)))
        .map(l => obj("_or" -> JArray(l))),
      1 -> tree(depth - 1).map(t => obj("_not" -> t)))

  // --------------------------- independent three-valued reference evaluator

  private def kAnd(xs: Seq[Option[Boolean]]): Option[Boolean] =
    if (xs.exists(_.contains(false))) Some(false)
    else if (xs.exists(_.isEmpty)) None else Some(true)
  private def kOr(xs: Seq[Option[Boolean]]): Option[Boolean] =
    if (xs.exists(_.contains(true))) Some(true)
    else if (xs.exists(_.isEmpty)) None else Some(false)

  private def evalTree(j: JValue, r: R): Option[Boolean] = j match {
    case JObject(fields) => kAnd(fields.map { case (k, v) => evalOne(k, v, r) })
    case other => fail(s"non-object filter $other")
  }

  private def evalOne(key: String, v: JValue, r: R): Option[Boolean] = key match {
    case "_and" => kAnd(arr(v).map(evalTree(_, r)))
    case "_or" => kOr(arr(v).map(evalTree(_, r)))
    case "_not" => evalTree(v, r).map(!_)
    case "_any" => Some(true)
    case "_string" => Some(true) // ignored legacy filter = match-all
    case "_between" =>
      val from = num(v \ "_from"); val to = num(v \ "_to")
      r.age.map(a => a >= from && a < to)
    case "_in" =>
      val vs = arr(v \ "_values").map(num)
      r.age.map(vs.contains)
    case "_contains" =>
      Some(if (str(v) == "name") r.name.isDefined else r.age.isDefined)
    case op if op.startsWith("_") =>
      val JObject(List((field, jv))) = v: @unchecked
      if (field == "age") ageOp(op, r.age, num(jv)) else nameOp(op, r.name, str(jv))
    case field => // bare equality (deprecated form) = _is
      if (field == "age") ageOp("_is", r.age, num(v)) else nameOp("_is", r.name, str(v))
  }

  private def ageOp(op: String, c: Option[Long], v: Long): Option[Boolean] = op match {
    case "_is" => Some(c.contains(v)) // null-safe
    case "_ne" => Some(!c.contains(v))
    case "_lt" => c.map(_ < v)
    case "_gt" => c.map(_ > v)
    case "_lte" => c.map(_ <= v)
    case "_gte" => c.map(_ >= v)
    case other => fail(s"unexpected age op $other")
  }

  private def nameOp(op: String, c: Option[String], v: String): Option[Boolean] = op match {
    case "_is" => Some(c.contains(v))
    case "_ne" => Some(!c.contains(v))
    case "_startsWith" => c.map(_.startsWith(v))
    case "_endsWith" => c.map(_.endsWith(v))
    case "_like" =>
      val lead = v.startsWith("*")
      val trail = v.length > (if (lead) 1 else 0) && v.endsWith("*")
      if (!lead && !trail) Some(c.contains(v)) // null-safe equality
      else {
        val core = v.substring(if (lead) 1 else 0, v.length - (if (trail) 1 else 0))
        c.map { s =>
          if (lead && trail) s.contains(core)
          else if (lead) s.endsWith(core)
          else s.startsWith(core)
        }
      }
    case other => fail(s"unexpected name op $other")
  }

  private def arr(v: JValue): List[JValue] = v match {
    case JArray(items) => items
    case other => List(other)
  }
  private def num(v: JValue): Long = v match {
    case JInt(i) => i.longValue
    case JLong(l) => l
    case other => fail(s"expected number, got $other")
  }
  private def str(v: JValue): String = v match {
    case JString(s) => s
    case other => fail(s"expected string, got $other")
  }

  // ------------------------------------------------------------ the property

  describe("filter grammar vs independent three-valued evaluator") {
    it("agrees on 150 random trees over all fixture rows") {
      val s = spark
      import s.implicits._
      val trees = Gen.listOfN(150, tree(3))
        .apply(Gen.Parameters.default, Seed(42L))
        .getOrElse(fail("generator failed"))
      val df = rows.map(r => (r.id, r.name, r.age)).toDF("id", "name", "age")
      val props = Properties.passthrough
      val cols = trees.zipWithIndex.map { case (t, i) =>
        FilterParser.build(t, props, FilterParser.defaultLeaf(props)).as(s"p$i")
      }
      // ONE Spark job evaluates every generated predicate over every row
      val out = df.select((col("id") +: cols): _*).collect()
      for (row <- out) {
        val id = row.getLong(0)
        val r = rows.find(_.id == id).get
        trees.zipWithIndex.foreach { case (t, i) =>
          val engine = if (row.isNullAt(i + 1)) None else Some(row.getBoolean(i + 1))
          val ref = evalTree(t, r)
          assert(engine === ref,
            s"tree ${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(t))} " +
              s"row $r: engine=$engine ref=$ref")
        }
      }
    }
  }
}
