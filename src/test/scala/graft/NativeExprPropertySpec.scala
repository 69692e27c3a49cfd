package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property test for the native decimal dot product: on randomly generated
 * float vectors (mixed magnitudes, negative zero, subnormals, null
 * elements) the compiled expression must equal the declarative
 * `aggregate(zip_with(...))` decimal form bit-for-bit — that equality is
 * what the DuckDB oracle parity of every vector query rests on. All 200
 * generated pairs are evaluated in ONE Spark job (each pair a row), not
 * one job per case.
 */
class NativeExprPropertySpec extends SparkSpec {

  private val finiteFloat: Gen[Float] = Gen.oneOf(
    Gen.choose(-1e6f, 1e6f),
    Gen.choose(-1f, 1f),
    Gen.oneOf(0f, -0f, 1.4e-45f, -1.4e-45f, 3.1415927f, -2.5f, 1e-20f))
    .flatMap(g => g)

  private val elem: Gen[Option[Float]] =
    Gen.frequency(9 -> finiteFloat.map(Some(_)), 1 -> Gen.const(None))

  private val pair: Gen[(Seq[Option[Float]], Seq[Option[Float]])] = for {
    n <- Gen.choose(0, 96)
    x <- Gen.listOfN(n, elem)
    y <- Gen.listOfN(n, elem)
  } yield (x, y)

  it("DecimalDotProduct equals the declarative decimal aggregate on 200 random vectors") {
    import spark.implicits._
    val cases = Gen.listOfN(200, pair)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    val df = cases.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val both = df.select(
      col("id"),
      GraftBridge.column(graft.functions.DecimalDotProduct(
        GraftBridge.expression(col("x")), GraftBridge.expression(col("y")))).as("native"),
      // DECIMAL(38,12) like the DuckDB oracle's dotSqlOf — the (20,12) form
      // has 8 integer digits and overflows on |prod| >= 1e8, which is a
      // limit of the REFERENCE formulation, not of the native expression
      // (unbounded BigDecimal accumulation)
      expr("""CAST(aggregate(zip_with(x, y, (a, b) -> CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(38,12))),
             |  CAST(0 AS DECIMAL(38,12)), (acc, v) -> CAST(acc + v AS DECIMAL(38,12))) AS DOUBLE)""".stripMargin)
        .as("declarative"))
    val diverging = both.where(!(col("native") <=> col("declarative"))).collect()
    assert(diverging.isEmpty, diverging.take(5).mkString("\n"))
  }

  // contract scope: ≥1 non-null hash per row — the engine only signs
  // shingle arrays of filtered documents (≥3 tokens), and on an empty /
  // all-null array the declarative array_min yields null where the native
  // form yields the MaxValue sentinel
  private val hashElem: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.choose(0L, 4294967295L).map(Some(_)), 1 -> Gen.const(None))

  private val hashArray: Gen[Seq[Option[Long]]] = for {
    n <- Gen.choose(0, 60)
    xs <- Gen.listOfN(n, hashElem)
    pinned <- Gen.choose(0L, 4294967295L)
  } yield Some(pinned) +: xs

  it("MinHashSignature equals K independent transform+array_min columns on 200 random hash arrays") {
    import spark.implicits._
    val P = 4294967311L
    val as = Seq(3L, 1048573L, 7919L, 536870909L, 2L, 104729L, 15485863L, 999983L)
    val bs = Seq(11L, 99991L, 0L, 4294967295L, 1L, 7L, 123456789L, 31L)
    val cases = Gen.listOfN(200, hashArray)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator exhausted"))
    val df = cases.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }.toDF("id", "hs")
    val both = df.select(
      col("id"),
      GraftBridge.column(graft.functions.MinHashSignature(
        GraftBridge.expression(col("hs")), as, bs, P)).as("native"),
      array(as.zip(bs).map { case (a, b) =>
        array_min(transform(col("hs"), h => (h * lit(a) + lit(b)) % lit(P)))
      }: _*).as("declarative"))
    val diverging = both.where(!(col("native") <=> col("declarative"))).collect()
    assert(diverging.isEmpty, diverging.take(5).mkString("\n"))
  }

  it("SimHash equals an independent sign-counting model on 200 random hash arrays") {
    import spark.implicits._
    val NBits = 48
    // independent reference: straightforward driver-side sign counting
    // with the same null-skip and counts>0 packing contract
    def model(hs: Seq[Option[Long]]): Long = {
      val counts = Array.fill(NBits)(0)
      hs.foreach(_.foreach { h =>
        (0 until NBits).foreach(j => if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1)
      })
      (0 until NBits).foldLeft(0L)((acc, j) => if (counts(j) > 0) acc | (1L << j) else acc)
    }
    val cases = Gen.listOfN(200, hashArray)
      .apply(Gen.Parameters.default, Seed(99L))
      .getOrElse(fail("generator exhausted"))
    val df = cases.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }.toDF("id", "hs")
    val got = df.select(
      col("id"),
      GraftBridge.column(graft.functions.SimHash(
        GraftBridge.expression(col("hs")), NBits)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (hs, i) =>
      assert(got(i.toLong) == model(hs), s"case $i: $hs")
    }
  }
}
