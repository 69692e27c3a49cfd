package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Decimal-exact dot product of two float vectors, emitted as double:
 * per element the product is quantized to 12 fractional digits by
 * replicating DuckDB's `CAST(double AS DECIMAL(38,12))` — the
 * binary-scaled double `v * 1e12` rounded with the oracle's measured
 * piecewise tie rule ([[DecimalDotProduct.duckRound]]: ties away from
 * zero below 2^24, to even above — round 7 shipped plain `Math.rint`,
 * which random-product validation could not distinguish; sf1-generated
 * vectors promptly hit real `.5` ties in both regimes) — converted
 * EXACTLY to decimal (`new BigDecimal(double)`, not the shortest-repr
 * `valueOf`) — then summed exactly, order- and partitioning-
 * independent. Also validated at 0 mismatches over 100k+ random
 * products across magnitude ranges plus constructed ties straddling
 * the 2^24 boundary. Spark's own double→decimal Cast rounds the EXACT
 * binary expansion HALF_UP, which diverges from the oracle's
 * scale-in-double-then-round pipeline — a real mismatch hit by
 * centroid products — so the declarative `aggregate(zip_with(CAST …))`
 * form is NOT equivalent and must not be substituted for this
 * expression.
 *
 * Why native: Spark's higher-order functions (`transform`, `zip_with`,
 * `aggregate`) have no codegen — each lambda application is interpreted
 * with per-element Decimal allocations. This expression does one pass in
 * compiled code; codegen calls [[compute]] directly so the surrounding
 * operator stays inside whole-stage codegen.
 */
case class DecimalDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  // getFloat on the ArrayData would silently read garbage from any other
  // element type — reject non-float arrays at analysis time instead.
  // (checkInputDataTypes rather than ExpectsInputTypes: AbstractDataType is
  // private[sql] in Spark 4, so the inputTypes signature can't be written
  // outside the spark package.)
  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType).find { case ArrayType(FloatType, _) => false; case _ => true } match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> inputs, got ${t.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_dot"
  // a null ELEMENT in either array nulls the whole dot (see compute)
  override def nullable: Boolean = true

  /** Boxed result: null when any paired element slot is null — matching
    * the declarative `aggregate(zip_with(...))` form, where a null
    * product nulls the running decimal sum (getFloat on a null slot
    * would silently read garbage instead).
    *
    * Fast path (r15): every rounded term is an INTEGRAL double (floor /
    * rint output), and an integral double's exact binary value IS that
    * integer, so summing the terms exactly is plain long arithmetic on
    * the 1e12-scaled integers — one BigDecimal per dot (the final
    * ×10⁻¹² + correctly-rounded doubleValue) instead of one allocation
    * + decimal add PER ELEMENT. `(long) t` is exact for any integral
    * double with |t| < 2^63; terms outside that range (or NaN/Inf
    * products), and any accumulator overflow, fall back to the original
    * all-BigDecimal loop — same values on every input, including the
    * same NumberFormatException on non-finite products. Validated by
    * NativeExprPropertySpec (oracle-arithmetic model + golden file) and
    * a dedicated fast-vs-slow equivalence property. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val prod = x.getFloat(i).toDouble * y.getFloat(i).toDouble
      // 1e12 is exact in double, so the scaled multiply is DuckDB's own
      val t = DecimalDotProduct.duckRound(prod * 1e12)
      // exact-long guard: integral |t| < 2^63 converts exactly; the
      // round-trip compare rejects NaN and ±Inf too (NaN != NaN).
      // t == 2^63 exactly needs the explicit MaxValue check: toLong
      // saturates to 2^63−1, whose toDouble rounds back UP to 2^63, so
      // the round-trip alone would accept an off-by-one term (r16,
      // ADVICE item — exactness contract at the one boundary value).
      val l = t.toLong
      if (l.toDouble != t || l == Long.MaxValue) return computeExact(x, y, n)
      val sum = acc + l
      // two's-complement overflow test (Math.addExact's condition)
      if (((acc ^ sum) & (l ^ sum)) < 0) return computeExact(x, y, n)
      acc = sum
      i += 1
    }
    Double.box(JBigDecimal.valueOf(acc, 12).doubleValue())
  }

  /** The original all-BigDecimal accumulation — the fallback for inputs
    * whose scaled terms leave the exact-long range (never hit by any
    * shipped corpus; kept for unconditional correctness). */
  private def computeExact(x: ArrayData, y: ArrayData, n: Int): java.lang.Double = {
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val prod = x.getFloat(i).toDouble * y.getFloat(i).toDouble
      // new JBigDecimal(double) keeps the rounded double's exact binary value
      acc = acc.add(new JBigDecimal(DecimalDotProduct.duckRound(prod * 1e12)).movePointLeft(12))
      i += 1
    }
    Double.box(acc.doubleValue())
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    compute(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotExpr", this, classOf[DecimalDotProduct].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = $ref.compute($x, $y);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DecimalDotProduct =
    copy(left = newLeft, right = newRight)
}

object DecimalDotProduct {
  /** Offset-range variant of [[DecimalDotProduct.compute]] against a
    * plain float array (a frozen codebook/centroid row): dot of
    * x[off ..) with y, over n = min(max(0, |x|−off), |y|) elements —
    * exactly the `decimal_dot(slice(x, off+1, |y|), y)` composition
    * (Slice truncates past-the-end and yields empty for off ≥ |x|; the
    * dot of empty arrays is 0.0). Same fast long path, same fallback,
    * same null-on-null-slot contract; y carries no nulls by construction
    * (collected codebook floats). Used by [[CodebookArgmin]] so the
    * argmin inner loop never allocates a slice. */
  def dotRange(x: org.apache.spark.sql.catalyst.util.ArrayData, off: Int,
      y: Array[Float]): java.lang.Double = {
    val n = math.min(math.max(0, x.numElements() - off), y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(off + i)) return null
      val prod = x.getFloat(off + i).toDouble * y(i).toDouble
      val t = duckRound(prod * 1e12)
      val l = t.toLong
      if (l.toDouble != t || l == Long.MaxValue) return dotRangeExact(x, off, y, n)
      val sum = acc + l
      if (((acc ^ sum) & (l ^ sum)) < 0) return dotRangeExact(x, off, y, n)
      acc = sum
      i += 1
    }
    Double.box(JBigDecimal.valueOf(acc, 12).doubleValue())
  }

  private def dotRangeExact(x: org.apache.spark.sql.catalyst.util.ArrayData, off: Int,
      y: Array[Float], n: Int): java.lang.Double = {
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(off + i)) return null
      val prod = x.getFloat(off + i).toDouble * y(i).toDouble
      acc = acc.add(new JBigDecimal(duckRound(prod * 1e12)).movePointLeft(12))
      i += 1
    }
    Double.box(acc.doubleValue())
  }

  /** DuckDB's double→integer rounding as MEASURED against the oracle
    * binary on constructed exact-tie inputs (the only inputs where
    * rounding modes differ): ties round AWAY FROM ZERO below 2^24 and
    * TO EVEN at or above it — a piecewise rule found by probing even-k
    * ties across magnitudes (even k+0.5 → k+1 up to 16777215, → k from
    * 16777216 on; boundary located by bisection). Neither `std::round`
    * nor `nearbyint` alone reproduces it; no claim about mechanism,
    * only the measured contract. The half-away branch avoids
    * `floor(v+0.5)` (whose `+0.5` itself rounds, famously promoting
    * 0.49999999999999994 to 1); `|v| - floor(|v|)` is exact for all
    * finite doubles (Sterbenz for |v| ≥ 1, trivially below), so the
    * tie comparison is exact. Values ≥ 2^53 are integral and pass
    * through unchanged. */
  def duckRound(v: Double): Double = {
    val a = Math.abs(v)
    if (a < 16777216.0) {
      val f = Math.floor(a)
      Math.copySign(if (a - f >= 0.5) f + 1.0 else f, v)
    } else Math.rint(v)
  }
}
