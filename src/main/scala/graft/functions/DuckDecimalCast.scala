package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType}

/**
 * `CAST(double AS DECIMAL(38,6))` with DuckDB's exact semantics, for the
 * decimal-accumulation discipline (sums over float/double accumulate in
 * DECIMAL(38,6), then emit double — exact, partitioning-independent).
 *
 * Why not Spark's own Cast: the two engines quantize differently. DuckDB
 * scales IN BINARY first — `v * 10^scale` as a double multiply (itself
 * rounded), then rounds to an integer with ties away from zero
 * (`std::round`) — while Spark expands the exact binary value of `v` as
 * a BigDecimal and rounds HALF_UP at scale 6. The two disagree whenever
 * the double multiply crosses a rounding boundary the exact expansion
 * does not (first seen live: q29's `l_extendedprice * (1-l_discount)`
 * at sf1 — one row in 6M moved the group sum by 1e-6, failing the
 * whole-result hash). Replicating the oracle's own pipeline keeps every
 * decimal-disciplined aggregate bit-equal at any scale factor.
 *
 * Why native: same as [[DecimalDotProduct]] — a codegen'd one-hop
 * expression keeps the aggregate input inside whole-stage codegen, and
 * no composition of Spark SQL functions reproduces the
 * scale-in-double-then-round-half-away pipeline.
 */
case class DuckDecimalCast(child: Expression, precision: Int = 38) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${t.catalogString}")
  }

  // precision is representational only — the width-18 (int64) and
  // width-38 (int128) DuckDB paths follow the SAME measured rounding
  // (probed separately: 0/60k mismatches on the narrow path incl.
  // boundary ties); a narrower precision matters downstream, where
  // decimal-multiply result types must stay lossless (e06b)
  override def dataType: DataType = DecimalType(precision, 6)
  override def prettyName: String = "duck_decimal6"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    DuckDecimalCast.compute(v.asInstanceOf[Double], precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.DuckDecimalCast.compute($v, $precision)")

  override protected def withNewChildInternal(newChild: Expression): DuckDecimalCast =
    copy(child = newChild)
}

object DuckDecimalCast {
  /** 2^53 / 10^6: above this, `v * 1e6` no longer lands on an exactly
    * representable integer, integer-rounding identities stop holding,
    * and the model is unverified against the oracle (the parquet-path
    * validation covers [0, 9e9] exhaustively-sampled; nothing above) —
    * refuse rather than silently diverge. Every discipline call site
    * casts PER-ROW values (prices, quantities, balances — all < 10^6)
    * and lets the DECIMAL sum carry the magnitude, so this bound is
    * three orders of magnitude of headroom, not a constraint. */
  private val MaxAbs = 9007199254.740992

  /** DuckDB's DOUBLE→DECIMAL(38,6): binary-scale (double multiply),
    * round with the oracle's measured piecewise tie rule
    * ([[DecimalDotProduct.duckRound]]), exact integer conversion.
    * Verified bit-equal against the oracle binary on 187k+ sampled
    * products/prices plus constructed exact ties on both sides of the
    * 2^24 boundary, zero mismatches inside [[MaxAbs]]. */
  def compute(v: Double, precision: Int): Decimal = {
    require(java.lang.Double.isFinite(v) && Math.abs(v) <= MaxAbs,
      s"value $v outside the proven-exact DECIMAL($precision,6) cast range (|v| <= 2^53/1e6)")
    val unscaled = DecimalDotProduct.duckRound(v * 1e6)
    Decimal(new JBigDecimal(unscaled).movePointLeft(6), precision, 6)
  }

  /** The discipline cast as a Column (exact decimal accumulation:
    * `duckDouble(sum(duckDecimal6(x)))`). */
  def duckDecimal6(c: org.apache.spark.sql.Column, precision: Int = 38): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      DuckDecimalCast(org.apache.spark.sql.GraftBridge.expression(c), precision))

  /** The discipline's decimal→double emission as a Column. */
  def duckDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      DuckDecimalToDouble(org.apache.spark.sql.GraftBridge.expression(c)))
}

/**
 * `CAST(decimal AS DOUBLE)` with DuckDB's exact semantics — the emission
 * half of the decimal-accumulation discipline. DuckDB converts the
 * UNSCALED int128 to double first and then divides by `10^scale` (two
 * roundings); Spark's Cast rounds the true rational value once,
 * correctly. The two differ by one ulp whenever the unscaled value
 * exceeds 2^53 and sits near a mantissa boundary — first seen live at
 * sf1, where q29's group sum (unscaled ≈ 1e17) emitted
 * …064.5769 (Spark) vs …064.57689 (oracle) and failed the result hash.
 */
case class DuckDecimalToDouble(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a decimal input, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "duck_double"
  override def nullable: Boolean = true

  // lazy: at construction the child (e.g. an aggregate) is not yet
  // resolved and dataType would throw
  private lazy val scale = child.dataType match {
    case d: DecimalType => d.scale
    case _ => 0
  }

  override protected def nullSafeEval(v: Any): Any =
    DuckDecimalToDouble.compute(v.asInstanceOf[Decimal], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.DuckDecimalToDouble.compute($v, $scale)")

  override protected def withNewChildInternal(newChild: Expression): DuckDecimalToDouble =
    copy(child = newChild)
}

object DuckDecimalToDouble {
  private val MinusOne = java.math.BigInteger.valueOf(-1)
  private val Two64Minus1 =
    java.math.BigInteger.ONE.shiftLeft(64).subtract(java.math.BigInteger.ONE)
  /** double(2^64) — exactly representable; double(2^64 − 1) rounds to the
    * same value, so the measured model is insensitive to which constant
    * the oracle engine multiplies by. */
  private val Two64d = 1.8446744073709552e19

  /** DuckDB's int128→double splits the unscaled value into two's-complement
    * halves and combines them IN DOUBLE ARITHMETIC —
    * `double(lower) + double(upper) * 2^64`, with an `upper == −1` fast
    * path `−double(2^64−1 − lower) − 1` — which double-rounds (each half
    * correctly rounded, then the combine rounds again) and so disagrees
    * with the correctly rounded BigInteger→double conversion at large
    * magnitudes. Measured through the parquet vectorized path (the only
    * path the oracle uses): 0/8114 mismatches across ±int128 spanning
    * 2^50..10^38−1 incl. every 2^k±3 boundary and e06b's live sf10 sum
    * (unscaled ≈ 2.4e19), where the correctly-rounded model diverges 112
    * times. Below 2^63 the split reduces to one correctly rounded
    * conversion — identical to the previous (sf1-validated) model, so
    * this is a range extension, not a behavior change. */
  def compute(v: Decimal, scale: Int): Double = {
    val unscaled = v.toJavaBigDecimal.unscaledValue()
    val upper = unscaled.shiftRight(64) // arithmetic shift = int128 upper half
    val d =
      if (upper.signum == 0) unscaled.doubleValue()
      else if (upper == MinusOne)
        -Two64Minus1.subtract(unscaled.subtract(upper.shiftLeft(64))).doubleValue() - 1.0
      else {
        val lower = unscaled.subtract(upper.shiftLeft(64)) // in [0, 2^64)
        lower.doubleValue() + upper.doubleValue() * Two64d
      }
    d / math.pow(10, scale)
  }
}
