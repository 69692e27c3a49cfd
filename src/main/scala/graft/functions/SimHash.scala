package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native SimHash over an array of token hashes: for each of `nbits` bit
 * positions, count +1/−1 by the token hash's bit, emit the sign vector
 * packed as a long — all bits in ONE traversal of the token array
 * (element-outer loop), with whole-stage codegen.
 *
 * Replaces the explode-tokens × explode-bits × two-groupBy plan shape
 * (which multiplies the token stream by nbits and shuffles twice) with a
 * per-row expression: no row explosion, no shuffle at all for the
 * signature itself. Same counter arithmetic as the DuckDB oracle's
 * unrolled SQL, so results stay bit-identical.
 */
case class SimHash(child: Expression, nbits: Int) extends UnaryExpression {

  require(nbits > 0 && nbits <= 63, "nbits must be in [1, 63] for a signed-long signature")

  // getLong on the ArrayData would silently read garbage from e.g. an
  // array<int> child — reject non-long arrays at analysis time.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](nbits)
    var i = 0
    while (i < n) {
      // null elements contribute nothing (getLong on a null slot would
      // read garbage)
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < nbits) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < nbits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $input.numElements();
         |final int[] $counts = new int[$nbits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($input.isNullAt($i)) continue;
         |  final long $h = $input.getLong($i);
         |  for (int $j = 0; $j < $nbits; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $acc = 0L;
         |for (int $j = 0; $j < $nbits; $j++) {
         |  if ($counts[$j] > 0) $acc |= (1L << $j);
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
