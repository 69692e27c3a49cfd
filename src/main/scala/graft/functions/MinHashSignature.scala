package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native MinHash signature: `out[j] = min_i (a_j · h_i + b_j) mod p` over
 * an array of 64-bit shingle hashes — all K permutations in ONE traversal
 * of the input array (element-outer, permutation-inner loop), with
 * whole-stage codegen.
 *
 * This replaces K separate `transform(...)+array_min` column expressions,
 * which allocate K intermediate arrays per row and traverse the input K
 * times through generic Catalyst eval. Same formula as the DuckDB oracle
 * (TextQueries.sigSql), so results stay bit-identical.
 *
 * Constraint the caller must hold: `a_j < 2^30` and hashes `< 2^32`, so
 * every product stays inside a signed 64-bit (no overflow, matching the
 * oracle's BIGINT arithmetic).
 */
case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty, "need one (a, b) pair per permutation")

  // getLong on the ArrayData would silently read garbage from e.g. an
  // array<int> child — reject non-long arrays at analysis time.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val aArr: Array[Long] = as.toArray
  private lazy val bArr: Array[Long] = bs.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = aArr.length
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null elements are IGNORED — the semantics of the declarative
      // transform+array_min form this replaces (getLong on a null slot
      // would read garbage)
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (aArr(j) * h + bArr(j)) % p
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    val k = aArr.length
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $input.numElements();
         |final long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($input.isNullAt($i)) continue;
         |  final long $h = $input.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
