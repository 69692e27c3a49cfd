package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The DISTINCT space-joined `n`-token windows of a token array, in first-
 * occurrence order — EXACTLY
 * `array_distinct(transform(sequence(1, size(toks) − n + 1),
 *    i -> concat(toks[i], ' ', …, toks[i+n−1])))`
 * (the d10/d27 shingle-set build), computed in one compiled pass.
 *
 * Why native (r16, guide §1.2 per-task work): the declarative form pays
 * interpreted lambda dispatch plus n `element_at` calls, a Concat and a
 * fresh UTF8String per window, then a second interpreted array_distinct
 * pass — the d10 shingle-set build measured 28.7 s single-task at sf1
 * (r15 notes). Here each window is one `UTF8String.concatWs` and the
 * distinct fold happens inline in first-occurrence order.
 *
 * Exact-equivalence notes (property-pinned in NativeExprPropertySpec):
 *  - a window touching a NULL token yields a NULL element in the
 *    declarative form (Concat is null-intolerant); array_distinct keeps
 *    the FIRST null. Reproduced: one null element at the first
 *    null-window position. (split() never yields null tokens, so this is
 *    a dead branch on every shipped corpus — kept for equivalence.)
 *  - fewer than n tokens → empty array. Call sites guard size ≥ n
 *    anyway (the unguarded declarative form would hit descending
 *    `sequence(1, 0)`, which is NOT an empty window list — this
 *    expression must stay behind the same guard, like the oracle SQL).
 *  - UTF8String equality is byte equality, same as the declarative
 *    distinct's.
 */
case class DistinctTokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "distinct_token_ngrams"

  private val sep = UTF8String.fromString(" ")

  def compute(tokens: ArrayData): ArrayData = {
    val len = tokens.numElements()
    val k = len - n + 1
    if (k <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[Any](k)
    var seenNull = false
    val window = new Array[UTF8String](2 * n - 1)
    var j = 1
    while (j < window.length) { window(j) = sep; j += 2 } // separators interleave
    var i = 0
    while (i < k) {
      var hasNull = false
      var w = 0
      while (w < n && !hasNull) {
        if (tokens.isNullAt(i + w)) hasNull = true
        else window(2 * w) = tokens.getUTF8String(i + w)
        w += 1
      }
      if (hasNull) {
        if (!seenNull) { seenNull = true; out.add(null) }
      } else {
        val s = UTF8String.concat(window: _*)
        if (seen.add(s)) out.add(s)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramsExpr", this, classOf[DistinctTokenNgrams].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctTokenNgrams =
    copy(child = newChild)
}
