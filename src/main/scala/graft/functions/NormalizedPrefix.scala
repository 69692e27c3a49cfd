package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The first `n` characters of d17's normalization, in one early-exit
 * byte scan: EXACTLY
 * `substring(lower(regexp_replace(regexp_replace(text, '[^A-Za-z0-9 ]',
 * ''), ' +', ' ')), 1, n)`.
 *
 * Why native (r16, guide §1.2 per-task work): the declarative chain
 * runs TWO Java-regex passes plus a lowercase pass over the ENTIRE
 * document, then keeps 64 characters — 3.3 s single-task at sf1 (r15
 * accounting). The fused scan keeps only bytes in [A-Za-z0-9 ]
 * (ASCII-lowercasing A-Z inline — the survivors are pure ASCII, so
 * Unicode lowercasing degenerates to +32), collapses space runs to one,
 * and STOPS as soon as `n` output characters exist, so per-document
 * cost drops from O(|text|) to O(bytes scanned until n normalized
 * chars) regardless of document length.
 *
 * Byte-level equivalence with the regex form (property-pinned in
 * NativeExprPropertySpec): every kept character is single-byte ASCII,
 * and every removed character — punctuation, control bytes, ALL
 * non-ASCII codepoints (each of whose UTF-8 bytes is ≥ 0x80 and
 * therefore outside the class) — contributes nothing, so filtering raw
 * UTF-8 bytes equals filtering code points. Space collapsing keeps a
 * LEADING space (the regex replaces runs with one space; it never
 * trims). Null input → null, like the built-in chain.
 */
case class NormalizedPrefix(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"prefix length must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalized_prefix"

  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](n)
    var outLen = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length && outLen < n) {
      val b = bytes(i)
      if (b == ' ') pendingSpace = true
      else {
        val keep =
          (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
        if (keep) {
          if (pendingSpace) {
            out(outLen) = ' '
            outLen += 1
            pendingSpace = false
          }
          if (outLen < n) {
            out(outLen) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
            outLen += 1
          }
        }
      }
      i += 1
    }
    // the regex collapses EVERY space run to one space — leading,
    // interior, AND trailing ("ab " → "ab ", "   " → " ") — so a run
    // still pending when the INPUT is exhausted emits its single space
    // too (when the scan stopped for the n-char cap instead, the space
    // would be character n+1 and substring drops it — the loop already
    // exited with outLen == n in that case)
    if (pendingSpace && i >= bytes.length && outLen < n) {
      out(outLen) = ' '
      outLen += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normPrefixExpr", this, classOf[NormalizedPrefix].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizedPrefix =
    copy(child = newChild)
}
