package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * 32-bit hashes of the word-3-shingles of a token array: for each window
 * `tok[i] ⊔ ' ' ⊔ tok[i+1] ⊔ ' ' ⊔ tok[i+2]`, the first 4 md5 bytes as an
 * unsigned 32-bit value — EXACTLY
 * `CAST(conv(substr(md5(concat(...)), 1, 8), 16, 10) AS BIGINT)`, the
 * form the DuckDB oracle reproduces, computed in one pass of compiled
 * code instead of an interpreted `transform` lambda that concatenates and
 * hex-encodes per element.
 */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  // getUTF8String on the ArrayData would silently read garbage from any
  // other element type — reject non-string arrays at analysis time.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  // One digest per THREAD, not per expression instance: the same instance
  // can be evaluated concurrently (driver-side eval, plan reuse), and
  // MessageDigest is stateful — a shared copy would corrupt hashes silently.
  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData): ArrayData = {
    val md = this.md.get()
    val n = tokens.numElements()
    val k = math.max(0, n - 2)
    val out = new Array[Long](math.max(0, k))
    var written = 0
    var i = 0
    while (i < k) {
      // windows touching a null token are SKIPPED — the declarative form
      // yielded a NULL element there, which array_min-based MinHash
      // ignored; skipping keeps the downstream semantics without nullable
      // output elements
      if (!tokens.isNullAt(i) && !tokens.isNullAt(i + 1) && !tokens.isNullAt(i + 2)) {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        md.update(' '.toByte)
        md.update(tokens.getUTF8String(i + 1).getBytes)
        md.update(' '.toByte)
        md.update(tokens.getUTF8String(i + 2).getBytes)
        val d = md.digest()
        out(written) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        written += 1
      }
      i += 1
    }
    new GenericArrayData(if (written == out.length) out else java.util.Arrays.copyOf(out, written))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleExpr", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
