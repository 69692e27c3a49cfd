package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hex md5 of every `w`-token window of a token array: element `i`
 * (0-based) is EXACTLY
 * `md5(CAST(array_join(slice(toks, i+1, w), ' ') AS BINARY))` — the form
 * the DuckDB oracle reproduces with a windowed `string_agg` — computed in
 * one compiled pass. The declarative `transform(sequence…)` lambda this
 * replaces paid interpreted-expression dispatch plus a fresh slice/join
 * allocation per window (~0.4 ms/window probed at sf0.1: the exact-substr
 * window census was 30× slower than its own md5 work), which at corpus
 * scale made the index build CPU-bound on interpreter overhead.
 *
 * Fewer than `w` tokens → empty array (total, like the CASE-guarded
 * declarative form). Null tokens are skipped exactly as `array_join`
 * skips them (joined without a separator slot).
 */
case class WindowMd5Hashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "window_md5_hashes"

  // One digest per THREAD (see ShingleHashes: instances can be evaluated
  // concurrently and MessageDigest is stateful).
  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(tokens: ArrayData): ArrayData = {
    val md = this.md.get()
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n - w + 1)
    val sep = ' '.toByte
    var s = 0
    while (s <= n - w) {
      md.reset()
      var first = true
      var j = s
      while (j < s + w) {
        val b = bytes(j)
        if (b != null) { // array_join semantics: nulls joined away
          if (!first) md.update(sep)
          md.update(b)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = hexDigits((d(k) >> 4) & 0xf).toByte
        hex(2 * k + 1) = hexDigits(d(k) & 0xf).toByte
        k += 1
      }
      out(s) = UTF8String.fromBytes(hex)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winMd5Expr", this, classOf[WindowMd5Hashes].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowMd5Hashes =
    copy(child = newChild)
}
