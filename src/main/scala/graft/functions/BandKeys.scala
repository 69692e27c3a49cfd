package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The B LSH band keys of a MinHash signature in one compiled pass:
 * element `j` (0-based) is EXACTLY
 * `substring(md5(CAST(concat_ws(',', CAST(slice(sig, j·R+1, R) AS
 * array<string>)) AS BINARY)), 1, 16)` — the composition
 * [[graft.sources.TextIndex.bandsFromSig]] previously inlined 16× into
 * one whole-stage-codegen method. That span measured **9,078 bytecode
 * bytes** (r16 full-registry SpanSizeDiag sweep) — past the JVM's
 * 8,000-byte JIT cap, so d27's live batch banding (and s15's stream
 * banding) ran the chain in the bytecode interpreter, with a fresh
 * slice array + string array + joined string per band per row. This is
 * one reference-object call; the md5 is fed per-element (no
 * intermediate slice/joined-string allocation beyond the digest input).
 *
 * Exact semantics replicated (property-pinned in NativeExprPropertySpec):
 *  - long→string is `java.lang.Long.toString` (Spark's cast),
 *  - `concat_ws` SKIPS null elements (no separator slot), and skips a
 *    null/short slice the same way (an all-null or empty slice hashes
 *    the empty string),
 *  - a NULL signature array yields B bands of md5("") — because
 *    `concat_ws(",", CAST(NULL AS array<string>))` is "" (concat_ws
 *    skips null args), NOT null; the expression is therefore total and
 *    `nullable = false`,
 *  - the key is the first 16 lowercase-hex chars (8 digest bytes).
 */
case class BandKeys(child: Expression, b: Int, r: Int) extends UnaryExpression {
  require(b >= 1 && r >= 1, s"band geometry must be positive, got B=$b R=$r")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "band_keys"

  // One digest per THREAD (see ShingleHashes: instances can be evaluated
  // concurrently and MessageDigest is stateful).
  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(sig: ArrayData): ArrayData = {
    val md = this.md.get()
    val n = if (sig == null) 0 else sig.numElements()
    val out = new Array[Any](b)
    val sep = ','.toByte
    var j = 0
    while (j < b) {
      md.reset()
      var first = true
      var i = j * r
      val end = math.min(n, j * r + r)
      while (i < end) {
        if (!sig.isNullAt(i)) { // concat_ws semantics: nulls joined away
          if (!first) md.update(sep)
          md.update(java.lang.Long.toString(sig.getLong(i)).getBytes("US-ASCII"))
          first = false
        }
        i += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](16)
      var k = 0
      while (k < 8) {
        hex(2 * k) = hexDigits((d(k) >> 4) & 0xf).toByte
        hex(2 * k + 1) = hexDigits(d(k) & 0xf).toByte
        k += 1
      }
      out(j) = UTF8String.fromBytes(hex)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandKeysExpr", this, classOf[BandKeys].getName)
    val childGen = child.genCode(ctx)
    val newCode =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  $ref.compute(${childGen.isNull} ? null : ${childGen.value});
         |""".stripMargin
    ev.copy(code = newCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}
