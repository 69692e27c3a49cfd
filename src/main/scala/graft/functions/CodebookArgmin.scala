package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/**
 * Map-side literal argmin against a FROZEN codebook/centroid table — the
 * native form of the r15 `array_min(array(struct(score, id), …))`
 * composition used by every coarse-centroid assignment and PQ encode.
 *
 * Why native (r16, guide §1.2 "per-task work"): the struct-array form
 * inlines K× (decimal_dot + CreateNamedStruct) plus an ArrayMin loop into
 * the enclosing whole-stage-codegen method. Fused with the mog audits'
 * four LUT joins, the generated `processNext` reached 15.6-15.9 KB of
 * BYTECODE — past the JVM's 8000-byte `DontCompileHugeMethods` cap, so
 * the hottest corpus×panel stage of e18/e19/e20 ran in the bytecode
 * INTERPRETER (measured with CodeGenerator.compile stats; pinned by
 * PlanQualitySpec). It also allocated K GenericInternalRows + one array
 * per input row, and one Slice copy per subspace. This expression
 * compiles to ONE reference-object call per output column (the
 * [[DecimalDotProduct]] codegen pattern), bringing the span back under
 * the JIT cap, and its inner loop does zero allocation: the dot reads
 * `x[off+i]` directly ([[DecimalDotProduct.dotRange]] — no slice), and
 * only the winning id is returned.
 *
 * EXACT-equivalence contract with the struct-array form (pinned by
 * NativeExprPropertySpec + PqEncodePropertySpec + the full oracle gate):
 *  - score per entry:  "l2"  → −2·dot + norm   (pq d2 / l2AssignCol d2x)
 *                      "cos" → −(dot / norm)    (cosAssignCol negcos)
 *    with dot = the decimal-exact [[DecimalDotProduct]] arithmetic over
 *    x[offset ..), truncated exactly as `slice(x, offset+1, |cvec|)`.
 *  - winner: lexicographic min over (score, id) with Spark's struct
 *    ordering — i.e. Double.compare on scores (NaN greatest, −0.0 < 0.0,
 *    the same total order Spark's interpreted RowOrdering uses), NULL
 *    score FIRST (nulls-first ascending), ties on score fall to the
 *    smallest id (entries are iterated in ascending id order and a later
 *    entry replaces the best only on a strict compare).
 *  - a null input array / null slot nulls every entry's SCORE but never
 *    the struct or its literal id, so the argmin still returns an id —
 *    the smallest id among the null-scored entries, exactly as
 *    `array_min` orders (null, id) structs. Hence `nullable = false`
 *    honestly (the KnownNotNull wrapper the r15 form needed is subsumed),
 *    and the optimizer's pushed `isnotnull(id)` join-key guards fold at
 *    analysis time instead of re-evaluating the argmin in a Filter.
 */
case class CodebookArgmin(
    child: Expression,
    ids: IndexedSeq[Long],
    cvecs: IndexedSeq[IndexedSeq[Float]],
    norms: IndexedSeq[Double],
    kind: String,
    offset: Int,
    intOut: Boolean) extends UnaryExpression {

  require(ids.nonEmpty, "CodebookArgmin: empty codebook/centroid table")
  require(ids.length == cvecs.length && ids.length == norms.length,
    "CodebookArgmin: ids/cvecs/norms must align")
  require(ids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "CodebookArgmin: ids must be strictly ascending (the tie-break order)")
  require(kind == "l2" || kind == "cos", s"CodebookArgmin: unknown kind $kind")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = if (intOut) IntegerType else LongType
  override def nullable: Boolean = false
  override def prettyName: String = "codebook_argmin"
  // the default toString would print every codebook float into plan
  // strings; keep plans readable (the literals are pinned by the oracle)
  override def toString: String =
    s"$prettyName($child, kind=$kind, K=${ids.length}, off=$offset)"

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val vecArr: Array[Array[Float]] = cvecs.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] = norms.toArray
  @transient private lazy val isL2: Boolean = kind == "l2"

  /** The argmin. `x == null` (a null input array) nulls every score, so
    * the smallest id wins immediately. */
  def compute(x: ArrayData): Long = {
    if (x == null) return idArr(0)
    val k = idArr.length
    var bestId = 0L
    var bestScore = 0.0
    var bestNull = false
    var seen = false
    var i = 0
    while (i < k) {
      val dot = DecimalDotProduct.dotRange(x, offset, vecArr(i))
      val scoreNull = dot == null
      val score =
        if (scoreNull) 0.0
        else if (isL2) -2.0 * dot.doubleValue() + normArr(i)
        else -(dot.doubleValue() / normArr(i))
      // (score, id) lexicographic min, ids ascending: replace only on a
      // STRICT improvement; null score sorts first (nulls-first asc)
      val better =
        if (!seen) true
        else if (scoreNull) !bestNull // null beats non-null; ties keep earlier id
        else if (bestNull) false
        else java.lang.Double.compare(score, bestScore) < 0
      if (better) { bestId = idArr(i); bestScore = score; bestNull = scoreNull; seen = true }
      i += 1
    }
    bestId
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val id = compute(v.asInstanceOf[ArrayData])
    if (intOut) id.toInt else id
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argminExpr", this, classOf[CodebookArgmin].getName)
    val childGen = child.genCode(ctx)
    val javaType = if (intOut) "int" else "long"
    val castTail = if (intOut) "(int) " else ""
    val newCode =
      code"""
         |${childGen.code}
         |$javaType ${ev.value} = $castTail$ref.compute(
         |  ${childGen.isNull} ? null : ${childGen.value});
         |""".stripMargin
    ev.copy(code = newCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CodebookArgmin =
    copy(child = newChild)
}
