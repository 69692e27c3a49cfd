package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import graft.functions.MinHashSignature

/** Native MinHash expression: codegen and interpreted paths agree, and
  * both match the equivalent transform+array_min column composition. */
class MinHashSignatureSpec extends SparkSpec {

  private val P = 4294967311L
  private val as = Seq(3L, 1048573L, 7919L)
  private val bs = Seq(11L, 99991L, 0L)

  it("matches the declarative transform+array_min composition on both eval paths") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(17L, 4294967295L, 123456789L)),
      (2L, Seq(0L, 1L)),
      (3L, Seq(999999999L))).toDF("id", "hs")
    val native = df.select(
      col("id"),
      GraftBridge.column(MinHashSignature(GraftBridge.expression(col("hs")), as, bs, P)).as("sig"))
    val declarative = df.select(
      col("id"),
      array(as.zip(bs).map { case (a, b) =>
        array_min(transform(col("hs"), h => (h * lit(a) + lit(b)) % lit(P)))
      }: _*).as("sig"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val d = declarative.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n == d)
    // force the interpreted path too (codegen off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val i = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(i == d)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  it("ShingleHashes matches the conv/substr/md5 declarative form") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "a b c")).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("toks"))
    val native = df.select(col("id"),
      GraftBridge.column(graft.functions.ShingleHashes(GraftBridge.expression(col("toks")))).as("hs"))
    val declarative = df.select(col("id"),
      expr("""transform(sequence(1, size(toks) - 2),
             |  i -> CAST(conv(substr(md5(concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))), 1, 8), 16, 10) AS BIGINT))""".stripMargin).as("hs"))
    assert(native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap ==
      declarative.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }

  it("DecimalDotProduct matches the declarative decimal aggregate") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f, -0.25f, 1.125f), Seq(2.0f, 4.0f, -0.5f))).toDF("id", "x", "y")
    val native = df.select(
      GraftBridge.column(graft.functions.DecimalDotProduct(
        GraftBridge.expression(col("x")), GraftBridge.expression(col("y")))).as("d"))
    val declarative = df.select(
      expr("""CAST(aggregate(zip_with(x, y, (a, b) -> CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(20,12))),
             |  CAST(0 AS DECIMAL(30,12)), (acc, v) -> CAST(acc + v AS DECIMAL(30,12))) AS DOUBLE)""".stripMargin).as("d"))
    assert(native.collect().head.getDouble(0) == declarative.collect().head.getDouble(0))
  }

  it("is callable from SQL once registered (SparkSessionExtensions surface)") {
    graft.functions.GraftExtensions.register(spark)
    val out = spark.sql("SELECT minhash_signature(array(CAST(17 AS BIGINT), 4294967295)) AS sig")
      .collect().head.getSeq[Long](0)
    assert(out.length == graft.functions.MinHashDefaults.K)
    val (a0, b0) = graft.functions.MinHashDefaults.params.head
    val p = graft.functions.MinHashDefaults.P
    assert(out.head == math.min((a0 * 17L + b0) % p, (a0 * 4294967295L + b0) % p))
  }
}
