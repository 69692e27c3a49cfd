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
