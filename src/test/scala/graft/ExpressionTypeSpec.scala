package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/**
 * Analysis-time input-type rejection for the native expressions: each
 * reads raw ArrayData slots (getFloat/getLong/getUTF8String), so a
 * mistyped child must fail analysis instead of silently reading garbage.
 */
class ExpressionTypeSpec extends SparkSpec {

  private def longsDf = {
    val s = spark
    import s.implicits._
    Seq(Seq(1L, 2L, 3L)).toDF("xs")
  }
  private def intsDf = {
    val s = spark
    import s.implicits._
    Seq(Seq(1, 2, 3)).toDF("xs")
  }

  describe("native expression input-type checks") {

    it("MinHashSignature rejects array<int> and accepts array<bigint>") {
      val mk = (df: org.apache.spark.sql.DataFrame) => df.select(GraftBridge.column(
        graft.functions.MinHashSignature(
          GraftBridge.expression(col("xs")), Seq(3L), Seq(5L), 11L)).as("sig"))
      assertThrows[org.apache.spark.sql.AnalysisException](mk(intsDf).collect())
      assert(mk(longsDf).count() === 1)
    }

    it("SimHash rejects array<int>") {
      assertThrows[org.apache.spark.sql.AnalysisException] {
        intsDf.select(GraftBridge.column(
          graft.functions.SimHash(GraftBridge.expression(col("xs")), 16))).collect()
      }
    }

    it("ShingleHashes rejects array<bigint>") {
      assertThrows[org.apache.spark.sql.AnalysisException] {
        longsDf.select(GraftBridge.column(
          graft.functions.ShingleHashes(GraftBridge.expression(col("xs"))))).collect()
      }
    }

    it("registers every native function for SQL use") {
      graft.functions.GraftExtensions.register(spark)
      val row = spark.sql(
        """SELECT simhash(array(CAST(3 AS BIGINT))) AS sh,
          |  decimal_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
          |  size(shingle_hashes(array('a','b','c','d'))) AS n,
          |  window_md5_hashes(array('a','b','c'), 2) AS wh""".stripMargin)
        .collect().head
      assert(row.getLong(0) === 3L) // one hash with bits {0,1} set → signature 3
      assert(row.getDouble(1) === 11.0)
      assert(row.getInt(2) === 2) // 4 tokens → 2 word-3-shingle windows
      assert(row.getSeq[String](3).size === 2) // 3 tokens → 2 two-token windows
    }

    it("DecimalDotProduct rejects array<double> and accepts array<float>") {
      val s = spark
      import s.implicits._
      val doubles = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      assertThrows[org.apache.spark.sql.AnalysisException] {
        doubles.select(GraftBridge.column(graft.functions.DecimalDotProduct(
          GraftBridge.expression(col("a")), GraftBridge.expression(col("b"))))).collect()
      }
      val floats = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      val out = floats.select(GraftBridge.column(graft.functions.DecimalDotProduct(
        GraftBridge.expression(col("a")), GraftBridge.expression(col("b")))).as("dot"))
        .collect().head.getDouble(0)
      assert(out === 11.0)
    }
  }
}
