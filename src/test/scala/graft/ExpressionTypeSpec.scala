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
