package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Default MinHash parameterization shared by the SQL function surface and
  * the text-pipeline queries: K=128 md5-derived universal-hash pairs over
  * P (prime > 2^32), a_i < 2^30 so products stay inside signed 64-bit. */
object MinHashDefaults {
  val K = 128
  val P = 4294967311L
  /** md5-derived deterministic seed value — the single source for every
    * hash constant in the engine (MinHash a/b pairs, SRP hyperplanes). */
  def mdLong(seed: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(seed.getBytes("UTF-8"))
    BigInt(1, d.take(8)).toLong.abs
  }
  val params: IndexedSeq[(Long, Long)] =
    (0 until K).map(i => (1L + mdLong(s"graft:a:$i") % ((1L << 30) - 1), mdLong(s"graft:b:$i") % P))
}

/**
 * SparkSessionExtensions hook registering the engine's native functions
 * for SQL use (`spark.sql.extensions=graft.functions.GraftExtensions` at
 * deploy time; [[GraftExtensions.register]] for a live session). Today:
 * `minhash_signature(array<bigint>) → array<bigint>` with the default
 * 128-permutation parameterization.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.minhashFunction)
    // metadata-only count rewrite (opt-in via its conf flag)
    ext.injectOptimizerRule(session => graft.plans.MetadataCountRule(session))
  }
}

object GraftExtensions {
  private val minhashBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "minhash_signature(hashes: array<bigint>) takes one argument")
    MinHashSignature(args.head, MinHashDefaults.params.map(_._1), MinHashDefaults.params.map(_._2), MinHashDefaults.P)
  }

  val minhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
    minhashBuilder)

  /** Register the function set on an already-running session. */
  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "minhash_signature", minhashBuilder)
}
