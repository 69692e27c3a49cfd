package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Invariants of the round-9 additions e10_semdedup (SemDeDup) and
  * d26_mixture_sample (token-budget data mixing) that the DuckDB oracle
  * gate can't see: the oracle proves cross-engine value parity, these
  * prove the SEMANTICS — the keep policy can never empty a cluster, and
  * the distributed two-level prefix sum takes exactly the maximal
  * hash-ordered prefix the budget allows.
  */
class MixtureSemDedupSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  describe("e10_semdedup") {
    it("covers the corpus and never empties a cluster (the exemplar survives)") {
      val rows = SparkEntry.queries("e10_semdedup")(spark, sfDir)
        .select("cid", "members", "removed").collect()
      assert(rows.length > 1, "expected multiple clusters")
      val members = rows.map(_.getLong(1)).sum
      assert(members === 500L, "every vector must be assigned to exactly one cluster")
      rows.foreach { r =>
        val (m, rm) = (r.getLong(1), r.getLong(2))
        assert(rm >= 0L && rm < m,
          s"cluster ${r.getLong(0)}: removed=$rm of members=$m — the member " +
            "farthest from the centroid wins every keep comparison and cannot be removed")
      }
      assert(rows.map(_.getLong(2)).sum > 0L, "threshold should remove a non-trivial set")
    }
  }

  describe("d26_mixture_sample") {
    /** The single-window reference sample: per-lang hash-ordered cumsum. */
    def referenceCum = {
      val t = graft.sources.TestData.graph(spark, sfDir).V("documents").df
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("bigint").as("n_tok"),
          md5(col("doc_id").cast("string")).as("h"))
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("tot", sum(col("n_tok")).over(Window.partitionBy(col("lang"))))
    }

    it("two-level distributed prefix sum equals the single-window sample") {
      val twoLevel = SparkEntry.queries("d26_mixture_sample")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      val single = referenceCum.where(col("cum") * 10 <= col("tot") * 3)
        .groupBy("lang")
        .agg(count(lit(1)).as("d"), sum(col("n_tok")).as("s"), max(col("tot")).as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      assert(twoLevel.nonEmpty)
      assert(twoLevel === single)
    }

    it("the sample is the MAXIMAL budget-respecting prefix per language") {
      val byLang = referenceCum.select("lang", "n_tok", "cum", "tot", "h", "doc_id")
        .orderBy("lang", "h", "doc_id").collect().groupBy(_.getString(0))
      val result = SparkEntry.queries("d26_mixture_sample")(spark, sfDir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      byLang.foreach { case (lang, rows) =>
        val tot = rows.head.getLong(3)
        val inBudget = rows.takeWhile(_.getLong(2) * 10 <= tot * 3)
        val (docs, toks) = result.getOrElse(lang, (0L, 0L))
        assert(docs === inBudget.length.toLong, s"$lang: sample is not the hash-ordered prefix")
        assert(toks === inBudget.map(_.getLong(1)).sum, s"$lang: sampled token total mismatch")
        // maximality: the next hash-ordered doc would exceed the budget
        if (inBudget.length < rows.length) {
          val next = rows(inBudget.length)
          assert(next.getLong(2) * 10 > tot * 3, s"$lang: a doc that fits was left out")
        }
      }
      assert(result.nonEmpty)
    }
  }
}
