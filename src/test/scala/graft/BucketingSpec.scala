package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/**
 * Bucketed-write sink demo: the storage-level answer to "big fact-to-fact
 * joins shuffle on their key" (SURVEY §4 — the reference gets co-located
 * access from backend indexes; the Spark engine gets it from bucketed
 * parquet). Writing both join sides bucketed by the join key means the
 * join is planned WITHOUT a shuffle exchange on either side — at 100 TB
 * this is the difference between re-shuffling the fact table per query
 * and reading co-located buckets.
 */
class BucketingSpec extends SparkSpec {

  describe("bucketed write + co-located join") {
    it("plans a bucketed-by-key join with no shuffle exchange") {
      val s = spark
      import s.implicits._
      val dir = Files.createTempDirectory("graft_bucketing").toString
      val left = (1 to 1000).map(i => (i % 100, s"l$i")).toDF("k", "lv")
      val right = (1 to 500).map(i => (i % 100, i.toLong)).toDF("k", "rv")
      try {
        left.write.bucketBy(4, "k").sortBy("k")
          .option("path", s"$dir/t_left").mode("overwrite").saveAsTable("graft_b_left")
        right.write.bucketBy(4, "k").sortBy("k")
          .option("path", s"$dir/t_right").mode("overwrite").saveAsTable("graft_b_right")
        val threshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the non-broadcast path
        try {
          val joined = s.table("graft_b_left").join(s.table("graft_b_right"), "k")
          val shuffles = joined.queryExecution.sparkPlan.collect { case e: ShuffleExchangeExec => e }
          assert(shuffles.isEmpty, s"expected no shuffle for a bucketed join, got:\n${joined.queryExecution.sparkPlan}")
          // and it is still a correct join
          assert(joined.count() === 1000L * 5) // each left row matches 500/100 = 5 right rows
        } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      } finally {
        s.sql("DROP TABLE IF EXISTS graft_b_left")
        s.sql("DROP TABLE IF EXISTS graft_b_right")
      }
    }
  }
}
