package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Checkpoint-restart semantics — the property a 100 TB deployment
 * actually relies on: a streaming aggregation killed mid-stream and
 * restarted from its checkpoint must produce exactly the batch answer,
 * with no dropped or double-counted micro-batch. Spark's file source +
 * checkpoint commit log guarantee it; this spec pins the guarantee (and
 * our source-staging layout) against regressions.
 */
class StreamRestartSpec extends SparkSpec {

  it("a restarted stateful aggregation resumes from the checkpoint to the exact batch answer") {
    import spark.implicits._
    withScratchDir("graft_restart") { scratchDir =>
      val scratch = java.nio.file.Paths.get(scratchDir)
      val src = scratch.resolve("src"); val ckpt = scratch.resolve("ckpt").toString
      java.nio.file.Files.createDirectories(src)
      // the full logical input, arriving as two files: p1 before the
      // "crash", p2 after the restart
      val all = (0L until 200L).map(i => (i, i % 7, 1000L + i))
      all.take(100).toDF("id", "key", "v").coalesce(1).write.parquet(src.resolve("p1").toString)
      val schema = spark.read.parquet(src.resolve("p1").toString).schema

      def aggStream() = spark.readStream.schema(schema)
        .parquet(src.toString + "/p*")
        .groupBy(col("key"))
        .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))

      val table = "restart_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // phase 1: drain what exists (p1 only), then the query stops — the
      // "crash" point, with batch 0 committed in the checkpoint
      val q1 = aggStream().writeStream
        .format("memory").queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q1.awaitTermination()
      val afterCrash = spark.table(table).agg(sum(col("cnt"))).collect().head.getLong(0)
      assert(afterCrash == 100L, s"first run should have processed one file, saw $afterCrash rows")

      // phase 2: the rest of the data lands, and the query restarts from
      // the SAME checkpoint; the commit log must replay ONLY the new file
      // (p1 re-processing would double-count into the stateful aggregate)
      all.drop(100).toDF("id", "key", "v").coalesce(1).write.parquet(src.resolve("p2").toString)
      val q2 = aggStream().writeStream
        .format("memory").queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      val resumed = spark.table(table).orderBy("key")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      spark.catalog.dropTempView(table)

      val expected = all.groupBy(_._2).map { case (k, rows) =>
        (k, rows.size.toLong, rows.map(_._3).sum)
      }.toSeq.sortBy(_._1)
      assert(resumed == expected, s"resumed aggregate diverged from the batch answer: $resumed")
    }
  }
}
