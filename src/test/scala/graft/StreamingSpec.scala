package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamAgg

/** Structured Streaming surface: watermarked tumbling windows behave like
  * the batch time aggregation on the same events. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  it("hourlyAppend emits closed windows under watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
    val out = StreamAgg.hourlyAppend(spark, df)
    val q = out.writeStream.format("memory").queryName("hourly_test")
      .outputMode("append").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:05:00"), 1.0), (t("2024-01-01 10:45:00"), 2.0))
    q.processAllAvailable()
    // advance event time far past the watermark so the 10:00 window closes
    mem.addData((t("2024-01-01 15:00:00"), 3.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 18:00:00"), 4.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("hourly_test")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(rows.get("2024-01-01 10:00:00.0").contains(2L))
  }

  it("batch dailyBuckets matches the batch time aggregation") {
    val streamed = StreamAgg.dailyBuckets(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.queries.TimeQueries.all.find(_.name == "t01_time_agg_day").get
      .fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }
}
