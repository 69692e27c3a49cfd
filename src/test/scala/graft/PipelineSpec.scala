package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Multimodal binary-column plumbing. */
class PipelineSpec extends SparkSpec {

  import spark.implicits._

  it("extractFeatures decodes per-partition with a deterministic codec") {
    val df = Seq((1L, "hello"), (2L, ""), (3L, "Zebra")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .repartition(2)
    val out = Multimodal.extractFeatures(spark, df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((5L, 'h'.toLong, "5d41402abc4b2a76b9719d911017c592")))
    assert(out(2L)._1 == 0L && out(2L)._2 == -1L)
    assert(out(3L)._2 == 'Z'.toLong)
  }
}
