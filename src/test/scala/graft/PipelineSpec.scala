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

  it("blob chunking round-trips empty payloads and filters null ones") {
    val df = Seq(
      (1L, Some("0123456789abcdef0123")), // 20 bytes → 3 chunks of 8
      (2L, Some("")),                     // empty → 1 empty chunk
      (3L, None)                          // null → filtered (nothing to store)
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val out = Multimodal.reassembleBlobs(Multimodal.chunkBlobs(df, 8))
      .select(col("doc_id"), col("n_chunks"), col("blob").cast("string"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == ((3L, "0123456789abcdef0123")))
    assert(out(2L) == ((1L, "")))
    assert(!out.contains(3L))
  }

  it("ShingleHashes skips windows containing null tokens") {
    import org.apache.spark.sql.GraftBridge
    val df = Seq(Tuple1(Seq(Some("a"), None, Some("b"), Some("c"), Some("d")))).toDF("toks")
    val out = df.select(
      GraftBridge.column(graft.functions.ShingleHashes(GraftBridge.expression(col("toks")))).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(out.length == 1) // only (b, c, d) — windows touching the null skipped
  }
}
