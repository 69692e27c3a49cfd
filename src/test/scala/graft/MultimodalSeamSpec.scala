package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Pins the codec seam's contract ([[Multimodal.Codec]]): a deployment
  * with real image/audio libraries swaps the stand-in by passing its own
  * Codec to extractFeatures — these assertions are what such a swap must
  * keep true. */
class MultimodalSeamSpec extends SparkSpec {

  import spark.implicits._
  import MultimodalSeamSpec.MarkingCodec

  private def blobs(n: Int, parts: Int) =
    (1 to n).map(i => (i.toLong, "x" * i)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .repartition(parts)

  it("a swapped codec's features flow through the pipeline unchanged") {
    val out = Multimodal.extractFeatures(spark, blobs(6, 3),
      new MarkingCodec(spark.sparkContext.longAccumulator("opens"),
        spark.sparkContext.longAccumulator("closes")))
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq == (1 to 6).map(i => s"marked:$i"))
    assert(out.forall(_.getLong(2) == -99L))
  }

  it("open() runs once per partition, and close() runs once per open()") {
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    Multimodal.extractFeatures(spark, blobs(8, 2), new MarkingCodec(opens, closes)).count()
    // ≤ partitions with rows (empty partitions may skip the iterator);
    // strictly < row count proves per-partition, not per-row, init
    assert(opens.value >= 1L && opens.value <= 2L, s"opens=${opens.value}")
    // the leak clause: every native context allocated in open() is
    // released at task completion — accumulators from completed tasks are
    // merged before the action returns, so the counts must already agree
    assert(closes.value == opens.value, s"opens=${opens.value} closes=${closes.value}")
  }

  it("the default codec is the documented deterministic stand-in") {
    // identical bytes → identical features, across separate runs (the
    // speculative-retry determinism clause)
    val a = Multimodal.extractFeatures(spark, blobs(4, 2)).orderBy("doc_id").collect()
    val b = Multimodal.extractFeatures(spark, blobs(4, 4)).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // totality over degenerate bytes: empty payload yields a row, no throw
    val e = Multimodal.extractFeatures(spark,
      Seq((9L, Array.empty[Byte])).toDF("doc_id", "blob")).collect()
    assert(e.length == 1 && e.head.getLong(1) == 0L && e.head.getLong(2) == -1L)
  }
}

object MultimodalSeamSpec {
  /** A "real" codec stand-in distinguishable from FakeCodec: marks its
    * rows and counts per-partition open() calls through an accumulator.
    * Top-level on purpose — a Codec ships inside task closures, so it
    * must not capture a non-serializable outer (the seam's first clause). */
  private class MarkingCodec(opens: org.apache.spark.util.LongAccumulator,
                             closes: org.apache.spark.util.LongAccumulator)
      extends Multimodal.Codec {
    override def open(): (Long, Array[Byte]) => Multimodal.BinaryFeatures = {
      opens.add(1L) // once per partition, NOT per row
      features
    }
    override def close(): Unit = closes.add(1L) // once per open(), at task completion
    def features(id: Long, bytes: Array[Byte]): Multimodal.BinaryFeatures =
      Multimodal.BinaryFeatures(id, bytes.length.toLong, -99L, s"marked:${bytes.length}")
  }
}
