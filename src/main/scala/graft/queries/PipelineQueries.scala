package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal
import graft.sources.TestData
import graft.streaming.StreamAgg
import CoreQueries.Q

/** Multimodal + streaming entries of the pipeline surface. */
object PipelineQueries {

  val all: Seq[Q] = Seq(
    Q("m01_binary_features",
      (s, dir) => {
        val docs = TestData.graph(s, dir).V("documents").df
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
        Multimodal.extractFeatures(s, docs).orderBy("doc_id")
      },
      // text is ASCII, so first_byte == ascii of the first char and the
      // blob byte length == the string length.
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
             |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
             |  md5(text) AS content_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("s01_stream_daily_buckets",
      (s, dir) => StreamAgg.dailyBuckets(s, dir),
      Some("""SELECT (epoch_ms(ts) - epoch_ms(ts) % 86400000) AS bucket_ms, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS val_sum
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
