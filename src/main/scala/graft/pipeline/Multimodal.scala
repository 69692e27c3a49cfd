package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns with typed metadata, and run decode/feature-extract as
 * per-partition imperative code (the place a real deployment calls an
 * image/audio codec; Scala analog of a batched pandas-UDF stage).
 *
 * The codec libraries are not in this container, so [[FakeCodec]] is a
 * clearly-marked deterministic stand-in — the Spark-side plumbing (schema,
 * partitioning, per-partition batch shape, feature schema) is real and
 * oracle-tested via `m01_binary_features`.
 *
 * Scale notes: `mapPartitions` keeps codec initialization per-partition
 * (not per-row); the input stays columnar until the decode stage; output
 * is a narrow typed Dataset so downstream ops return to full Catalyst
 * optimization. Decode is embarrassingly parallel — no shuffle.
 */
object Multimodal {

  /** Extracted features for one binary payload. */
  final case class BinaryFeatures(doc_id: Long, byte_len: Long, first_byte: Long, content_md5: String)

  /** THE CODEC SEAM: everything a decoder needs to provide to run inside
    * the per-partition decode stage. A deployment with real image/audio
    * libraries implements this trait (initializing its native decoder in
    * [[open]], once per partition/task — NOT per row) and passes it to
    * [[extractFeatures]]; nothing else in the pipeline changes. The
    * contract the spec pins (MultimodalSeamSpec):
    *   - instances are Serializable (they ship inside task closures);
    *   - [[open]] is called once per partition before any [[features]]
    *     call and returns the per-partition decode function;
    *   - [[features]] is total over arbitrary bytes (a corrupt payload
    *     yields a row describing it, never a task failure — at 100 TB a
    *     single bad blob must not kill a stage);
    *   - output is deterministic for identical bytes (rebuilds and
    *     speculative task retries must agree);
    *   - [[close]] runs exactly once per [[open]], at task completion
    *     (success, failure, OR speculative kill — the pipeline registers
    *     it as a TaskCompletionListener), so a native decoder context
    *     allocated in open() never leaks across the task boundary. */
  trait Codec extends Serializable {
    /** Per-partition initialization hook; the returned function is the
      * actual decoder. The default wires [[features]] straight through —
      * a real codec overrides this to allocate its native context once. */
    def open(): (Long, Array[Byte]) => BinaryFeatures = features
    /** Per-partition teardown, invoked by the pipeline at task completion
      * on every path (incl. failed and killed tasks). A real codec
      * releases the native context allocated in [[open]] here; the
      * default is a no-op to match the default open(). */
    def close(): Unit = ()
    def features(id: Long, bytes: Array[Byte]): BinaryFeatures
  }

  /** Stand-in for a real image/audio decoder — the codec LIBRARIES are
    * not in this container, so this emits deterministic byte-level
    * features through the same seam a real decoder would. A production
    * build swaps it via [[extractFeatures]]'s codec parameter. */
  object FakeCodec extends Codec {
    def features(id: Long, bytes: Array[Byte]): BinaryFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map(b => f"$b%02x").mkString
      BinaryFeatures(id, bytes.length.toLong, if (bytes.isEmpty) -1L else (bytes(0) & 0xff).toLong, hex)
    }
  }

  /** Binary feature extraction over (id, blob) rows: one codec open per
    * partition, one output row per payload. */
  def extractFeatures(spark: SparkSession, withBlob: DataFrame,
                      codec: Codec = FakeCodec): DataFrame = {
    import spark.implicits._
    withBlob.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // teardown on EVERY task exit path (success/failure/kill): a real
        // codec's native context must not survive the task, and making
        // each implementor invent its own cleanup would guarantee leaks.
        // Registered BEFORE open(): an open() that throws after partially
        // allocating still gets its close() (implementations tolerate a
        // never-opened state — the trait contract), so the "exactly once
        // per open()" promise covers the failure path too.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
        val decode = codec.open() // per-partition codec init
        rows.map { case (id, bytes) => decode(id, bytes) }
      }
      .toDF()
  }

  /** Chunked blob storage (reference: StorageSrv + NextChunk chain,
    * models/Database.scala:322-394 — blobs stored as fixed-size chunk
    * vertices): split each payload into `chunkSize`-byte pieces as
    * (id, chunk_idx, chunk) rows — the table a store would persist — all
    * inside one per-row expression, no shuffle. An EMPTY payload stores
    * one empty chunk (so it round-trips instead of vanishing); NULL
    * payloads are filtered — a content store has nothing to persist for
    * them, and silently dropping them mid-explode would be worse. */
  def chunkBlobs(withBlob: DataFrame, chunkSize: Int): DataFrame =
    withBlob.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .where(col("blob").isNotNull)
      .select(
        col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, greatest(CAST(ceil(length(blob) / $chunkSize.0) AS INT), 1) - 1, 1)," +
            s" i -> substring(blob, i * $chunkSize + 1, $chunkSize))")))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")

  /** Reassemble chunked blobs: order-preserving binary concat per id
    * (the read side of the chunk chain), with the chunk count carried
    * from the same aggregation. */
  def reassembleBlobs(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))).as("cs"))
      .select(
        col("doc_id"),
        size(col("cs")).cast("long").as("n_chunks"),
        expr("aggregate(cs, CAST('' AS BINARY), (acc, c) -> concat(acc, c.chunk))").as("blob"))

  /** One sampled frame of a binary payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_len: Long, frame_md5: String)

  /** Frame sampling over (id, blob) rows — the video/audio frame-extract
    * plumbing: each payload fans out to `n` evenly-spaced byte slices
    * ("frames"; a real codec would decode at sampled timestamps), one
    * output row per frame. Embarrassingly parallel, rows fan out inside
    * the partition — no shuffle, no driver involvement. */
  def sampleFrames(spark: SparkSession, withBlob: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    withBlob.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, bytes) =>
          (0 until n).map { i =>
            val start = (i.toLong * bytes.length / n).toInt
            val end = ((i + 1).toLong * bytes.length / n).toInt
            val slice = java.util.Arrays.copyOfRange(bytes, start, end)
            md.reset()
            Frame(id, i, (end - start).toLong, md.digest(slice).map(b => f"$b%02x").mkString)
          }
        }
      }
      .toDF()
  }
}
