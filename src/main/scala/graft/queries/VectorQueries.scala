package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.TestData
import CoreQueries.Q

/**
 * Similarity search over the `embeddings` table (64-dim float vectors).
 *
 * Scores are dot products accumulated in DECIMAL(38,12): per-element
 * double products are IEEE-exact in both engines, and the exact decimal
 * sum is order-independent — so scores are bit-stable across partition
 * counts AND across the DuckDB oracle. At 100 TB the brute-force path is
 * a broadcast of the query vector over a single scan (no shuffle);
 * the bucketed (IVF-style, coarse cluster = `label`) path prunes the scan
 * to one bucket, and the k-NN-join path shuffles once on the bucket key.
 */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    TestData.graph(s, dir).V("embeddings").df

  /** Exact dot(embedding, qvec) accumulated in decimal, emitted as double.
    * Element scale 12 is preserved through every step (the re-cast in the
    * merge lambda only bounds precision, never scale), so the sum is exact
    * and order-independent — bit-equal to DuckDB's decimal list_sum. */
  private val dotExpr =
    """CAST(aggregate(zip_with(embedding, qvec, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))),
      |  CAST(0 AS DECIMAL(30,12)), (acc, v) -> CAST(acc + v AS DECIMAL(30,12))) AS DOUBLE)""".stripMargin

  private val dotSql =
    """CAST(list_sum(list_transform(list_zip(a.embedding, q.qvec),
      |  x -> CAST(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)""".stripMargin

  val all: Seq[Q] = Seq(
    Q("e01_knn_bruteforce",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
        e.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), expr(dotExpr).as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
              |SELECT a.vec_id, $dotSql AS score
              |FROM embeddings a CROSS JOIN q WHERE a.vec_id <> 0
              |ORDER BY score DESC, a.vec_id LIMIT 10""".stripMargin)),

    Q("e02_ann_ivf_bucket",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.where(col("vec_id") === 0)
          .select(col("embedding").as("qvec"), col("label").as("qlabel"))
        e.where(col("vec_id") =!= 0)
          .join(broadcast(q), col("label") === col("qlabel"))
          .select(col("vec_id"), expr(dotExpr).as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some(s"""WITH q AS (SELECT embedding AS qvec, label AS qlabel FROM embeddings WHERE vec_id = 0)
              |SELECT a.vec_id, $dotSql AS score
              |FROM embeddings a JOIN q ON a.label = q.qlabel WHERE a.vec_id <> 0
              |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin)),

    Q("e03_knn_join",
      (s, dir) => {
        val e = emb(s, dir)
        val queries = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
        val scored = e.crossJoin(broadcast(queries))
          .where(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"), expr(dotExpr).as("score"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id").asc)
        scored.withColumn("rank", row_number().over(w).cast("bigint"))
          .where(col("rank") <= 3)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
              |scored AS (
              |  SELECT q.q_id, a.vec_id AS n_id, $dotSql AS score
              |  FROM embeddings a CROSS JOIN q WHERE a.vec_id <> q.q_id)
              |SELECT q_id, n_id, score, rank FROM (
              |  SELECT q_id, n_id, score,
              |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS BIGINT) AS rank
              |  FROM scored) t
              |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    Q("e04_vector_norms",
      (s, dir) => emb(s, dir)
        .select(col("vec_id"),
          sqrt(expr(
            """CAST(aggregate(transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))),
              |  CAST(0 AS DECIMAL(30,12)), (acc, v) -> CAST(acc + v AS DECIMAL(30,12))) AS DOUBLE)""".stripMargin)).as("l2_norm"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, sqrt(CAST(list_sum(list_transform(embedding,
             |  x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)) AS l2_norm
             |FROM embeddings ORDER BY vec_id""".stripMargin))
  )
}
