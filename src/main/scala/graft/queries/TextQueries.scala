package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.TestData
import CoreQueries.Q

/**
 * Training-data text pipeline over the `documents` table: exact + near
 * deduplication (MinHash/LSH banding, n-gram Jaccard, SimHash), token
 * counting, language-ID heuristic, quality scoring, fingerprinting.
 *
 * Scale notes: every op here is a per-row expression or a single
 * groupBy/self-join on a short key — no driver-side loops. The LSH band
 * join is the standard shingle→minhash→band→bucket-join shape: candidate
 * generation is an equi-join on the band key (shuffle on a short string),
 * and only candidates pay the full-Jaccard cost. All hashing is md5-based
 * so the DuckDB oracle can reproduce it bit-for-bit.
 */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    TestData.graph(s, dir).V("documents").df

  /** doc_id + word-3-shingle minhash signature (md5-min over shingles). */
  private def minhashDF(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        expr("""array_min(transform(sequence(1, size(toks) - 2),
               |  i -> md5(concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))))""".stripMargin)
          .as("mh"))

  private val shingleSetSql =
    """SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |  i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS ss
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |WHERE len(toks) >= 3""".stripMargin

  private val sigSql =
    """SELECT doc_id, list_aggregate(list_transform(generate_series(1, len(toks) - 2),
      |  i -> md5(concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))), 'min') AS mh
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |WHERE len(toks) >= 3""".stripMargin

  val all: Seq[Q] = Seq(
    Q("d01_exact_dedup_keep_first",
      (s, dir) => {
        val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
        docs(s, dir)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""SELECT doc_id FROM (
             |  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents) t WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    Q("d02_prefix_dup_groups",
      (s, dir) => docs(s, dir)
        .groupBy(md5(substring(col("text"), 1, 40).cast("binary")).as("fp"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
        .where(col("cnt") > 1)
        .orderBy("fp"),
      Some("""SELECT md5(substr(text, 1, 40)) AS fp, count(*) AS cnt, min(doc_id) AS keeper
             |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY fp""".stripMargin)),

    Q("d03_token_count",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("d04_marker_count",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          expr("CAST((length(text) - length(replace(text, 'the', ''))) div 3 AS BIGINT)").as("n_the"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST((length(text) - length(replace(text, 'the', ''))) // 3 AS BIGINT) AS n_the
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("d05_lang_id",
      (s, dir) => {
        def cnt(sub: String) = s"((length(text) - length(replace(text, '$sub', ''))) div ${sub.length})"
        docs(s, dir)
          .select(col("doc_id"),
            expr(cnt("the")).as("s_en"), expr(cnt("der")).as("s_de"),
            expr(cnt("le")).as("s_fr"), expr(cnt("el")).as("s_es"))
          .select(col("doc_id"),
            expr("""CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                   |     WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                   |     WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END""".stripMargin).as("pred_lang"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang
             |FROM (SELECT doc_id,
             |  (length(text) - length(replace(text, 'the', ''))) // 3 AS s_en,
             |  (length(text) - length(replace(text, 'der', ''))) // 3 AS s_de,
             |  (length(text) - length(replace(text, 'le', ''))) // 2 AS s_fr,
             |  (length(text) - length(replace(text, 'el', ''))) // 2 AS s_es
             |FROM documents) t ORDER BY doc_id""".stripMargin)),

    Q("d06_quality_score",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
          col("n_chars"))
        .select(col("doc_id"), col("n_tokens"),
          (col("n_chars").cast("double") / col("n_tokens")).as("avg_tok_len"),
          (col("n_chars").between(100, 500) && col("n_tokens") >= 20).as("quality_ok"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_tokens, CAST(n_chars AS DOUBLE) / n_tokens AS avg_tok_len,
             |  (n_chars BETWEEN 100 AND 500 AND n_tokens >= 20) AS quality_ok
             |FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, n_chars
             |      FROM documents) t ORDER BY doc_id""".stripMargin)),

    Q("d07_fingerprint",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), substring(md5(col("text").cast("binary")), 1, 16).as("fp"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, substr(md5(text), 1, 16) AS fp FROM documents ORDER BY doc_id")),

    Q("d08_minhash_signature",
      (s, dir) => minhashDF(s, dir).orderBy("doc_id"),
      Some(s"SELECT doc_id, mh FROM ($sigSql) sig ORDER BY doc_id")),

    Q("d09_lsh_band_candidates",
      (s, dir) => {
        val sig = minhashDF(s, dir).select(col("doc_id"), substring(md5(concat(lit("band:"), col("mh"))), 1, 4).as("band"))
        val a = sig.select(col("doc_id").as("a_id"), col("band"))
        val b = sig.select(col("doc_id").as("b_id"), col("band").as("band_b"))
        a.join(b, col("band") === col("band_b") && col("a_id") < col("b_id"))
          .select("a_id", "b_id").orderBy("a_id", "b_id")
      },
      Some(s"""WITH sig AS ($sigSql)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id
              |FROM sig a JOIN sig b ON substr(md5(concat('band:', a.mh)), 1, 4) = substr(md5(concat('band:', b.mh)), 1, 4) AND a.doc_id < b.doc_id
              |ORDER BY 1, 2""".stripMargin)),

    Q("d10_ngram_jaccard_verify",
      (s, dir) => {
        val sig = minhashDF(s, dir).select(col("doc_id"), substring(md5(concat(lit("band:"), col("mh"))), 1, 4).as("band"))
        val pairs = sig.select(col("doc_id").as("a_id"), col("band"))
          .join(sig.select(col("doc_id").as("b_id"), col("band").as("band_b")),
            col("band") === col("band_b") && col("a_id") < col("b_id"))
          .select("a_id", "b_id")
        val sh = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .where(size(col("toks")) >= 3)
          .select(col("doc_id"),
            expr("""array_distinct(transform(sequence(1, size(toks) - 2),
                   |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))""".stripMargin)
              .as("ss"))
        pairs
          .join(sh.select(col("doc_id").as("a_id"), col("ss").as("ssa")), "a_id")
          .join(sh.select(col("doc_id").as("b_id"), col("ss").as("ssb")), "b_id")
          .select(col("a_id"), col("b_id"),
            (size(array_intersect(col("ssa"), col("ssb"))).cast("double") /
              (size(col("ssa")) + size(col("ssb")) - size(array_intersect(col("ssa"), col("ssb")))))
              .as("jaccard"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH sig AS ($sigSql), sh AS ($shingleSetSql)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE) /
              |    (len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss))) AS jaccard
              |FROM sig a JOIN sig b ON substr(md5(concat('band:', a.mh)), 1, 4) = substr(md5(concat('band:', b.mh)), 1, 4) AND a.doc_id < b.doc_id
              |JOIN sh sa ON sa.doc_id = a.doc_id
              |JOIN sh sb ON sb.doc_id = b.doc_id
              |ORDER BY 1, 2""".stripMargin)),

    Q("d11_simhash",
      (s, dir) => {
        val toks = docs(s, dir).select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val h = toks.select(col("doc_id"),
          expr("CAST(conv(substr(md5(tok), 1, 4), 16, 10) AS INT)").as("h16"))
        val bits = h.select(col("doc_id"), col("h16"), explode(expr("sequence(0, 15)")).as("bit"))
        val signs = bits.groupBy(col("doc_id"), col("bit"))
          .agg(sum(expr("CASE WHEN shiftright(h16, bit) % 2 = 1 THEN 1 ELSE -1 END")).as("s"))
        signs.groupBy(col("doc_id"))
          .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(1, bit) ELSE 0 END")).cast("bigint").as("simhash"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 4)) AS INTEGER) AS h16 FROM tok),
             |b AS (SELECT doc_id, bit, SUM(CASE WHEN (h16 >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS s
             |      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) bits
             |      GROUP BY 1, 2)
             |SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS simhash
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
