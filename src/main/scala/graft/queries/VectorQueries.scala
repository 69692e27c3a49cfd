package graft.queries

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import CoreQueries.Q

/**
 * Similarity search over the `embeddings` table (64-dim float vectors).
 *
 * Scores are dot products accumulated in DECIMAL(38,12): per-element
 * double products are IEEE-exact in both engines, and the exact decimal
 * sum is order-independent — so scores are bit-stable across partition
 * counts AND across the DuckDB oracle.
 *
 * ANN design: a data-derived coarse quantizer — sign random projection
 * (SRP-LSH) over corpus-sized md5-derived integer hyperplanes (bit count
 * auto-derived from the corpus and stored as index metadata, see
 * [[graft.sources.AnnIndex.deriveNBits]]) — assigns every vector a bucket
 * code; signs are computed with exact decimal accumulation so bucket
 * assignment is deterministic across engines and partitionings. The code
 * table is materialized (the stored IVF index of a production deployment,
 * where it is also the partition key). Queries multi-probe all buckets
 * within Hamming distance [[graft.sources.AnnIndex.ProbeRadius]] and rescore
 * candidates exactly. The k-NN JOIN explodes each query into its probe
 * codes and equi-joins on the code — one broadcast/shuffle join on a
 * short key, not an O(N×Q) cross join.
 *
 * QUERY-VECTOR SOURCING CONTRACT: every single-query probe fetches its
 * query vector from the COMPACT source table with a pushed-down vec_id
 * filter, and quantizes it client-side ([[graft.sources.AnnIndex
 * .codeVectors]] over that one row) — never by filtering a stored
 * code-partitioned index by vec_id, which at production layout opens
 * every code directory to find one row (measured at sf10: the unpruned
 * lookup alone held the e13 probe at ~15 s). A production client holds
 * its own vector; the pushdown scan is the test-harness stand-in.
 *
 * Index/quantizer LIFECYCLE (training, stored artifacts, warm hooks)
 * lives in [[graft.sources.AnnIndex]]; this object holds the probe plans
 * and their DuckDB oracles, which recompute everything from raw
 * embeddings — index reads and fresh computation are bit-identical, so
 * the oracles gate the whole lifecycle.
 *
 * Parameter note: nbits/ProbeRadius trade recall for scan fraction; nbits
 * sizes itself from the corpus. The synthetic testdata embeddings are
 * near-random unit vectors (top-5 neighbor cosine ≈ 0.37, no cluster
 * structure), the hardest possible geometry; 6 bits/radius 2 measures
 * recall@5 ≈ 0.5 at a 35 % scan fraction there. Real embedding corpora
 * with tight neighbor cosines (≥ 0.9) support more bits and a smaller
 * probe radius, i.e. far smaller scan fractions at high recall.
 */
object VectorQueries {

  // quantizer definitions + stored-index lifecycle (split out in r12;
  // private[graft] members, so the wildcard exposes them here only)
  import graft.sources.AnnIndex._
  // oracle-SQL builders (split out in r14 — zero oracle changes)
  import VectorOracles._

  // ProbeRadius/probeMasksFor live with the quantizer geometry in
  // AnnIndex (the s18 probe stream shares them); exposed here via the
  // wildcard import above.
  /** Hot-bucket cap for the d12 self-join (mirrors TextQueries.BucketCap):
    * an SRP bucket larger than this is skipped entirely, so a skewed or
    * duplicate-heavy corpus can never make one bucket's pair explosion
    * quadratic — the worst case is structurally Cap²/2 per bucket
    * regardless of data. Healthy buckets never approach it: the
    * auto-derived bit count pins expected occupancy ≤ TargetOccupancy
    * (≤ ~915 even at the NBitsMax ceiling for sf100), so only genuine
    * skew/duplicate pathologies are dropped — and they are observed. */
  private val VecBucketCap = 2000L

  /** The client side of the sourcing contract: the query vector as a
    * 1-row pushdown off the compact source. */
  private def queryVec(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).where(col("vec_id") === 0).select(col("embedding").as("qvec"))

  /** The client's own SRP quantization of its query vector (one tiny
    * pushdown scan + the coding expression — never an index lookup). */
  private def queryCode(s: SparkSession, dir: String, nbits: Int): Long =
    codeVectors(emb(s, dir).where(col("vec_id") === 0), nbits)
      .select(col("code")).head().getLong(0)

  /** The d12 plan from a coded-vector table (shared by the oracle query
    * and the skew stress spec). Hot-bucket cap: a bucket outside
    * [2, VecBucketCap] never joins — singleton buckets yield no pairs
    * anyway, and an oversized bucket (duplicate-heavy corpus, too few
    * bits for the data volume) would be the quadratic hot spot, so it is
    * structurally excluded. The window shuffles on `code`, the same key
    * the self-join needs. No silent caps: rows living in over-cap buckets
    * (and the max bucket size) are emitted as named observed metrics in
    * the same pass — a listener/driver reads them off the plan, so a
    * corpus whose hot buckets start swallowing candidates is visible
    * without a second scan. */
  private[graft] def cosineNearDupFrom(coded: DataFrame): DataFrame = {
    val sized = coded
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("code"))))
      .observe("d12_bucket_cap",
        sum(when(col("bn") > VecBucketCap, 1L).otherwise(0L)).as("rows_in_capped_buckets"),
        max(col("bn")).as("max_bucket_size"))
      .where(col("bn").between(2L, VecBucketCap))
    val a = sized.select(col("vec_id").as("a_id"), col("embedding").as("ea"), col("code"), col("norm").as("na"))
    val b = sized.select(col("vec_id").as("b_id"), col("embedding").as("eb"), col("code").as("code_b"), col("norm").as("nb"))
    a.join(b, col("code") === col("code_b") && col("a_id") < col("b_id"))
      .withColumn("dot", dotNative("ea", "eb"))
      .select(col("a_id"), col("b_id"), (col("dot") / (col("na") * col("nb"))).as("cosine"))
      .where(col("cosine") >= NearDupCosine)
      .orderBy("a_id", "b_id")
  }



  private val dotSql =
    """CAST(list_sum(list_transform(list_zip(a.embedding, q.qvec),
      |  x -> CAST(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)""".stripMargin

  // ------------------------------------------ shared IVF probe (e05/e06)
  /** Query side: probe the NProbe nearest centroid buckets of the query
    * vector (sourced per the client contract) and exact-rescore only
    * inside them (bucket pruning on the stored index). */
  private def probeAndRescore(s: SparkSession, dir: String,
      cents: DataFrame, assigned: DataFrame): DataFrame = {
    val q = queryVec(s, dir)
    // top-NProbe via orderBy+limit (TakeOrderedAndProject), not a global
    // row_number window: same deterministic result over the K-row
    // centroid table, but no WindowExec single-partition move — the
    // global-window WARN it fired on every probe was noise here (K=8
    // rows) yet the shape would be real at a large K
    val qprobe = cents.crossJoin(broadcast(q))
      .withColumn("qcos", dotNative("cvec", "qvec") / col("cnorm"))
      .orderBy(col("qcos").desc, col("cid").asc)
      .limit(NProbe)
      .select(col("cid"))
    // `assigned` carries (embedding, cid) from one map-side pass
    // (AnnIndex.withCentroid) — the former narrow-assignment shape had to
    // join the corpus back on vec_id here just to re-fetch the embedding
    assigned.join(broadcast(qprobe), "cid")
      .where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(5)
  }



  /** Query-time ADC lookup table: exact sub-dots of the query vector
    * against every stored codebook entry — M×KSub rows, checkpointed
    * (joined MSub times downstream). Shared by e08/e14/e15 — and cached
    * per (session, dir) so one bench/serving session builds the small
    * table once, not once per probe query (the established SessionCache
    * pattern for every other shared intermediate); released with the
    * e-family caches below. */
  private val lutCache = new graft.util.SessionCache[DataFrame]
  private def queryLut(s: SparkSession, dir: String): DataFrame =
    lutCache.getOrElseUpdate(s, dir)(lutOf(s, dir, pqCodebooks(s, dir)))

  /** ONE definition of the LUT construction for both codebook families
    * (raw-vector e08/e14/e15 and residual e16) — the arithmetic must not
    * fork between them. */
  private def lutOf(s: SparkSession, dir: String, codebooks: DataFrame): DataFrame =
    codebooks.crossJoin(broadcast(queryVec(s, dir)))
      .select(col("m"), col("k"),
        dotNativeC(expr(s"slice(qvec, m * $SubDim + 1, $SubDim)"), col("cvec")).as("l"))
      .localCheckpoint()

  /** Free this session's query-LUT checkpoint blocks (bench
    * inter-family release; rebuilds lazily). */
  private[graft] def releaseCaches(s: SparkSession): Unit =
    lutCache.removeAll(s).foreach(GraftBridge.unpersistLocalCheckpoint)

  /** e16's query-time RESIDUAL ADC lookup table — [[lutOf]] against the
    * residual-trained codebooks (the query itself is NOT residualized:
    * dot(q, residual(x)) decomposes per subspace against the residual
    * codebook entries directly). Session-cached like queryLut. */
  private def rpqQueryLut(s: SparkSession, dir: String): DataFrame =
    lutCache.getOrElseUpdate(s, s"$dir#rpq")(lutOf(s, dir, rpqCodebooks(s, dir)))

  /** The M broadcast LUT joins every ADC scorer runs (one l$m column per
    * subspace) — the join stage must not fork between the raw and
    * residual families; only the approx SUM differs (e08/e14/e15 reduce
    * the lookups, e16 folds them onto its per-bucket term0, each with
    * its own fixed addition order mirrored in its oracle). */
  private def lutJoined(codes: DataFrame, lut: DataFrame): DataFrame =
    (0 until MSub).foldLeft(codes) { (df, m) =>
      df.join(broadcast(lut.where(col("m") === m)
        .select(col("k").as(s"k$m"), col("l").as(s"l$m"))), s"k$m")
    }

  /** ADC scoring over a stored code table: every row's approximate dot
    * is the fixed-order sum of M broadcast LUT lookups — map-side, no
    * shuffle, nothing but small ints and the 64-row LUT. Shared by
    * e08/e14/e15. */
  private def adcApprox(codes: DataFrame, lut: DataFrame): DataFrame =
    lutJoined(codes, lut).select(col("vec_id"),
      (0 until MSub).map(m => col(s"l$m")).reduce(_ + _).as("approx"))





  val all: Seq[Q] = Seq(
    Q("e01_knn_bruteforce",
      (s, dir) => {
        val e = emb(s, dir)
        val q = queryVec(s, dir)
        e.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
              |SELECT a.vec_id, $dotSql AS score
              |FROM embeddings a CROSS JOIN q WHERE a.vec_id <> 0
              |ORDER BY score DESC, a.vec_id LIMIT 10""".stripMargin)),

    Q("e11_sq8_quantized_ann",
      // scalar-quantized ANN: per-vector symmetric int8 codes (element
      // scale = max|v|/127) — the 4×-smaller representation an embedding
      // store actually scans at 100 TB; full-precision vectors are only
      // fetched for the capped re-rank. The approximate score is an
      // integer dot product (every int8×int8 product and the ≤ 64·127²
      // sum are integral, so BIGINT accumulation is exact and
      // order-independent, and the one double cast is lossless) rescaled
      // by the two vectors' scales; top-ReRank candidates are re-ranked
      // with the exact decimal dot. One corpus pass + a broadcast
      // ReRank-row join back to the full-precision table — the join the
      // production layout serves by id without touching the corpus.
      (s, dir) => {
        val e = emb(s, dir)
        val sq = e
          .select(col("vec_id"), col("embedding"),
            expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))").as("maxabs"))
          .select(col("vec_id"), col("embedding"), col("maxabs"),
            expr("""transform(embedding, x -> CASE WHEN maxabs = 0.0 THEN 0
                   |  ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS INT) END)""".stripMargin).as("qcode"))
        val q = sq.where(col("vec_id") === 0)
          .select(col("qcode").as("qq"), col("maxabs").as("qmax"), col("embedding").as("qvec"))
        val cand = sq.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q.select(col("qq"), col("qmax"))))
          .select(col("vec_id"),
            expr("""CAST(aggregate(zip_with(qcode, qq, (x, y) -> CAST(x AS BIGINT) * y),
                   |  CAST(0 AS BIGINT), (a, b) -> a + b) AS DOUBLE) * maxabs * qmax / 16129.0""".stripMargin).as("approx"))
          .orderBy(col("approx").desc, col("vec_id").asc)
          .limit(ReRank)
        cand.join(e, Seq("vec_id"))
          .crossJoin(broadcast(q.select(col("qvec"))))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some(s"""WITH m AS (SELECT vec_id, embedding,
              |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs FROM embeddings),
              |sq AS (SELECT vec_id, embedding, maxabs,
              |    list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
              |      ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS INT) END) AS qcode FROM m),
              |q AS (SELECT qcode AS qq, maxabs AS qmax, embedding AS qvec FROM sq WHERE vec_id = 0),
              |cand AS (
              |  SELECT a.vec_id,
              |    CAST(list_sum(list_transform(list_zip(a.qcode, q.qq), z -> CAST(z[1] AS BIGINT) * z[2])) AS DOUBLE)
              |      * a.maxabs * q.qmax / 16129.0 AS approx
              |  FROM sq a, q WHERE a.vec_id <> 0
              |  ORDER BY approx DESC, a.vec_id LIMIT $ReRank)
              |SELECT e.vec_id, ${dotSqlOf("e.embedding", "q.qvec")} AS score
              |FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id CROSS JOIN q
              |ORDER BY score DESC, e.vec_id LIMIT 5""".stripMargin)),

    Q("e02_ann_srp_probe",
      // single-query ANN: multi-probe the query's SRP bucket out to
      // Hamming distance ProbeRadius, exact rescore inside candidates
      // only. The query's code is the CLIENT's own quantization off the
      // compact source (see the sourcing contract above) — identical by
      // construction to the stored code, so the oracle (which derives it
      // from its codes CTE) agrees.
      (s, dir) => {
        val coded = codedVectors(s, dir)
        val qcode = queryCode(s, dir, nbitsOf(s, dir))
        val q = queryVec(s, dir)
        coded.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .where(expr(s"bit_count(code ^ ${qcode}L) <= $ProbeRadius"))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some(s"""WITH codes AS ($codesSql),
              |q AS (SELECT code AS qcode, embedding AS qvec FROM codes WHERE vec_id = 0)
              |SELECT a.vec_id, ${dotSqlOf("a.embedding", "q.qvec")} AS score
              |FROM codes a CROSS JOIN q
              |WHERE a.vec_id <> 0 AND bit_count(xor(a.code, q.qcode)) <= $ProbeRadius
              |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin)),

    Q("e09_ann_partitioned_probe",
      // e02's probe against the PRODUCTION index layout: the coded table
      // stored partitioned by bucket code, the query's probe set expanded
      // driver-side (a client knows its own code) into an explicit IN
      // filter on the partition column — the scan prunes to the probed
      // bucket directories and never opens the rest (PlanQualitySpec
      // asserts the PartitionFilters). Same answer as e02 by
      // construction; the code lookup is the client's own quantization
      // off the compact source, not an index scan.
      (s, dir) => {
        val idx = partitionedIndex(s, dir)
        val nb = nbitsOf(s, dir)
        val qcode = queryCode(s, dir, nb) // ONE driver-side head(), hoisted out of the mask map
        val probes = probeMasksFor(nb).map(_ ^ qcode)
        val q = queryVec(s, dir)
        idx.where(col("code").isin(probes: _*))
          .where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some(s"""WITH codes AS ($codesSql),
              |q AS (SELECT code AS qcode, embedding AS qvec FROM codes WHERE vec_id = 0)
              |SELECT a.vec_id, ${dotSqlOf("a.embedding", "q.qvec")} AS score
              |FROM codes a CROSS JOIN q
              |WHERE a.vec_id <> 0 AND bit_count(xor(a.code, q.qcode)) <= $ProbeRadius
              |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin)),

    Q("e07_ann_recall_metric",
      // index-quality monitoring: recall@5 of the SRP multi-probe against
      // the brute-force truth, plus the candidate (scan) count — the
      // metric a production ANN deployment computes on a sampled query set
      // to decide when NBits/ProbeRadius need retuning. Truth is a top-5
      // over the corpus (the sampled audit pays brute force ONCE to price
      // the index); candidates come via the same probe predicate the
      // index serves, seeded by the client's own quantization. Both
      // sides are tiny aggregates crossed at the end — nothing but the
      // brute-force audit scan touches the corpus.
      (s, dir) => {
        val coded = codedVectors(s, dir)
        val qcode = queryCode(s, dir, nbitsOf(s, dir))
        val q = queryVec(s, dir)
        val truth = coded.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
        // materialized once: both the hit count and the scan count read it,
        // and an unshared plan would re-run the probe join (a full extra
        // index scan per audit at scale)
        val cand = coded.where(col("vec_id") =!= 0)
          .where(expr(s"bit_count(code ^ ${qcode}L) <= $ProbeRadius"))
          .select(col("vec_id"))
          .localCheckpoint()
        val hits = truth.join(cand, "vec_id")
          .agg((count(lit(1)).cast("double") / 5d).as("recall_at_5"))
        val scanned = cand.agg(count(lit(1)).as("scanned"))
        hits.crossJoin(scanned)
      },
      Some(s"""WITH codes AS ($codesSql),
              |q AS (SELECT code AS qcode, embedding AS qvec FROM codes WHERE vec_id = 0),
              |truth AS (SELECT a.vec_id FROM codes a CROSS JOIN q WHERE a.vec_id <> 0
              |  ORDER BY ${dotSqlOf("a.embedding", "q.qvec")} DESC, a.vec_id LIMIT 5),
              |cand AS (SELECT a.vec_id FROM codes a CROSS JOIN q
              |  WHERE a.vec_id <> 0 AND bit_count(xor(a.code, q.qcode)) <= $ProbeRadius)
              |SELECT (SELECT CAST(count(*) AS DOUBLE) / 5 FROM truth JOIN cand USING (vec_id)) AS recall_at_5,
              |  (SELECT count(*) FROM cand) AS scanned""".stripMargin)),

    Q("e03_knn_bucketed_join",
      // k-NN JOIN: each query explodes into its probe codes (Hamming ≤
      // ProbeRadius masks); candidates arrive via an equi-join on the code
      // (broadcast here, shuffle-on-code at scale) — never an O(N×Q) cross
      // join. Each candidate matches exactly one probe code, so no pair
      // dedup. The queries here ARE corpus members (a batch all-pairs-ish
      // audit), so their codes legitimately come from the stored table —
      // the single-client sourcing contract doesn't apply.
      (s, dir) => {
        val coded = codedVectors(s, dir)
        val probeList = probeMasksFor(nbitsOf(s, dir)).map(m => s"qcode ^ $m").mkString(", ")
        val probes = coded.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"), col("code").as("qcode"))
          .select(col("q_id"), col("qvec"), explode(expr(s"array($probeList)")).as("pcode"))
        val scored = coded
          .join(broadcast(probes), col("code") === col("pcode") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"), dotNative("embedding", "qvec").as("score"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id").asc)
        scored.withColumn("rank", row_number().over(w).cast("bigint"))
          .where(col("rank") <= 3)
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH codes AS ($codesSql),
              |q AS (SELECT vec_id AS q_id, embedding AS qvec, code AS qcode FROM codes WHERE vec_id < 10),
              |scored AS (
              |  SELECT p.q_id, a.vec_id AS n_id, ${dotSqlOf("a.embedding", "p.qvec")} AS score
              |  FROM codes a JOIN q p
              |    ON bit_count(xor(a.code, p.qcode)) <= $ProbeRadius AND a.vec_id <> p.q_id)
              |SELECT q_id, n_id, score, rank FROM (
              |  SELECT q_id, n_id, score,
              |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS BIGINT) AS rank
              |  FROM scored) t
              |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    Q("d12_embedding_cosine_neardup",
      // embedding-cosine near-duplicate detection: candidate pairs share an
      // SRP bucket code (equi self-join on the stored code — the shuffle
      // key at scale), exact cosine computed once per pair, thresholded
      (s, dir) => cosineNearDupFrom(codedVectors(s, dir)),
      Some(s"""WITH codes AS ($codesSql),
              |sized AS (SELECT *, count(*) OVER (PARTITION BY code) AS bn FROM codes),
              |ok AS (SELECT * FROM sized WHERE bn BETWEEN 2 AND $VecBucketCap),
              |pairs AS (
              |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              |    ${dotSqlOf("a.embedding", "b.embedding")} AS dot,
              |    a.norm AS na, b.norm AS nb
              |  FROM ok a JOIN ok b ON a.code = b.code AND a.vec_id < b.vec_id)
              |SELECT a_id, b_id, dot / (na * nb) AS cosine FROM pairs
              |WHERE dot / (na * nb) >= $NearDupCosine ORDER BY 1, 2""".stripMargin)),

    Q("e05_ivf_coarse_ann",
      // IVF-style ANN with a DATA-DERIVED coarse quantizer: centroids are
      // a deterministic hash-sample of the corpus (the vectors with the
      // smallest md5(vec_id) — the degenerate-but-reproducible stand-in
      // for trained k-means centroids), every vector is assigned to its
      // nearest centroid by exact cosine (one broadcast pass over K
      // centroids), and a query probes its NProbe nearest centroid buckets
      // and rescores only inside them. At scale: K ≈ √N centroids live in
      // a broadcast table, the assignment is map-side (no shuffle), the
      // bucket id is the partition/bucket key of the stored index, and a
      // probe is partition pruning — the complement of e02's
      // data-independent SRP quantizer. The centroid/assignment/probe
      // machinery is shared with e06 (AnnIndex.seedCentroids,
      // AnnIndex.assignToCentroids, [[probeAndRescore]] and the *Sql
      // builders).
      (s, dir) => {
        val coded = codedVectors(s, dir)
        val cents = seedCentroids(coded)
        probeAndRescore(s, dir, cents, withCentroid(coded, cents))
      },
      Some(s"""WITH codes AS ($codesSql),
              |cents AS ($seedCentsSqlBody),
              |assign AS (${assignSqlBody("cents")}),
              |${probeRescoreSqlTail("cents", "assign")}""".stripMargin)),

    Q("e06_ivf_lloyd_ann",
      // e05's quantizer TRAINED: one spherical-Lloyd iteration from the
      // hash seeds. Because assignment is by cosine — invariant to positive
      // scaling of the centroid — the updated centroid can be the
      // per-cluster per-dimension SUM instead of the mean: no division, so
      // the whole iteration stays in exact decimal arithmetic and is
      // bit-reproducible across engines and partitionings. The sums are
      // computed by exploding (cid, pos, component) into narrow rows and
      // tree-aggregating — one extra pass over the corpus per iteration,
      // with partial (map-side) aggregation; the K×Dim result is
      // broadcast-sized regardless of corpus size. Clusters that lose all
      // members simply vanish (both engines agree). The final probe is the
      // same bucket-pruned rescore as e05, against the trained centroids.
      (s, dir) => {
        val coded = codedVectors(s, dir)
        val cents1 = trainedCentroids(s, dir) // stored: train once per corpus digest
        probeAndRescore(s, dir, cents1, withCentroid(coded, cents1))
      },
      Some(s"""WITH codes AS ($codesSql),
              |cents0 AS ($seedCentsSqlBody),
              |${lloydSqlCtes("cents0", "a0", "sums0", "cents1")},
              |a1 AS (${assignSqlBody("cents1n")}),
              |${probeRescoreSqlTail("cents1n", "a1")}""".stripMargin)),

    Q("e06b_ivf_lloyd_convergence",
      // SECOND Lloyd iteration + the convergence signal a production
      // training loop stops on: per-cluster cosine movement between the
      // iteration-1 and iteration-2 centroids, 1 − cos(s1, s2) over the
      // exact DECIMAL(38,6) component sums. The dots are EXACT end-to-end
      // — decimal×decimal products and decimal sums, no double→decimal
      // rounding anywhere — because the engines' double→DECIMAL casts
      // round differently in shortest-repr tie cases (DuckDB rounds the
      // shortest decimal repr half-to-even; Spark quantizes the exact
      // binary value), which the float-centroid dot path hits here. Each
      // iteration is one corpus pass; the movement join is over the
      // K×Dim-row narrow sum tables. Training stays LIVE here on purpose
      // — this IS the training-loop diagnostic.
      (s, dir) => {
        val coded = codedVectors(s, dir)
        // iteration-1 state comes from STORAGE (AnnIndex.lloydSums1 —
        // the per-iteration state a checkpoint-resumed trainer persists;
        // bit-identical to a fresh pass), so the diagnostic pays exactly
        // ONE live corpus pass: iteration 2's assignment+sums. The
        // iteration-2 centroids come from the stored cents1 table (the
        // same centsFromSums(sums1) by construction).
        val sums1 = lloydSums1(s, dir)
        val sums2 = lloydSums(coded, trainedCentroids(s, dir))
        // duck-exact quantization at width 18: (18,6)×(18,6) products are
        // (37,12) — still lossless in a 38-digit decimal, which a (38,6)
        // input would not be (Spark would shrink the product scale).
        // The ORACLE side declares the same values at DECIMAL(24,6)
        // instead: DuckDB's multiply keeps precision at max(p1,p2)
        // (probed: (18,6)×(18,6) → DECIMAL(18,12)), so width 18 overflows
        // there once a product's unscaled value passes 10^18 — which
        // sf10's movement dots do (~1.6e18). (24,6)×(24,6) → (38,12):
        // identical exact values on both engines at every tested scale.
        val q6 = (c: org.apache.spark.sql.Column) =>
          graft.functions.DuckDecimalCast.duckDecimal6(c, precision = 18)
        val j = sums1.select(col("cid"), col("pos"), q6(col("sv")).as("d1"))
          .join(sums2.select(col("cid"), col("pos"), q6(col("sv")).as("d2")), Seq("cid", "pos"))
        j.groupBy(col("cid"))
          .agg(
            sum(col("d1") * col("d2")).as("dot12"),
            sum(col("d1") * col("d1")).as("dot11"),
            sum(col("d2") * col("d2")).as("dot22"))
          .select(col("cid"),
            // duckDouble, not .cast("double"): these dots carry unscaled
            // values ≈ 2e17 > 2^53, exactly where the engines' decimal→
            // double conversions drift one ulp apart (sf1 caught three
            // clusters' movements off by 1 ulp of the cosine)
            (lit(1d) - graft.functions.DuckDecimalCast.duckDouble(col("dot12")) /
              (sqrt(graft.functions.DuckDecimalCast.duckDouble(col("dot11"))) *
                sqrt(graft.functions.DuckDecimalCast.duckDouble(col("dot22"))))).as("movement"))
          .orderBy("cid")
      },
      Some(s"""WITH codes AS ($codesSql),
              |cents0 AS ($seedCentsSqlBody),
              |${lloydSqlCtes("cents0", "a0", "sums0", "cents1")},
              |${lloydSqlCtes("cents1n", "a1", "sums1", "cents2")},
              |j AS (SELECT s1.cid, CAST(s1.sv AS DECIMAL(24,6)) AS d1, CAST(s2.sv AS DECIMAL(24,6)) AS d2
              |      FROM sums0 s1 JOIN sums1 s2 ON s1.cid = s2.cid AND s1.pos = s2.pos),
              |m AS (SELECT cid, SUM(d1*d2) AS dot12, SUM(d1*d1) AS dot11, SUM(d2*d2) AS dot22
              |      FROM j GROUP BY cid)
              |SELECT cid, 1 - CAST(dot12 AS DOUBLE) /
              |  (sqrt(CAST(dot11 AS DOUBLE)) * sqrt(CAST(dot22 AS DOUBLE))) AS movement
              |FROM m ORDER BY 1""".stripMargin)),

    Q("e08_pq_adc_ann",
      // PRODUCT QUANTIZATION + asymmetric distance computation — the
      // compressed-index ANN family (vs e02's hashing and e05/e06's
      // coarse partitioning), now a PURE PROBE against the stored PQ
      // artifacts (AnnIndex.pqCodebooks / AnnIndex.pqCodes — the last
      // ANN family to get the train()/add() split): the codebooks and
      // the M-small-int per-vector code table are built once per corpus
      // digest; the query builds an M×KSub lookup table of exact
      // sub-dot-products against the stored codebooks, every stored
      // code row's APPROXIMATE dot is the sum of M broadcast-join
      // lookups (map-side over the code table — no window, no encode,
      // no corpus pass; pinned in PlanQualitySpec), and only the top
      // ReRank approximates are exact-rescored via a narrow id join.
      // Fixed-order lut0+..+lut3 addition keeps the approx score
      // IEEE-identical in both engines; the oracle retrains + re-encodes
      // from raw embeddings every run, so it gates the stored encode's
      // bit-stability too.
      (s, dir) => {
        val q = queryVec(s, dir)
        adcApprox(pqCodes(s, dir), queryLut(s, dir))
          .where(col("vec_id") =!= 0)
          .orderBy(col("approx").desc, col("vec_id").asc)
          .limit(ReRank)
          .join(emb(s, dir).select(col("vec_id"), col("embedding")), "vec_id")
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some {
        s"""WITH $pqEncodeSqlCtes,
           |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
           |$adcSqlCtes,
           |top AS (SELECT vec_id FROM appr WHERE vec_id <> 0
           |  ORDER BY approx DESC, vec_id LIMIT $ReRank)
           |SELECT t.vec_id, ${dotSqlOf("v.embedding", "q.qvec")} AS score
           |FROM top t JOIN embeddings v ON v.vec_id = t.vec_id CROSS JOIN q
           |ORDER BY score DESC, t.vec_id LIMIT 5""".stripMargin
      }),

    Q("e14_ivfpq_ann",
      // IVF + PQ COMBINED — the FAISS IVFPQ shape, composed entirely
      // from stored artifacts: the probe directory-prunes the combined
      // index (PQ codes partitioned by SRP bucket,
      // AnnIndex.ivfPqIndex) to the query's Hamming ball, ADC-scores
      // ONLY the probed buckets' code rows (M broadcast LUT joins over
      // 4 small ints per row — candidate selection is partition
      // pruning, no join, and the pruned scan never touches a float
      // vector), and exact-rescores the top ReRank by id. vs e08:
      // same compressed scoring, but the scan fraction drops from the
      // whole code table to the probe ball; vs e09: same pruning, but
      // what's scanned is 16× narrower. The 100 TB ANN endgame shape.
      (s, dir) => {
        val nb = nbitsOf(s, dir)
        val qcode = queryCode(s, dir, nb) // ONE driver-side head(), hoisted out of the mask map
        val probes = probeMasksFor(nb).map(_ ^ qcode)
        val cand = ivfPqIndex(s, dir)
          .where(col("code").isin(probes: _*))
          .where(col("vec_id") =!= 0)
        val q = queryVec(s, dir)
        adcApprox(cand.select(col("vec_id") +: (0 until MSub).map(m => col(s"k$m")): _*),
            queryLut(s, dir))
          .orderBy(col("approx").desc, col("vec_id").asc)
          .limit(ReRank)
          .join(emb(s, dir).select(col("vec_id"), col("embedding")), "vec_id")
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some {
        s"""WITH codes AS ($codesSql),
           |$pqEncodeSqlCtes,
           |q AS (SELECT code AS qcode, embedding AS qvec FROM codes WHERE vec_id = 0),
           |cand AS (SELECT c.vec_id FROM codes c CROSS JOIN q
           |  WHERE c.vec_id <> 0 AND bit_count(xor(c.code, q.qcode)) <= $ProbeRadius),
           |$adcSqlCtes,
           |top AS (SELECT a.vec_id FROM appr a JOIN cand USING (vec_id)
           |  ORDER BY approx DESC, vec_id LIMIT $ReRank)
           |SELECT t.vec_id, ${dotSqlOf("v.embedding", "q.qvec")} AS score
           |FROM top t JOIN embeddings v ON v.vec_id = t.vec_id CROSS JOIN q
           |ORDER BY score DESC, t.vec_id LIMIT 5""".stripMargin
      }),

    Q("e16_residual_pq_ann",
      // IVFPQ WITH RESIDUAL ENCODING — the missing half of the real
      // FAISS composition (e14 PQ-encodes raw vectors; production IVFPQ
      // encodes each vector's residual against its assigned coarse
      // centroid, concentrating the quantizer's resolution inside the
      // bucket): dot(q,x) = dot(q, cent(x)) + dot(q, residual(x)). The
      // first term is one constant per probed bucket; the second is
      // e08's ADC LUT over the RESIDUAL-trained codebooks. The probe:
      // client-side coarse probe (NProbe cids + their term0 dots — a
      // bounded 2-row collect, the e09 qcode precedent), directory-
      // pruned scan of the stored cid-partitioned residual code table
      // (M small ints per row), per-row approx = term0 + M broadcast
      // LUT lookups in fixed order (IEEE-identical across engines),
      // exact re-rank of the top ReRank. Composes THREE stored
      // artifacts: trained centroids, residual codebooks, residual
      // codes. The oracle retrains + re-encodes everything from raw
      // embeddings, so it gates the whole residual pipeline's
      // bit-stability (float residual subtraction included).
      (s, dir) => {
        val q = queryVec(s, dir)
        val probed = trainedCentroids(s, dir).crossJoin(broadcast(q))
          .select(col("cid"), dotNative("cvec", "qvec").as("term0"),
            (dotNative("cvec", "qvec") / col("cnorm")).as("qcos"))
          .orderBy(col("qcos").desc, col("cid").asc)
          .limit(NProbe)
          .select("cid", "term0")
          .collect() // bounded: NProbe rows — the client-side coarse probe
        val cand = rpqCodes(s, dir)
          .where(col("cid").isin(probed.map(_.getLong(0)): _*)) // literal → directory pruning
          .where(col("vec_id") =!= 0)
        val term0 = probed.foldLeft(lit(0d)) { case (acc, r) =>
          when(col("cid") === r.getLong(0), lit(r.getDouble(1))).otherwise(acc)
        }
        val scored = lutJoined(cand, rpqQueryLut(s, dir)).select(col("vec_id"),
          (0 until MSub).map(m => col(s"l$m")).foldLeft(term0)(_ + _).as("approx"))
        scored
          .orderBy(col("approx").desc, col("vec_id").asc)
          .limit(ReRank)
          .join(emb(s, dir).select(col("vec_id"), col("embedding")), "vec_id")
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some(residualPqOracleSql)),

    Q("e17_rpq_recall_metric",
      // e15's quantization-loss audit applied to the RESIDUAL family:
      // recall@5 of the residual-ADC ranking over ALL buckets (term0
      // joined per row's assigned cid — deliberately no coarse pruning
      // and no re-rank, so the metric isolates what residual encoding
      // buys/loses vs e15's raw-vector PQ at identical M/KSub). The
      // e15-vs-e17 delta is the number a deployment reads before
      // switching its code table to residuals. On THIS synthetic
      // random-unit corpus both audits sit at the recall floor
      // (documented maximal-loss geometry); the clustered-geometry
      // trio e18/e19/e20 ([[MogQueries]], r14) runs the same
      // comparison on a derived corpus with real cluster structure,
      // where the residual family's win is spec-pinned
      // (ClusteredRecallSpec).
      (s, dir) => {
        val q = queryVec(s, dir)
        val term0s = trainedCentroids(s, dir).crossJoin(broadcast(q))
          .select(col("cid"), dotNative("cvec", "qvec").as("term0"))
        val approxTop = lutJoined(rpqCodes(s, dir).where(col("vec_id") =!= 0), rpqQueryLut(s, dir))
          .join(broadcast(term0s), "cid")
          .select(col("vec_id"),
            (0 until MSub).map(m => col(s"l$m")).foldLeft(col("term0"))(_ + _).as("approx"))
          .orderBy(col("approx").desc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"))
        val truth = emb(s, dir).where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
        truth.join(approxTop, "vec_id")
          .agg((count(lit(1)).cast("double") / 5d).as("recall_at_5"))
      },
      Some(residualRecallOracleSql)),

    Q("e15_pq_recall_metric",
      // e07's index-quality monitoring applied to the COMPRESSED family:
      // recall@5 of the stored-PQ ADC ranking (e08's approximate stage,
      // deliberately WITHOUT the exact re-rank — the re-rank would mask
      // quantization loss) against brute-force truth, the metric that
      // tells a deployment when MSub/KSub need retraining. The audit
      // pays brute force once (its price); the ADC side reads the
      // stored code table map-side.
      (s, dir) => {
        val q = queryVec(s, dir)
        val approxTop = adcApprox(pqCodes(s, dir), queryLut(s, dir))
          .where(col("vec_id") =!= 0)
          .orderBy(col("approx").desc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"))
        val truth = emb(s, dir).where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
        truth.join(approxTop, "vec_id")
          .agg((count(lit(1)).cast("double") / 5d).as("recall_at_5"))
      },
      Some(s"""WITH $pqEncodeSqlCtes,
              |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
              |$adcSqlCtes,
              |atop AS (SELECT vec_id FROM appr WHERE vec_id <> 0
              |  ORDER BY approx DESC, vec_id LIMIT 5),
              |truth AS (SELECT a.vec_id FROM embeddings a CROSS JOIN q WHERE a.vec_id <> 0
              |  ORDER BY ${dotSqlOf("a.embedding", "q.qvec")} DESC, a.vec_id LIMIT 5)
              |SELECT (SELECT CAST(count(*) AS DOUBLE) / 5 FROM truth JOIN atop USING (vec_id))
              |  AS recall_at_5""".stripMargin)),

    Q("e04_vector_norms",
      // the NATIVE decimal dot, not the declarative aggregate/transform
      // CAST form: Spark's Cast quantizes the exact binary expansion
      // (HALF_UP) where the oracle scales in double first — the two
      // disagree at exact `.5` ties (first hit live by sf1 vectors)
      (s, dir) => emb(s, dir)
        .select(col("vec_id"), sqrt(dotNative("embedding", "embedding")).as("l2_norm"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, sqrt(CAST(list_sum(list_transform(embedding,
             |  x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)) AS l2_norm
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    Q("e12_jl_projection_knn",
      // Johnson–Lindenstrauss sketching ahead of ANN: every embedding is
      // projected onto JlDim=16 md5-derived ±1 hyperplanes (the
      // database-friendly JL transform — Achlioptas 2003) STORED as a
      // float32 artifact table (AnnIndex.jlSketch — the projection is
      // index-build cost, paid once per corpus digest), candidates are
      // ranked by SKETCH-space
      // dot product, and the winners are re-ranked exactly in the
      // original space via a narrow id join — e11's re-rank join with a
      // dimensionality-reduced (not scalar-quantized) first pass.
      // Query-time cost: one 16-float dot per stored-sketch row (a 4×
      // narrower scan than the corpus) + one broadcast 1-row join +
      // top-k + the exact re-rank: a 10-row broadcast id join against a
      // (vec_id, embedding)-pruned corpus scan — only the winners' exact
      // dots are computed (a deployment with a row-lookup index skips
      // even that scan). No corpus shuffle anywhere.
      (s, dir) => {
        val e = emb(s, dir)
        val proj = jlSketch(s, dir)
        val q = proj.where(col("vec_id") === 0).select(col("pvec").as("qp"))
        val top = proj.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNativeC(col("pvec"), col("qp")).as("pscore"))
          .orderBy(col("pscore").desc, col("vec_id").asc)
          .limit(10)
        top.join(e, Seq("vec_id"))
          .crossJoin(broadcast(queryVec(s, dir)))
          .select(col("vec_id"), col("pscore"),
            dotNative("embedding", "qvec").as("exact_score"))
          .orderBy(col("pscore").desc, col("vec_id").asc)
      },
      Some {
        s"""WITH pr AS (SELECT vec_id,
           |    [${(0 until JlDim).map(jlCoordSql).mkString(",\n     ")}] AS pvec
           |  FROM embeddings),
           |q AS (SELECT pvec AS qp FROM pr WHERE vec_id = 0),
           |top AS (
           |  SELECT pr.vec_id,
           |    CAST(list_sum(list_transform(list_zip(pr.pvec, q.qp),
           |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE) AS pscore
           |  FROM pr, q WHERE pr.vec_id <> 0
           |  ORDER BY pscore DESC, pr.vec_id LIMIT 10)
           |SELECT t.vec_id, t.pscore, ${dotSqlOf("e.embedding", "qe.qvec")} AS exact_score
           |FROM top t JOIN embeddings e ON t.vec_id = e.vec_id,
           |     (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) qe
           |ORDER BY t.pscore DESC, t.vec_id""".stripMargin
      }),

    Q("e13_incremental_ann_rollforward",
      // The vector-side lifecycle closure (d37's pattern on the ANN
      // index): a grown corpus rolls the stored coded-vector index
      // forward WITHOUT re-coding the old vectors and WITHOUT retraining
      // the quantizer — the FAISS add()-vs-train() split. The quantizer
      // width is FROZEN at the old corpus's derived setting (baked into
      // both artifact names, exactly as the live index keys by nbits):
      // production retrains/re-sizes on a schedule, not per ingest, so a
      // probe between retrains runs against old-setting codes — which is
      // what the oracle prices by deriving b from the OLD subset count.
      // The roll build codes ONLY the delta vectors (the merge is a
      // narrow coded-row copy; file-level append in production), and the
      // probe is e09's shape over the rolled index: client-side code
      // lookup, Hamming-ball IN filter, broadcast exact re-rank.
      (s, dir) => {
        val e = emb(s, dir)
        val nbOld = annNbOld(s, dir)
        val merged = annRolledIndex(s, dir, nbOld)
        // vec 0 lands in the DELTA (0 % 10 == 0): the probe exercises a
        // freshly rolled-in vector against old- and new-corpus members.
        // The query's code is the CLIENT's own quantization (the
        // sourcing contract) — one pushdown row off the compact source
        // file, NOT a lookup against the rolled artifact: filtering the
        // 2^nb-directory index by vec_id opens every code directory
        // (measured at sf10: the unpruned lookup alone held the probe
        // at ~15 s)
        val qcode = queryCode(s, dir, nbOld) // ONE driver-side head(), hoisted out of the mask map
        val probes = probeMasksFor(nbOld).map(_ ^ qcode)
        val q = queryVec(s, dir)
        merged.where(col("code").isin(probes: _*))
          .where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dotNative("embedding", "qvec").as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(5)
      },
      Some(s"""WITH nbt AS (
              |  SELECT COALESCE(MIN(b), $NBitsMax) AS nb
              |  FROM (SELECT unnest(range($NBitsFloor, ${NBitsMax + 1})) AS b) bs,
              |       (SELECT count(*) AS n FROM embeddings WHERE vec_id % 10 <> 0) c
              |  WHERE c.n <= $TargetOccupancy * (CAST(1 AS BIGINT) << b)),
              |codes AS (
              |  SELECT vec_id, embedding,
              |    (($codeFullSql) & ((CAST(1 AS BIGINT) << nbt.nb) - 1)) AS code
              |  FROM embeddings, nbt),
              |q AS (SELECT code AS qcode, embedding AS qvec FROM codes WHERE vec_id = 0)
              |SELECT a.vec_id, ${dotSqlOf("a.embedding", "q.qvec")} AS score
              |FROM codes a CROSS JOIN q
              |WHERE a.vec_id <> 0 AND bit_count(xor(a.code, q.qcode)) <= $ProbeRadius
              |ORDER BY score DESC, a.vec_id LIMIT 5""".stripMargin)),

    semDedupQ
  )

  // ------------------------------------------------------------ SemDeDup
  /** Semantic-duplicate cluster count (e10): SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540) — k-means-style clusters over the embedding space,
    * pairwise cosine INSIDE each cluster only, and the keep policy that
    * retains the member FARTHEST from the cluster centroid (lowest
    * centroid-cosine; deterministic id tie-break). A member is removed
    * when any same-cluster neighbor with cosine ≥ [[SemTau]] wins the
    * keep comparison. Output: per-cluster member/removed counts.
    *
    * Scale shape: the quantizer is the shared hash-seeded centroid table
    * (AnnIndex.seedCentroids at [[SemK]]; a production run trains it with
    * the e06 Lloyd iterations and sizes K with the corpus so clusters stay
    * bounded) — assignment is one broadcast map-side pass, the pair join
    * shuffles once on `cid`, and the d12-style [2, cap] cluster-size gate
    * plus an observed hot-cluster metric keep a degenerate quantizer from
    * ever going quadratic. The keep-policy predicate is applied BEFORE
    * the exact dot, so each unordered pair is scored once. Reference
    * analog: DedupCheck-style duplicate resolution
    * (/root/reference/core/src/main/scala/org/thp/scalligraph/services/IntegrityCheck.scala)
    * lifted to embedding space. */
  // final-val literals: constant-folded at compile time, so the eager
  // `all` registry above can interpolate them during object init
  private final val SemK = 16
  private final val SemTau = 0.30
  private def semDedupQ: Q =
    Q("e10_semdedup",
      (s, dir) => {
        val coded = codedVectors(s, dir)
        val cents = seedCentroids(coded, SemK)
        // assignment with the true centroid cosine (the keep score): same
        // argmax as AnnIndex.cosAssignCol (norm > 0 is constant per
        // vec_id) but with ccos normalized by the vector's own norm too,
        // which makes it comparable ACROSS vectors — the keep policy
        // needs that. r15: map-side argmin over (−ccos, cid) structs
        // against the collected ≤SemK-row centroids (no K×N crossJoin,
        // no per-vec_id window, no assignment re-join — the double
        // negation recovering ccos is an exact sign flip)
        val best = array_min(array(collectCentroidRows(cents).map {
          case (cid, cvec, cnorm) => struct(
            (-(dotNativeC(col("embedding"), array(cvec.map(lit): _*)) /
              (col("norm") * lit(cnorm)))).as("negccos"),
            lit(cid).as("cid"))
        }: _*))
        // materialized once (the stored cluster-assignment table of a
        // production run): the N×K assignment dots would otherwise be
        // re-planned into each of the three consumers below
        val members = coded.select(col("vec_id"), col("embedding"), col("norm"),
            best.getField("cid").as("cid"), (-best.getField("negccos")).as("ccos"))
          .localCheckpoint()
        // cluster sizes are a K-row table — the cap gate is a broadcast
        // semi-join on it, not a per-row count window over the corpus
        val csize = members.groupBy(col("cid")).agg(count(lit(1)).as("members"))
          .observe("e10_cluster_cap",
            sum(when(col("members") > VecBucketCap, col("members")).otherwise(0L))
              .as("rows_in_capped_clusters"),
            max(col("members")).as("max_cluster_size"))
          .localCheckpoint()
        val inCap = csize.where(col("members").between(2L, VecBucketCap)).select(col("cid"))
        val sized = members.join(broadcast(inCap), "cid")
        val a = sized.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
          col("norm").as("na"), col("cid"), col("ccos").as("ca"))
        val b = sized.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
          col("norm").as("nb"), col("cid").as("cid_b"), col("ccos").as("cb"))
        val removedPerCluster = a.join(b, col("cid") === col("cid_b") && col("a_id") =!= col("b_id") &&
            (col("cb") < col("ca") || (col("cb") === col("ca") && col("b_id") < col("a_id"))))
          .where(dotNative("ea", "eb") / (col("na") * col("nb")) >= SemTau)
          .groupBy(col("cid"))
          .agg(count_distinct(col("a_id")).as("removed"))
        csize.join(removedPerCluster, Seq("cid"), "left")
          .select(col("cid"), col("members"), coalesce(col("removed"), lit(0L)).as("removed"))
          .orderBy("cid")
      },
      Some(s"""WITH codes AS ($codesSql),
              |cents AS (SELECT vec_id AS cid, embedding AS cvec, norm AS cnorm FROM codes
              |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $SemK),
              |assign AS (SELECT vec_id, cid, ccos FROM (
              |  SELECT v.vec_id, c.cid,
              |    ${dotSqlOf("v.embedding", "c.cvec")} / (v.norm * c.cnorm) AS ccos,
              |    row_number() OVER (PARTITION BY v.vec_id
              |      ORDER BY ${dotSqlOf("v.embedding", "c.cvec")} / (v.norm * c.cnorm) DESC, c.cid) AS rn
              |  FROM codes v CROSS JOIN cents c) t WHERE rn = 1),
              |members AS (SELECT v.vec_id, v.embedding, v.norm, a.cid, a.ccos
              |  FROM codes v JOIN assign a USING (vec_id)),
              |sized AS (SELECT *, count(*) OVER (PARTITION BY cid) AS cn FROM members),
              |ok AS (SELECT * FROM sized WHERE cn BETWEEN 2 AND $VecBucketCap),
              |removed AS (SELECT DISTINCT a.vec_id FROM ok a JOIN ok b
              |  ON a.cid = b.cid AND a.vec_id <> b.vec_id
              |    AND ((b.ccos < a.ccos) OR (b.ccos = a.ccos AND b.vec_id < a.vec_id))
              |  WHERE ${dotSqlOf("a.embedding", "b.embedding")} / (a.norm * b.norm) >= $SemTau)
              |SELECT m.cid, CAST(count(*) AS BIGINT) AS members,
              |  CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed
              |FROM members m LEFT JOIN removed r ON m.vec_id = r.vec_id
              |GROUP BY m.cid ORDER BY m.cid""".stripMargin))
}
