package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator reproducing the driver's
  * TESTDATA.md tables (TPC-H-ish star schema + `events` stream +
  * `documents`/`embeddings` LLM-pipeline tables) at an arbitrary scale
  * factor, so correctness and bench runs can step up beyond the shipped
  * sf0.1 (round-8 mandate: evidence above sf0.1).
  *
  * Faithfulness: every column's distribution was measured from the shipped
  * sf0.1 parquet (row counts per sf, value ranges, category frequencies,
  * planted near-duplicate families in `documents`, random-unit-vector
  * `embeddings`, exponential `events.value`, independent random
  * `l_orderkey` — which reproduces the ~24% duplicate (l_orderkey,
  * l_linenumber) pairs the dedup demos rely on). Exact bit-equality with
  * the driver generator is NOT required: the DuckDB oracle compares Spark
  * vs DuckDB over the SAME files, so any faithful data exercises the same
  * code paths.
  *
  * Scale design: generation is pure `spark.range` + codegen'd column
  * expressions — no driver-side data, no shuffles except the `documents`
  * clone join (a self-join on a 5% sample). Randomness is hash-based
  * (xxhash64 of row id + salt), so output is deterministic regardless of
  * partitioning and the same recipe would produce identical data on a
  * 1000-executor cluster writing 100 TB.
  *
  * Usage: DataGen <sf> <outDir> [partitions]
  */
object DataGen {

  /** Deterministic uniform double in [0,1): top 53 bits of xxhash64. */
  private def u(salt: String, cols: Column*): Column =
    shiftrightunsigned(xxhash64((lit(salt) +: cols): _*), 11).cast("double") / lit((1L << 53).toDouble)

  /** Deterministic uniform long in [0, n). */
  private def uniMod(salt: String, n: Long, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(n))

  /** Deterministic pick from a fixed list of strings. */
  private def pick(salt: String, choices: Seq[String], cols: Column*): Column =
    element_at(array(choices.map(lit): _*), (uniMod(salt, choices.size, cols: _*) + 1).cast("int"))

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val partAdjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val partNouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val partTypes = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val langs = Seq("en", "de", "es", "fr", "zh") // en ~41%, rest ~15% each
  // 30-word doc vocabulary measured from sf0.1 (the 31st, "dup", is the
  // clone marker appended below, never drawn here)
  private val vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "fast", "filter",
    "group", "hash", "join", "key", "line", "merge", "order", "part", "query",
    "row", "scan", "slow", "small", "sort", "spark", "stream", "table", "the",
    "value", "vector", "window")

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame =
    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))

  def customer(spark: SparkSession, sf: Double): DataFrame =
    spark.range((150000 * sf).toLong).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      uniMod("c_nat", 25, col("id")).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u("c_bal", col("id")) * 11000.0, 2).as("c_acctbal"),
      pick("c_seg", segments, col("id")).as("c_mktsegment"))

  def supplier(spark: SparkSession, sf: Double): DataFrame =
    spark.range((10000 * sf).toLong).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      uniMod("s_nat", 25, col("id")).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u("s_bal", col("id")) * 11000.0, 2).as("s_acctbal"))

  def part(spark: SparkSession, sf: Double): DataFrame =
    spark.range((200000 * sf).toLong).select(
      col("id").as("p_partkey"),
      concat(pick("p_adj", partAdjs, col("id")), lit(" "),
        pick("p_noun", partNouns, col("id"))).as("p_name"),
      concat(lit("Brand#"), uniMod("p_brand", 25, col("id")) + 1).as("p_brand"),
      pick("p_type", partTypes, col("id")).as("p_type"),
      (uniMod("p_size", 50, col("id")) + 1).cast("int").as("p_size"),
      (lit(900.0) + uniMod("p_price", 1000, col("id")).cast("double") / 10.0).as("p_retailprice"))

  def orders(spark: SparkSession, sf: Double): DataFrame = {
    val nCust = (150000 * sf).toLong
    spark.range((1500000 * sf).toLong).select(
      col("id").as("o_orderkey"),
      uniMod("o_cust", nCust, col("id")).as("o_custkey"),
      pick("o_status", Seq("F", "O", "P"), col("id")).as("o_orderstatus"),
      round(lit(1000.0) + u("o_total", col("id")) * 499000.0, 2).as("o_totalprice"),
      // day-granular, uniform over 1995-01-01 .. 2001-08-01 (2405 days)
      date_add(lit("1995-01-01").cast("date"), uniMod("o_date", 2405, col("id")).cast("int"))
        .cast("timestamp").as("o_orderdate"),
      pick("o_prio", priorities, col("id")).as("o_orderpriority"))
  }

  def lineitem(spark: SparkSession, sf: Double): DataFrame = {
    val nOrders = (1500000 * sf).toLong
    val nPart = (200000 * sf).toLong
    val nSupp = (10000 * sf).toLong
    // l_orderkey is drawn independently per row (measured: 147,236
    // distinct of 150k at sf0.1 = the uniform-draw expectation, and the
    // resulting (l_orderkey, l_linenumber) collisions ARE the planted
    // dedup duplicates TestData documents)
    spark.range((6000000 * sf).toLong).select(
      uniMod("l_ord", nOrders, col("id")).as("l_orderkey"),
      uniMod("l_part", nPart, col("id")).as("l_partkey"),
      uniMod("l_supp", nSupp, col("id")).as("l_suppkey"),
      (uniMod("l_line", 7, col("id")) + 1).cast("int").as("l_linenumber"),
      (uniMod("l_qty", 50, col("id")) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u("l_ext", col("id")) * 104100.0, 2).as("l_extendedprice"),
      (uniMod("l_disc", 11, col("id")).cast("double") / 100.0).as("l_discount"),
      (uniMod("l_tax", 9, col("id")).cast("double") / 100.0).as("l_tax"),
      pick("l_rf", Seq("A", "N", "R"), col("id")).as("l_returnflag"),
      pick("l_ls", Seq("F", "O"), col("id")).as("l_linestatus"),
      date_add(lit("1995-01-02").cast("date"), uniMod("l_ship", 2499, col("id")).cast("int"))
        .cast("timestamp").as("l_shipdate"))
  }

  def events(spark: SparkSession, sf: Double): DataFrame = {
    val nUsers = (15000 * sf).toLong
    val t0 = java.time.LocalDate.of(2024, 1, 1).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000L // micros
    val spanMicros = 30L * 86400L * 1000000L
    spark.range((1000000 * sf).toLong).select(
      col("id").as("event_id"),
      timestamp_micros(lit(t0) + (u("e_ts", col("id")) * spanMicros.toDouble).cast("long")).as("ts"),
      uniMod("e_user", nUsers, col("id")).as("user_id"),
      pick("e_type", eventTypes, col("id")).as("event_type"),
      // exponential, mean 50 (measured: avg 49.9, std 49.6, max ~560)
      round(lit(-50.0) * log(lit(1.0) - u("e_val", col("id"))), 2).as("value"),
      format_string("{\"k\": %d}", uniMod("e_k", 100, col("id"))).as("props"))
  }

  def documents(spark: SparkSession, sf: Double): DataFrame = {
    val n = (50000 * sf).toLong
    // lang: en ~40%, others ~15% each (measured 2059/753/744/742/702
    // at sf0.1)
    val langR = uniMod("doc_lang", 20, col("doc_id"))
    val langPick = when(langR < 8, "en").when(langR < 11, "de")
      .when(langR < 14, "es").when(langR < 17, "fr").otherwise("zh")
    val base = spark.range(n).select(col("id").as("doc_id")).select(
      col("doc_id"),
      // 10..100 words drawn uniformly from the 30-word vocabulary
      concat_ws(" ", transform(
        sequence(lit(1), (uniMod("doc_len", 91, col("doc_id")) + 10).cast("int")),
        i => element_at(array(vocab.map(lit): _*),
          (uniMod("doc_w", vocab.size, col("doc_id"), i) + 1).cast("int")))).as("text"),
      langPick.as("lang"),
      concat(lit("src"), uniMod("doc_src", 20, col("doc_id"))).as("source"))
    // Plant near-duplicate families (measured at sf0.1: ~250 of 5000 docs
    // are clones of an earlier doc with 0/1/2 " dup" tokens appended —
    // 0 extra tokens = an exact duplicate, ~8 pairs at sf0.1). A clone
    // keeps its own doc_id/lang/source but takes the parent's text.
    val isClone = uniMod("doc_clone", 100, col("doc_id")) < 5 && col("doc_id") >= 20
    val nDup = when(uniMod("doc_ndup", 100, col("doc_id")) < 4, 0)
      .when(uniMod("doc_ndup", 100, col("doc_id")) < 52, 1).otherwise(2)
    val clones = base.where(isClone).select(
      col("doc_id"), col("lang"), col("source"),
      // parent drawn uniformly from ids strictly below the clone (so the
      // "keep first" dedup semantics see the parent first)
      pmod(xxhash64(lit("doc_parent"), col("doc_id")), col("doc_id")).as("_parent"),
      nDup.as("_ndup"))
    val parents = base.select(col("doc_id").as("_parent"), col("text").as("_ptext"))
    val cloned = clones.join(parents, "_parent").select(
      col("doc_id"),
      concat(col("_ptext"), concat_ws("", transform(
        sequence(lit(1), col("_ndup").cast("int")), _ => lit(" dup")))).as("text"),
      col("lang"), col("source"))
    val kept = base.where(!isClone).select("doc_id", "text", "lang", "source")
    kept.unionByName(cloned)
      .withColumn("n_chars", length(col("text")).cast("bigint"))
  }

  def embeddings(spark: SparkSession, sf: Double): DataFrame = {
    val dim = 64
    // i.i.d. standard normals (Box-Muller over two hash-uniforms), then
    // L2-normalized → uniform on the unit sphere (measured: norms == 1.0,
    // label-conditional centroids at the random-draw expectation)
    val gauss = transform(sequence(lit(0), lit(dim - 1)), i =>
      sqrt(lit(-2.0) * log(lit(1.0) - u("emb_u1", col("id"), i))) *
        cos(lit(2.0 * math.Pi) * u("emb_u2", col("id"), i)))
    spark.range((20000 * sf).toLong)
      .select(col("id"), gauss.as("g"))
      .select(
        col("id").as("vec_id"),
        transform(col("g"), x => (x / sqrt(aggregate(col("g"), lit(0.0), (a, v) => a + v * v)))
          .cast("float")).as("embedding"),
        uniMod("emb_label", 10, col("id")).cast("int").as("label"))
  }

  def all(spark: SparkSession, sf: Double): Seq[(String, DataFrame)] = Seq(
    "region" -> region(spark),
    "nation" -> nation(spark),
    "customer" -> customer(spark, sf),
    "supplier" -> supplier(spark, sf),
    "part" -> part(spark, sf),
    "orders" -> orders(spark, sf),
    "lineitem" -> lineitem(spark, sf),
    "events" -> events(spark, sf),
    "documents" -> documents(spark, sf),
    "embeddings" -> embeddings(spark, sf))

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(1.0)
    val outDir = args.lift(1).getOrElse(s"testdata/sf$sf")
    val parts = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    all(spark, sf).foreach { case (name, df) =>
      val n = df.count()
      // small dims in one file; facts in `parts` files so local scans
      // parallelize the way a real multi-file table would
      val p = if (n < 100000) 1 else parts
      df.repartition(p, col(df.columns.head))
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"$name: $n rows -> $outDir/$name.parquet")
    }
    spark.stop()
  }
}
