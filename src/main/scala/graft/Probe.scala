package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing probe for scale experiments.
  *
  * Usage: runMain graft.Probe <sfDir> <query>[,<query>...] [k=v ...]
  *
  * Runs each named [[SparkEntry.queries]] entry under `count()` (the
  * bench's materialization) in a fresh session with optional extra SQL
  * confs, printing one `[probe] <name> <seconds>` line per query. Used
  * to isolate a query's cost from bench neighborhood effects (heap
  * state, retained caches) and to A/B config hypotheses — e.g. the
  * fixed-partition spill knee documented in SCALE_sf10.md:
  *
  *   runMain graft.Probe testdata/sf10 q36_dedup_keep_first \
  *     spark.sql.adaptive.coalescePartitions.initialPartitionNum=256
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Probe <sfDir> <q1,q2,...> [k=v ...]")
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val confs = args.drop(2).toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as the bench so first-query numbers are comparable
    spark.range(1000).selectExpr("sum(id)").count()
    graft.sources.TestData.graph(spark, sfDir).V("region").df.count()
    // batch-resolve live stored artifacts (resolve-only, parallel) so
    // rep-1 timings measure the query, not serialized pointer/footer I/O
    graft.services.Warm.resolve(spark, sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
