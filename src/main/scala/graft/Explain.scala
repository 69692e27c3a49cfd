package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the formatted physical plan of selected
  * registry queries (all of them with no names given). Usage:
  * `runMain graft.Explain <sfDir> [queryName ...] [k=v ...]` — `k=v`
  * args (containing '=') become extra SQL confs, same as [[Probe]], for
  * A/B-ing optimizer flags against the plan shape. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val (confArgs, nameArgs) = args.drop(1).partition(_.contains("="))
    val names = nameArgs.toSet
    val confs = confArgs.toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val builder = SparkSession.builder()
      // GraftExtensions injects the optimizer rules into the MAIN
      // operator-optimization batch (the post-hoc extraOptimizations
      // fallback runs too late for nested pruning to cascade to scans)
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = confs.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n=== $name ===")
        try {
          val qe = fn(spark, sfDir).queryExecution
          // GRAFT_EXPLAIN_LOGICAL=1 → also dump the optimized logical plan
          // (rule development: see the tree optimizer rules actually match)
          if (sys.env.get("GRAFT_EXPLAIN_LOGICAL").contains("1"))
            println(qe.optimizedPlan.treeString)
          println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
      }
    spark.stop()
  }
}
