package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch phase accounting for the s-family (guide §1 "measure
  * first", VERDICT r15 "attack the s-family floor with task-metrics, not
  * knobs"): registers a StreamingQueryListener, runs each named s-query
  * once, and prints every batch's `durationMs` breakdown (addBatch /
  * walCommit / commitOffsets / queryPlanning / getBatch / latestOffset /
  * triggerExecution) plus the query's wall time, so the fixed per-batch
  * cost is attributed to a phase instead of guessed at. Usage:
  * `runMain graft.StreamProf <sfDir> [q1,q2,...]` (default: all s-*). */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (confArgs, nameArgs) = args.drop(1).partition(_.contains("="))
    val only = nameArgs.headOption.map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = confArgs.foldLeft(builder) { case (b, kv) =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Map[String, Long], Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        val p = e.progress
        events.add((p.name, p.batchId,
          p.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap,
          p.numInputRows))
      }
    })

    // same warm-up as Bench so first-query numbers are comparable
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.sources.TestData.graph(spark, sfDir).V("region").df.count()
      graft.services.Warm.resolve(spark, sfDir)
    } catch { case _: Throwable => () }

    val totals = scala.collection.mutable.LinkedHashMap.empty[String, Long].withDefaultValue(0L)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => n.startsWith("s") && only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        events.clear()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          import scala.jdk.CollectionConverters._
          val evs = events.asScala.toSeq
          val trig = evs.map(_._3.getOrElse("triggerExecution", 0L)).sum
          println(f"[sprof] $name wall=$wall%.3f s, batches=${evs.size}, triggerSum=${trig / 1e3}%.3f s, outside=${wall - trig / 1e3}%.3f s")
          evs.foreach { case (qn, bid, d, rows) =>
            val keys = Seq("addBatch", "walCommit", "commitOffsets", "queryPlanning",
              "getBatch", "latestOffset", "triggerExecution")
            val parts = keys.map(k => s"$k=${d.getOrElse(k, 0L)}").mkString(" ")
            val other = d.filterNot(kv => keys.contains(kv._1))
              .map { case (k, v) => s"$k=$v" }.mkString(" ")
            println(s"[sprof]   batch $bid rows=$rows $parts $other")
            d.foreach { case (k, v) => totals(k) += v }
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"[sprof] $name FAILED ${e.getMessage}")
        }
      }
    println("[sprof] phase totals over all batches (ms): " +
      totals.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
