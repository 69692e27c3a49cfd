package graft
import org.apache.spark.sql.SparkSession
/** Scratch (r15, not committed): run one s-query and dump per-batch
  * StreamingQueryProgress durations to see where replay time goes. */
object StreamMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.sources.TestData.graph(spark, dir).V("region").df.count()
    graft.services.Warm.resolve(spark, dir)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[sm] started ${e.name} @${System.nanoTime()/1000000}")
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"[sm] batch ${e.progress.batchId} rows=${e.progress.numInputRows} durations=${e.progress.durationMs}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[sm] terminated @${System.nanoTime()/1000000}")
    }
    spark.streams.addListener(listener)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"[sm] TOTAL $n ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    spark.stop()
  }
}
