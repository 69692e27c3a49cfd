package graft
import org.apache.spark.sql.functions._
object SpanSizeDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def spans(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val kids: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }
        p match {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
            val ops = scala.collection.mutable.Buffer.empty[String]
            w.foreach(x => ops += x.nodeName)
            val (_, code) = w.doCodeGen()
            val (_, stats) = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.compile(code)
            println(f"$name%-14s span maxMethod=${stats.maxMethodCodeSize}%6d chars=${code.body.length}%7d ops=${ops.take(6).mkString(",")}")
          case _ => ()
        }
        kids.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    val names: Seq[String] = args.drop(1).headOption match {
      case Some("all") => SparkEntry.queries.keys.toSeq.sorted
      case Some(list) => list.split(',').toSeq
      case None => Seq("e05_ivf_coarse_ann", "e06_ivf_lloyd_ann", "e08_pq_adc_ann",
        "e18_mog_pq_recall", "e20_mog_residual_recall", "e10_semdedup")
    }
    for (n <- names)
      try spans(SparkEntry.queries(n)(spark, sfDir), n)
      catch { case e: Throwable => println(s"$n FAILED ${e.getMessage}") }
    // the K=64 assignment shape (runs behind checkpoints in the real queries)
    val cents64 = (0 until 64).map { i =>
      (i.toLong, IndexedSeq.tabulate(64)(j => ((i * 64 + j) % 17 - 8) / 8.0f), 1.0)
    }
    val wide = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), graft.sources.AnnIndex.cosAssignCol(cents64).as("cid"))
    spans(wide, "k64-assign")
    spark.stop()
  }
}
