package graft
import org.apache.spark.sql.SparkSession

/** Rows-only correctness probe for output-bound queries at large SFs.
  *
  * Usage: runMain graft.RowCount <sfDir> <q1,q2,...>
  *
  * Runs each named [[SparkEntry.queries]] entry and prints one
  * `[rowcount] <name> <rows>` line. This is the Spark half of the
  * driver's weaker rows-only check (`tools/rowcount_check.py` runs
  * `SELECT COUNT(*)` over the same oracle SQL in DuckDB and compares):
  * [[Verify]] materializes every result to parquet, which at sf10
  * measures the harness rather than the engine (q10 alone emits ~3 G
  * rows), while a `count()` aggregates in place — the full input still
  * flows through the plan, only the output is reduced.
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: RowCount <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      // STDOUT like Verify's [verify] lines: the forked JVM's stdout
      // passes through sbt raw for the tool to grep
      try println(s"[rowcount] $name ${fn(spark, sfDir).count()}")
      catch { case e: Throwable => println(s"[rowcount] $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
