package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec

/** Shared local session for all specs (getOrCreate → one JVM-wide session). */
trait SparkSpec extends AnyFunSpec {
  lazy val spark: SparkSession = SparkSpec.session

  /** Temp scratch for write-then-read tests, deleted afterwards — CI runs
    * must not accumulate tmpdir litter. */
  def withScratchDir[T](prefix: String)(body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      val st = java.nio.file.Files.walk(dir)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally st.close()
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions)
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
