package graft

import graft.sources.TestData

/** Catalog load-boundary behavior: data-sized shuffle partitioning. */
class TestDataSpec extends SparkSpec {

  it("sizes the AQE initial partition count from input volume") {
    // floor wins for small inputs
    assert(TestData.partitionTarget(0L, 32L) === 32L)
    assert(TestData.partitionTarget(1L << 30, 32L) === 32L) // 1 GB / 32 MB = 32
    // one partition per 32 MB in the scaling regime
    assert(TestData.partitionTarget(21L << 30, 32L) === 672L) // sf100's 21 GB
    assert(TestData.partitionTarget(210L << 20, 32L) === 32L) // sf0.1 stays at floor
    // capped for pathological inputs (a 100 TB catalog still plans)
    assert(TestData.partitionTarget(100L << 40, 32L) === 2048L)
  }

  it("building the graph pins the initial partition count at the floor for small data") {
    TestData.graph(spark, "/root/testdata/sf0.001")
    val v = spark.conf.getOption("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    assert(v.exists(_.toLong >= spark.sparkContext.defaultParallelism),
      s"expected initialPartitionNum >= parallelism after graph build, got $v")
  }
}
