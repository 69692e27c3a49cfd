package graft

import org.apache.spark.sql.functions._

/**
 * Plan-quality gates: the scale claims the engine makes (filter pushdown
 * to parquet, column pruning, broadcast of small dimensions) asserted on
 * the actual physical plans, so a regression that silently de-optimizes
 * a plan fails CI instead of only showing up at 100 TB.
 */
class PlanQualitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  describe("plan quality on the testdata graph") {

    it("pushes a has() filter into the parquet scan") {
      val t = graft.sources.TestData.graph(spark, sfDir)
        .V("customer").has("c_mktsegment", "BUILDING")
      val plan = t.df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters"), plan)
      assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
    }

    it("prunes unused columns out of the scan") {
      val t = graft.sources.TestData.graph(spark, sfDir)
        .V("customer").value("c_name")
      val plan = t.df.queryExecution.executedPlan.toString
      // ReadSchema must contain only the projected column, not the 8-col row
      assert(plan.contains("ReadSchema: struct<c_name:string>"), plan)
    }

    it("broadcasts the small dimension side of an FK hop") {
      val t = graft.sources.TestData.graph(spark, sfDir)
        .V("customer").out("cust_nation")
      val plan = t.df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    }

    it("keeps per-row pipeline expressions inside whole-stage codegen") {
      val df = graft.sources.TestData.graph(spark, sfDir)
        .V("documents").df
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      val spans = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    }
  }
}
