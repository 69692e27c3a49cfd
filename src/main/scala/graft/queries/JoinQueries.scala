package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.TestData
import CoreQueries.Q

/**
 * Join shapes Spark lacks as primitives, composed scale-first:
 *
 *  - AS-OF join (latest earlier event): NOT a range join — union the two
 *    tagged streams and take a running `last(..., ignoreNulls)` over one
 *    window per key. ONE shuffle on the key, no pair blowup, state
 *    bounded by the window frame. This is the shape a 100 TB
 *    trades/quotes as-of runs.
 *  - RANGE join (pairs within Δt): bucket the time axis at the range
 *    width; probe side explodes to its bucket ± 1, equi-join on
 *    (key, bucket), exact filter after — candidate pairs are bounded per
 *    bucket instead of the quadratic per-key theta join.
 *
 * Plus rollup and pivot — standard warehouse surface the engine exposes
 * directly from Spark.
 */
object JoinQueries {

  val all: Seq[Q] = Seq(
    Q("q76_asof_join",
      // each purchase joined to the user's latest view at-or-before it
      (s, dir) => {
        val ev = TestData.graph(s, dir).V("events").df
          .where(col("event_type").isin("view", "purchase"))
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type") === "view", col("event_id")).as("vid"),
            (col("event_type") === "purchase").as("isp"))
        // views sort before purchases at equal ts, so "at-or-before"
        // includes the tie; last() picks max ts then max event_id
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("isp").cast("int"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_view_id", last(col("vid"), ignoreNulls = true).over(w))
          .where(col("isp"))
          .select(col("event_id").as("purchase_id"), col("last_view_id"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id,
             |  (SELECT v.event_id FROM events v
             |   WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
             |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_id
             |FROM events p WHERE p.event_type = 'purchase'
             |ORDER BY purchase_id""".stripMargin)),

    Q("q77_range_join_bucketed",
      // same-user event pairs within 1 hour: bucketed band join, probe
      // explodes to bucket-1..bucket+1, exact filter after the equi-join.
      // The shuffle_hash hint on the UN-exploded side: a sort-merge join
      // would sort the 3×-exploded probe stream just to discard the order
      // at the next exchange — at sf100 that sort is 300 M rows through
      // whatever partition count the session has, and it spills long
      // before the hash table (1/3 the rows, built per-partition) would.
      // Measured at sf100/local[32], 32 shuffle partitions: 85 s SMJ →
      // 19 s SHJ (sf10: 5 s — sub-linear for 10× data).
      (s, dir) => {
        val base = TestData.graph(s, dir).V("events").df
          .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        val probe = base.select(
          col("user_id"), col("event_id").as("a_id"), col("ms").as("a_ms"),
          explode(expr(
            "array(ms div 3600000 - 1, ms div 3600000, ms div 3600000 + 1)")).as("bucket"))
        val build = base.select(
          col("user_id").as("u2"), col("event_id").as("b_id"), col("ms").as("b_ms"),
          expr("ms div 3600000").as("bucket_b"))
        probe.join(build.hint("shuffle_hash"),
          col("user_id") === col("u2") && col("bucket") === col("bucket_b") && col("a_id") < col("b_id"))
          .where(abs(col("b_ms") - col("a_ms")) <= 3600000L)
          .select("a_id", "b_id").orderBy("a_id", "b_id")
      },
      Some("""SELECT a.event_id AS a_id, b.event_id AS b_id
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             |  AND abs(epoch_ms(b.ts) - epoch_ms(a.ts)) <= 3600000
             |ORDER BY 1, 2""".stripMargin)),

    Q("q78_rollup",
      (s, dir) => TestData.graph(s, dir).V("lineitem").df
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)),

    Q("q79_pivot",
      // empty pivot cells coalesce to 0, matching count FILTER semantics
      // (Spark's pivot yields NULL for a combination with no rows)
      (s, dir) => TestData.graph(s, dir).V("lineitem").df
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0L)).as("F"), coalesce(col("O"), lit(0L)).as("O"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  count(*) FILTER (l_linestatus = 'F') AS F,
             |  count(*) FILTER (l_linestatus = 'O') AS O
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q89_window_running_total",
      // frame-based window aggregate: per-customer running order total in
      // (date, key) order — ONE shuffle on the partition key, then a
      // sorted in-partition scan; the decimal accumulator keeps the
      // running sum bit-stable at any partition count
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        TestData.graph(s, dir).V("orders").df
          .select(col("o_custkey"), col("o_orderkey"),
            graft.functions.DuckDecimalCast.duckDouble(
              sum(graft.functions.DuckDecimalCast.duckDecimal6(col("o_totalprice")))
                .over(w)).as("running"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q90_cube",
      // CUBE grouping sets (alongside q78's rollup): all four grouping
      // combinations in one pass — Spark expands the sets map-side, still
      // one shuffle. Subtotal rows are discriminated with grouping(), NOT
      // by coalescing the key: a genuinely NULL key value would otherwise
      // collide with the total row and make the output ambiguous (and its
      // sort order nondeterministic)
      (s, dir) => TestData.graph(s, dir).V("lineitem").df
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .select(
          when(col("g_rf") === 1, lit("<all>"))
            .otherwise(coalesce(col("l_returnflag"), lit("<null>"))).as("rf"),
          when(col("g_ls") === 1, lit("<all>"))
            .otherwise(coalesce(col("l_linestatus"), lit("<null>"))).as("ls"),
          col("n"))
        .orderBy("rf", "ls"),
      Some("""SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN '<all>'
             |    ELSE coalesce(l_returnflag, '<null>') END AS rf,
             |  CASE WHEN GROUPING(l_linestatus) = 1 THEN '<all>'
             |    ELSE coalesce(l_linestatus, '<null>') END AS ls,
             |  count(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    Q("q88_skew_salted_join",
      // SALTED shuffle join — the skew mitigation for a hot join key. A
      // low-cardinality key (event_type here: every key is hot) would pile
      // each key's entire fact volume onto one shuffle partition; salting
      // spreads it: the fact side gets a deterministic salt in [0, S), the
      // dimension side replicates each row S times (explode), and the join
      // runs on (key, salt) — S-way parallelism per hot key, identical
      // result to the plain join (which is exactly what the oracle runs).
      // The shuffle_hash hint pins the shuffled path the pattern exists
      // for: at 100 TB the dimension (× S replication) can exceed the
      // broadcast threshold, and AQE's skew split only kicks in after a
      // partition has already been built oversized. S trades replication
      // volume for parallelism; 8 suffices to split any key across a
      // 32-slot stage.
      (s, dir) => {
        val S = 8
        val ev = TestData.graph(s, dir).V("events").toDF
        val dim = ev.groupBy(col("event_type"))
          .agg((graft.functions.DuckDecimalCast.duckDouble(
            sum(graft.functions.DuckDecimalCast.duckDecimal6(col("value"))))
            / count(lit(1))).as("tavg"))
        val fact = ev.withColumn("salt", pmod(col("event_id"), lit(S.toLong)).cast("int"))
        val saltedDim = dim.withColumn("salt", explode(array((0 until S).map(lit): _*)))
        fact.join(saltedDim.hint("shuffle_hash"), Seq("event_type", "salt"))
          .select(col("event_id"), col("event_type"), col("value"), col("tavg"),
            (col("value") - col("tavg")).as("dev"))
          .orderBy("event_id")
      },
      Some("""WITH dim AS (SELECT event_type,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS tavg
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value, d.tavg, e.value - d.tavg AS dev
             |FROM events e JOIN dim d USING (event_type)
             |ORDER BY event_id""".stripMargin)),

    Q("q94_having_join_topk",
      // TPC-H Q18 shape through the DSL: orders whose lineitem quantity
      // sum exceeds a threshold (projectBy correlated aggregation →
      // HAVING), re-typed back to the orders model, joined to customer,
      // top-100 by price. The quantity pre-aggregation happens per
      // orderkey BELOW the customer join — |orders|-sized rows reach
      // that join, never |lineitem|-sized (PlanQualitySpec gates it);
      // the EagerCountAggregation fixpoint must leave this
      // already-pushed shape alone. l_quantity is integral, so the
      // double sum is order-exact without decimal accumulation.
      (s, dir) => {
        val g = TestData.graph(s, dir)
        val orderCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val t = g.V("orders")
          .projectBy((orderCols.map(c => graft.traversal.ProjectBy.Col(c, col(c))) :+
            graft.traversal.ProjectBy.Sub("sum_qty", _.in("of_order").value("l_quantity"), "sum")): _*)
          .retype("orders")
          .where(col("sum_qty") > 300)
          .as("oq")
        val hopped = t.out("placed_by")
        hopped.project(
          "c_name" -> col("c_name"),
          "c_custkey" -> col("c_custkey"),
          "o_orderkey" -> hopped.sel("oq", "o_orderkey"),
          // o_orderdate is TIMESTAMP_NTZ; UTC session makes the cast exact
          "o_orderdate_ms" -> unix_millis(hopped.sel("oq", "o_orderdate").cast("timestamp")),
          "o_totalprice" -> hopped.sel("oq", "o_totalprice"),
          "sum_qty" -> hopped.sel("oq", "sum_qty"))
          .sortBy(col("o_totalprice").desc_nulls_last, col("o_orderdate_ms").asc_nulls_first,
            col("o_orderkey").asc_nulls_first)
          .limit(100).toDF
      },
      Some("""SELECT c.c_name, c.c_custkey, o.o_orderkey,
             |  epoch_ms(o.o_orderdate) AS o_orderdate_ms,
             |  o.o_totalprice, l.sum_qty
             |FROM orders o
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             |      FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON c.c_custkey = o.o_custkey
             |WHERE l.sum_qty > 300
             |ORDER BY o.o_totalprice DESC, o_orderdate_ms, o.o_orderkey
             |LIMIT 100""".stripMargin))
  )
}
