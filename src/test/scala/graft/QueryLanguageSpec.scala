package graft

import org.apache.spark.sql.functions._
import graft.query._

/** JSON filter/sort/aggregation grammar semantics (reference:
  * query/Filter.scala, InputSort.scala, Aggregation.scala). */
class QueryLanguageSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 10, Some(1.5)),
    (2L, "beta", 20, Some(2.5)),
    (3L, "gamma", 30, None),
    (4L, "alphabet", 40, Some(4.5))).toDF("id", "name", "n", "score")

  private def ids(json: String): Seq[Long] =
    df.where(FilterParser.parse(json, Properties.passthrough))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  describe("filter grammar") {
    it("_and/_or/_not compose") {
      assert(ids("""{"_and":[{"_gte":{"n":20}},{"_not":{"_is":{"name":"beta"}}}]}""") == Seq(3L, 4L))
      assert(ids("""{"_or":[{"_is":{"name":"beta"}},{"_gt":{"n":35}}]}""") == Seq(2L, 4L))
    }
    it("_any matches all") { assert(ids("""{"_any":""}""") == Seq(1L, 2L, 3L, 4L)) }
    it("string predicates") {
      assert(ids("""{"_startsWith":{"_field":"name","_value":"alpha"}}""") == Seq(1L, 4L))
      assert(ids("""{"_endsWith":{"_field":"name","_value":"a"}}""") == Seq(1L, 2L, 3L))
      assert(ids("""{"_like":{"_field":"name","_value":"*phab*"}}""") == Seq(4L))
      assert(ids("""{"_wildcard":{"_field":"name","_value":"g*"}}""") == Seq(3L))
    }
    it("_between is [from, to)") {
      assert(ids("""{"_between":{"_field":"n","_from":20,"_to":40}}""") == Seq(2L, 3L))
    }
    it("_in membership") {
      assert(ids("""{"_in":{"_field":"name","_values":["beta","gamma"]}}""") == Seq(2L, 3L))
    }
    it("_contains is existence (null check)") {
      assert(ids("""{"_contains":"score"}""") == Seq(1L, 2L, 4L))
      assert(ids("""{"_not":{"_contains":"score"}}""") == Seq(3L))
    }
    it("_ne is null-safe (null rows are 'not equal')") {
      assert(ids("""{"_ne":{"score":2.5}}""") == Seq(1L, 3L, 4L))
    }
    it("bare {field: value} equality") { assert(ids("""{"name":"beta"}""") == Seq(2L)) }
    it("unknown operator rejects") {
      assertThrows[IllegalArgumentException](ids("""{"_bogus":1}"""))
    }
  }

  describe("sort grammar") {
    it("accepts {field: dir} and +/- prefix forms; nulls first on asc, last on desc") {
      val asc = df.orderBy(SortParser.parse("""[{"score":"asc"}]""", Properties.passthrough): _*)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(asc == Seq(3L, 1L, 2L, 4L)) // null first
      val desc = df.orderBy(SortParser.parse("""["-score"]""", Properties.passthrough): _*)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(desc == Seq(4L, 2L, 1L, 3L)) // null last
    }
  }

  describe("aggregation language") {
    it("scalar agg over empty input yields null (reference null-on-empty)") {
      val agg = AggregationParser.parse(
        """{"_agg":"sum","_field":"n","_query":{"_gt":{"n":1000}}}""", Properties.passthrough)
      val row = AggCompiler(df, agg, Properties.passthrough).collect().head
      assert(row.isNullAt(0))
    }
    it("field aggregation orders by -count with top-k") {
      val data = Seq("a", "a", "a", "b", "b", "c").toDF("k")
      val agg = AggregationParser.parse(
        """{"_agg":"field","_field":"k","_select":[{"_agg":"count","_name":"cnt"}],
          |"_order":["-cnt"],"_size":2}""".stripMargin, Properties.passthrough)
      val rows = AggCompiler(data, agg, Properties.passthrough)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq("a" -> 3L, "b" -> 2L))
    }
    it("week buckets are MONDAY-anchored (reference roundToWeek +3d shift)") {
      val ts = Seq(
        java.sql.Timestamp.valueOf("1970-01-01 12:00:00"), // Thu → week of Mon Dec 29 1969
        java.sql.Timestamp.valueOf("1970-01-04 23:00:00"), // Sun → still Mon Dec 29
        java.sql.Timestamp.valueOf("1970-01-05 01:00:00")  // Mon → week of Mon Jan 5
      ).toDF("ts")
      val agg = AggregationParser.parse(
        """{"_agg":"time","_field":"ts","_interval":"1w","_select":[{"_agg":"count","_name":"cnt"}]}""",
        Properties.passthrough)
      val rows = AggCompiler(ts, agg, Properties.passthrough)
        .select(unix_millis(col("ts_bucket")), col("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq(-259200000L -> 2L, 345600000L -> 1L))
    }
    it("bucket boundaries bit-match the reference roundToWeek for 1w and 2w (post-epoch)") {
      // the reference's exact math (Aggregation.scala:409-414):
      // (t+3d) - (t+3d) % (n*1w) - 3d — the +3d shift (epoch day 0 is a
      // Thursday) lands bucket starts on MONDAY. Parity holds wherever
      // shifted = t+3d >= 0; the pre-epoch divergence is pinned below.
      def refRound(t: Long, n: Long): Long = {
        val shifted = t + 259200000L
        shifted - (shifted % (604800000L * n)) - 259200000L
      }
      val times = Seq(0L, 1L, 259199999L, 259200000L, 345600000L,
        1700000000123L, 1767225600000L)
      for (n <- Seq(1L, 2L)) {
        val tdf = times.map(new java.sql.Timestamp(_)).toDF("ts")
        val agg = AggregationParser.parse(
          s"""{"_agg":"time","_field":"ts","_interval":"${n}w","_select":[{"_agg":"count","_name":"cnt"}]}""",
          Properties.passthrough)
        val buckets = AggCompiler(tdf, agg, Properties.passthrough)
          .select(unix_millis(col("ts_bucket"))).collect().map(_.getLong(0)).toSet
        assert(buckets == times.map(refRound(_, n)).toSet)
      }
    }
    it("pre-1970 week buckets FLOOR — a deliberate, pinned divergence from the reference") {
      // For shifted = t+3d < 0 Java's truncating % makes the reference's
      // roundToWeek round UP: every t with shifted in (-1w, 1w) collapses
      // into the Mon 1969-12-29 bucket — a double-width bucket spanning
      // epoch, and bucket starts that can postdate their members. The
      // engine uses floor semantics (pmod) instead: every bucket is
      // exactly one week and starts at-or-before its members, which is
      // the correct shape for historical data at scale. Oracle-pinned by
      // t09 over shifted testdata timestamps.
      val t = java.sql.Timestamp.valueOf("1969-12-25 00:00:00") // Thu, shifted < 0
      val tdf = Seq(t).toDF("ts")
      val agg = AggregationParser.parse(
        """{"_agg":"time","_field":"ts","_interval":"1w","_select":[{"_agg":"count","_name":"cnt"}]}""",
        Properties.passthrough)
      val bucket = AggCompiler(tdf, agg, Properties.passthrough)
        .select(unix_millis(col("ts_bucket"))).collect().head.getLong(0)
      val mon19691222 = -864000000L // Mon 1969-12-22, the true floor
      assert(bucket == mon19691222)
      // the reference's truncating % would put it a week later instead
      val shifted = t.getTime + 259200000L
      val refBucket = shifted - (shifted % 604800000L) - 259200000L
      assert(refBucket == mon19691222 + 604800000L)
    }
    it("interval grammar parses n-unit strings and ChronoUnit objects") {
      val a = AggregationParser.parse(
        """{"_agg":"time","_field":"ts","_interval":"6h"}""", Properties.passthrough)
      assert(a.asInstanceOf[Agg.ByTime].interval.contains((6L * 3600000, 0L)))
      val b = AggregationParser.parse(
        """{"_agg":"time","_field":"ts","_interval":{"_interval":1,"_unit":"MONTHS"}}""",
        Properties.passthrough)
      assert(b.asInstanceOf[Agg.ByTime].calendarUnit.contains("month"))
    }
  }

  describe("public properties") {
    it("renames and computes; rejects unknown names when closed") {
      val props = Properties(PublicProperty("upper", upper(col("name"))))
      val out = df.where(FilterParser.parse("""{"_is":{"upper":"BETA"}}""", props))
      assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
      assertThrows[IllegalArgumentException](
        FilterParser.parse("""{"_is":{"nope":1}}""", props))
    }
  }
}
