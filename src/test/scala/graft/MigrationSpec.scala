package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import graft.services.{MigrationStore, Operations}

/**
 * Version-ordered migration execution (reference: models/Operation.scala:
 * 116-131): fresh installs jump straight to lastVersion without running
 * ops; upgrades run every op with index v where v+1 >= stored version, in
 * order, bumping the marker to v+2 after each — so a failed upgrade
 * resumes at the failed step, not from the beginning.
 */
class MigrationSpec extends SparkSpec {

  private def ops = Operations("app")
    .addProperty("docs", "tier", StringType, lit("unknown"))
    .updateTable("backfill tier", "docs")(
      _.withColumn("tier", when(col("len") >= 10, "long").otherwise("short")))
    .removeProperty("docs", "legacy")

  private def seed(root: String): MigrationStore = {
    import spark.implicits._
    Seq((1, 5, "a"), (2, 12, "b"), (3, 9, "c"))
      .toDF("id", "len", "legacy")
      .write.parquet(s"$root/docs")
    new MigrationStore(spark, root)
  }

  describe("Operations.execute") {
    it("fresh install (version 0) creates at lastVersion without running ops") {
      withScratchDir("mig") { root =>
        val store = seed(root)
        val applied = ops.execute(store)
        assert(applied == Seq("Create database schema"))
        assert(store.version("app") == 4) // 3 ops → lastVersion 4
        // table untouched: a fresh install's schema is already current
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "legacy"))
      }
    }

    it("upgrade from version 1 applies every op in declaration order") {
      withScratchDir("mig") { root =>
        val store = seed(root)
        store.setVersion("app", 1)
        val applied = ops.execute(store)
        assert(applied == Seq(
          "Add property tier to docs",
          "Update graph: backfill tier",
          "Remove property legacy from docs"))
        assert(store.version("app") == 4)
        val out = store.read("docs").orderBy("id").collect()
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "tier"))
        assert(out.map(_.getAs[String]("tier")).toSeq == Seq("short", "long", "short"))
      }
    }

    it("resumes mid-list: ops below the stored version are skipped") {
      withScratchDir("mig") { root =>
        val store = seed(root)
        // pretend op index 0 (addProperty, bumps the marker to 2) already
        // ran on a previous attempt: stage its effect and set the marker
        store.rewrite("docs")(_.withColumn("tier", lit("unknown")))
        store.setVersion("app", 2)
        val applied = ops.execute(store)
        assert(applied == Seq(
          "Update graph: backfill tier",
          "Remove property legacy from docs"))
        assert(store.version("app") == 4)
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "tier"))
      }
    }

    it("a failing check stops the upgrade with the marker at the failed step") {
      withScratchDir("mig") { root =>
        import spark.implicits._
        Seq((1, "x"), (1, "y")).toDF("id", "v").write.parquet(s"$root/docs")
        val store = new MigrationStore(spark, root)
        store.setVersion("app", 1)
        val failing = Operations("app")
          .addProperty("docs", "extra", IntegerType, lit(0))
          .checkUnique("docs", "id") // violated: two rows with id=1
          .removeProperty("docs", "v")
        intercept[IllegalArgumentException](failing.execute(store))
        // op index 0 committed (marker 2), the check at index 1 did not
        assert(store.version("app") == 2)
        assert(store.read("docs").columns.contains("extra"))
        assert(store.read("docs").columns.contains("v")) // op 3 never ran
      }
    }

    it("runs against an explicit file:-scheme root through the Hadoop FileSystem API") {
      withScratchDir("mig") { root =>
        seed(root)
        // scheme-qualified root: every store operation (version marker,
        // staged swap, delete) must resolve through Hadoop's FileSystem,
        // the same code path an hdfs:// or s3a:// root takes
        val store = new MigrationStore(spark, "file:" + root)
        store.setVersion("app", 1)
        val applied = ops.execute(store)
        assert(applied.size == 3)
        assert(store.version("app") == 4)
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "tier"))
        // the swap left no stage/old siblings behind
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/docs__stage")))
        assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/docs__old")))
      }
    }

    it("rewrite clears a leftover __old directory from a previous crashed swap") {
      withScratchDir("mig") { root =>
        import spark.implicits._
        val store = seed(root)
        // simulate a crash after the first rename of a previous attempt
        Seq((99, 1, "stale")).toDF("id", "len", "legacy").write.parquet(s"$root/docs__old")
        store.rewrite("docs")(_.withColumn("tier", lit("t")))
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "legacy", "tier"))
        assert(store.read("docs").count() == 3) // stale __old rows are gone, not merged
      }
    }

    it("rerun after repair resumes at the failed check, not from scratch") {
      withScratchDir("mig") { root =>
        import spark.implicits._
        Seq((1, "x"), (1, "y")).toDF("id", "v").write.parquet(s"$root/docs")
        val store = new MigrationStore(spark, root)
        store.setVersion("app", 1)
        val failing = Operations("app")
          .addProperty("docs", "extra", IntegerType, lit(0))
          .checkUnique("docs", "id")
          .removeProperty("docs", "v")
        intercept[IllegalArgumentException](failing.execute(store))
        // repair the data, rerun: only the check + the tail run
        store.rewrite("docs")(_.dropDuplicates("id"))
        val applied = failing.execute(store)
        assert(applied == Seq(
          "Add index in docs for properties: id",
          "Remove property v from docs"))
        assert(store.version("app") == 4)
        assert(store.read("docs").columns.toSeq == Seq("id", "extra"))
      }
    }
  }
}
