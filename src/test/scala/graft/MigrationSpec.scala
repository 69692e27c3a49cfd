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

  describe("pointer-file commit protocol") {

    it("versioned dirs: previous version survives one rewrite, older are GC'd") {
      withScratchDir("mig") { root =>
        val store = seed(root)
        def names = new java.io.File(root).listFiles().map(_.getName).toSet
        store.rewrite("docs")(_.withColumn("a", lit(1)))
        assert(names.contains("docs") && names.contains("docs__v1")) // flat kept one round
        store.rewrite("docs")(_.withColumn("b", lit(2)))
        assert(!names.contains("docs") && names.contains("docs__v1") && names.contains("docs__v2"))
        store.rewrite("docs")(_.withColumn("c", lit(3)))
        assert(!names.contains("docs__v1") && names.contains("docs__v2") && names.contains("docs__v3"))
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "legacy", "a", "b", "c"))
      }
    }

    it("an uncommitted crashed stage is invisible to reads and cleared by the next rewrite") {
      withScratchDir("mig") { root =>
        import spark.implicits._
        val store = seed(root)
        store.rewrite("docs")(_.withColumn("a", lit(1)))
        // crash state: a later rewrite completed its stage write but died
        // before the pointer commit — the stage is junk the reader must
        // never see
        Seq((7, 7, "junk")).toDF("x", "y", "z").write.parquet(s"$root/docs__v2")
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "legacy", "a"))
        store.rewrite("docs")(_.withColumn("b", lit(2)))
        assert(store.read("docs").columns.toSeq == Seq("id", "len", "legacy", "a", "b"))
        assert(store.read("docs").count() == 3) // junk stage replaced, not merged
      }
    }

    it("on a copy+delete-rename FS, a crash mid-pointer-commit self-heals on next read") {
      withScratchDir("mig") { root =>
        import spark.implicits._
        val conf = spark.sparkContext.hadoopConfiguration
        conf.set("fs.crashfs.impl", classOf[CrashFs].getName)
        // no fs.AbstractFileSystem.crashfs.impl binding → FileContext is
        // unsupported → the store takes the delete+rename fallback, which
        // is exactly the window object stores widen
        val cRoot = s"crashfs://$root"
        Seq((1, 5, "a"), (2, 12, "b"), (3, 9, "c")).toDF("id", "len", "legacy")
          .write.parquet(s"$cRoot/docs")
        val store = new MigrationStore(spark, cRoot)
        store.rewrite("docs")(_.withColumn("a", lit(1))) // clean commit → pointer live
        try {
          CrashFs.crashOnRenameTo = "_current/docs"
          // the torn overwrite: the fallback path has DELETED the live
          // pointer when the rename dies — pointer gone, only the
          // validity-terminated .tmp (naming the completed v2 stage) left
          intercept[java.io.IOException](store.rewrite("docs")(_.withColumn("b", lit(2))))
        } finally CrashFs.crashOnRenameTo = null
        // a FRESH store (new process) must resolve without manual repair:
        // the torn commit rolls forward from the .tmp to the completed v2
        val recovered = new MigrationStore(spark, cRoot)
        assert(recovered.read("docs").columns.toSeq == Seq("id", "len", "legacy", "a", "b"))
        assert(recovered.read("docs").count() == 3)
        // and the healed pointer is a normal live pointer: next rewrite works
        recovered.rewrite("docs")(_.withColumn("c", lit(3)))
        assert(recovered.read("docs").columns.toSeq == Seq("id", "len", "legacy", "a", "b", "c"))
      }
    }
  }
}

/** Object-store-semantics shim: a local FS whose rename is COPY + DELETE
  * (non-atomic, like S3A/GCS), with an injectable crash after the delete
  * of the destination's content has happened conceptually — i.e. the
  * rename dies leaving src intact and dst absent. Used to prove the
  * migration pointer protocol self-heals where the old two-rename swap
  * could strand a table. */
class CrashFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "crashfs"
  override def getUri: java.net.URI = java.net.URI.create("crashfs:///")
  override def rename(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Boolean = {
    val tgt = Option(CrashFs.crashOnRenameTo)
    if (tgt.exists(t => dst.toString.contains(t)))
      throw new java.io.IOException(s"injected crash renaming to $dst")
    // copy+delete, the object-store shape of rename
    org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst, false, getConf) &&
      delete(src, true)
  }
}

object CrashFs {
  /** When non-null, any rename whose destination contains this substring
    * throws (the injected crash point). */
  @volatile var crashOnRenameTo: String = null
}
