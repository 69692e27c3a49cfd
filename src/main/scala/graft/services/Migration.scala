package graft.services

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/**
 * Ordered schema-migration operations with a version marker — the Spark
 * rendering of the reference's `Operations` layer (reference:
 * models/Operation.scala:12-131; executor loop :116-131: version 0 means
 * fresh install → create schema and jump to `lastVersion`; otherwise each
 * operation with index `v` such that `v+1 >= version` runs in order and
 * bumps the stored version to `v+2`, so an interrupted upgrade resumes at
 * the failed step).
 *
 * Tables live as parquet directories under a root; a migration is a
 * table→table rewrite staged to a sibling directory and swapped in — at
 * 100 TB that is the only sane shape (no in-place mutation, partition
 * parallelism for the rewrite, old files dropped after the swap), and it
 * never self-overwrites a directory Spark is still reading.
 *
 * Column operations also expose a pure `DataFrame => DataFrame` transform
 * so a pipeline can run storage-free (the oracle entry mg01 does).
 */
sealed trait MigrationOp { def info: String }

object MigrationOp {

  /** AddVertexModel/AddEdgeModel (Operation.scala:17-25): register a new
    * empty table. Parquet is schema-on-write, so materialization happens
    * on first write; the op exists for version ordering + logging parity. */
  final case class AddTable(label: String) extends MigrationOp {
    def info = s"Add vertex model $label to schema"
  }

  /** AddProperty with a default value for existing rows
    * (Operation.scala:27-30). */
  final case class AddProperty(table: String, name: String, dataType: DataType, default: Option[Column])
      extends MigrationOp {
    def info = s"Add property $name to $table"
    def transform(df: DataFrame): DataFrame =
      df.withColumn(name, default.getOrElse(lit(null)).cast(dataType))
  }

  /** RemoveProperty (Operation.scala:32-35). */
  final case class RemoveProperty(table: String, name: String) extends MigrationOp {
    def info = s"Remove property $name from $table"
    def transform(df: DataFrame): DataFrame = df.drop(name)
  }

  /** UpdateGraph (Operation.scala:37-60): a whole-table rewrite. The
    * reference pages through vertices 100 at a time mutating each; here
    * the update is declarative and Catalyst distributes it — same result,
    * one pass, no driver paging. */
  final case class UpdateTable(table: String, comment: String, update: DataFrame => DataFrame)
      extends MigrationOp {
    def info = s"Update graph: $comment"
    def transform(df: DataFrame): DataFrame = update(df)
  }

  /** AddIndex(unique)/ReindexData as a dedup check (Operation.scala:62-71;
    * reindex over a unique index surfaces constraint violations — the
    * analytics analog is an explicit duplicate-key scan that fails the
    * migration when the invariant doesn't hold). */
  final case class CheckUnique(table: String, cols: Seq[String]) extends MigrationOp {
    def info = s"Add index in $table for properties: ${cols.mkString(", ")}"
    /** Throws when `cols` is not a unique key of `df`. */
    def verify(df: DataFrame): Unit = {
      val dups = df.groupBy(cols.map(col): _*).count().where(col("count") > 1).limit(1).count()
      require(dups == 0L, s"unique index on ${cols.mkString(",")} violated in $table")
    }
  }

  case object NoOp extends MigrationOp { def info = "No operation" }
}

/** Parquet-directory storage + version marker for [[Operations]]. The
  * marker is a tiny driver-side file (`_version/<schema>`), the analog of
  * the reference's version vertex (models/Database.scala version map).
  *
  * All filesystem access goes through the Hadoop `FileSystem` API resolved
  * from the root path's scheme, so the store works wherever a 100 TB
  * migration actually runs — HDFS, `file:`, or an object store via its
  * Hadoop connector — not just local disk.
  *
  * Commit protocol (round 8 — replaces the two-rename directory swap,
  * whose window between `rename(dir→__old)` and `rename(stage→dir)` left
  * NO live table and was wider on object stores where rename is
  * copy+delete): table data lives in immutable VERSIONED directories
  * (`<table>__v<n>`; the pre-first-rewrite seed layout is the flat
  * `<table>` dir, version 0), and the live version is named by a tiny
  * pointer file `_current/<table>`. A rewrite stages the new version to
  * its own fresh directory — data directories are NEVER renamed — and
  * commits by atomically replacing the pointer (FileContext
  * rename-with-OVERWRITE where the scheme supports it — local, HDFS —
  * else delete+rename of the one-line file). Every crash state is
  * self-healing on the next read or rewrite ([[resolve]]): an
  * uncommitted stage is invisible and garbage-collected, a torn pointer
  * rolls forward from its validity-terminated `.tmp`, and the legacy
  * `__old` layout from the retired protocol is restored automatically.
  * The previous version directory is retained until the NEXT rewrite, so
  * readers holding plans against it survive one swap. */
final class MigrationStore(spark: SparkSession, root: String) {
  import org.apache.hadoop.fs.Path

  private def tableDir(name: String) = s"$root/$name"
  private val rootPath = new Path(root)
  private val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def versionFile(schema: String) = new Path(new Path(rootPath, "_version"), schema)
  private def pointerFile(table: String) = new Path(new Path(rootPath, "_current"), table)

  /** A pointer payload is one dir name terminated by '\n' — the
    * terminator doubles as the torn-write validity marker on schemes
    * where the fallback (non-atomic) pointer replace is in effect. */
  private def readPointer(p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw = try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      if (raw.endsWith("\n")) Some(raw.trim) else None
    }

  private def writeFile(p: Path, content: String): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  /** Atomic pointer replace where the scheme supports it; on schemes
    * without a FileContext binding, delete+rename of the one-line file —
    * the only non-atomic window left, recovered by [[resolve]] rolling
    * forward from the still-present `.tmp`. */
  private def commitPointer(table: String, dirName: String): Unit = {
    val ptr = pointerFile(table)
    val tmp = new Path(ptr.getParent, table + ".tmp")
    writeFile(tmp, dirName + "\n")
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, fs.getConf)
      fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
           _: UnsupportedOperationException =>
        if (fs.exists(ptr)) fs.delete(ptr, false)
        require(fs.rename(tmp, ptr), s"pointer rename $tmp -> $ptr failed")
    }
  }

  /** Resolve the live directory for `table`, repairing any documented
    * crash state on the way (self-healing read path — a crashed swap
    * never needs manual recovery):
    *  1. valid pointer → its target;
    *  2. missing/torn pointer but valid `.tmp` → re-commit from the tmp
    *     (a crash fell between the fallback delete and rename);
    *  3. no pointer: flat seed dir → itself, restoring it from the
    *     legacy protocol's `__old` backup first if a pre-round-8 crash
    *     left only that. */
  private def resolve(table: String): Path = {
    val ptr = pointerFile(table)
    readPointer(ptr) match {
      case Some(dir) =>
        val p = new Path(rootPath, dir)
        require(fs.exists(p), s"pointer $ptr names missing dir $dir")
        p
      case None =>
        val tmp = new Path(ptr.getParent, table + ".tmp")
        readPointer(tmp) match {
          case Some(dir) if fs.exists(new Path(rootPath, dir)) =>
            commitPointer(table, dir) // roll the torn commit forward
            new Path(rootPath, dir)
          case _ =>
            val flat = new Path(tableDir(table))
            val old = new Path(tableDir(table + "__old"))
            if (!fs.exists(flat) && fs.exists(old))
              require(fs.rename(old, flat), s"legacy recovery $old -> $flat failed")
            require(fs.exists(flat), s"table $table has no live directory under $root")
            flat
        }
    }
  }

  def read(table: String): DataFrame = spark.read.parquet(resolve(table).toString)

  private def versionOf(table: String, dir: Path): Int = {
    val suffix = dir.getName.stripPrefix(table + "__v")
    if (dir.getName == table) 0 else suffix.toInt
  }

  /** Staged rewrite: write version n+1 to its own fresh directory, commit
    * the pointer, then garbage-collect versions OLDER than the one just
    * replaced (kept one round for readers with open plans) plus any
    * leftover from the legacy swap protocol. Parquet cannot overwrite a
    * directory it is reading from; writing a NEW immutable directory per
    * version sidesteps that and never renames data. */
  def rewrite(table: String)(f: DataFrame => DataFrame): Unit = {
    val src = resolve(table)
    val n = versionOf(table, src)
    val stage = new Path(tableDir(s"${table}__v${n + 1}"))
    if (fs.exists(stage)) fs.delete(stage, true) // uncommitted crashed stage
    f(spark.read.parquet(src.toString)).write.mode("overwrite").parquet(stage.toString)
    commitPointer(table, stage.getName)
    // GC: every version strictly older than the just-replaced one, and
    // legacy-protocol leftovers
    val stale = fs.globStatus(new Path(rootPath, s"${table}__v*")).toSeq.map(_.getPath)
      .filter(p => versionOf(table, p) < n) ++
      Seq(new Path(tableDir(table + "__old")), new Path(tableDir(table + "__stage")))
        .filter(fs.exists) ++
      // the flat seed dir is version 0: collectable once v2 commits
      (if (n >= 1 && fs.exists(new Path(tableDir(table)))) Seq(new Path(tableDir(table))) else Nil)
    stale.foreach(fs.delete(_, true))
  }

  def version(schema: String): Int = {
    val f = versionFile(schema)
    if (fs.exists(f)) {
      val in = fs.open(f)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toInt
      finally in.close()
    } else 0
  }

  def setVersion(schema: String, v: Int): Unit = {
    val f = versionFile(schema)
    fs.mkdirs(f.getParent)
    val out = fs.create(f, true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
  }
}

object Operations {
  def apply(schemaName: String): Operations = new Operations(schemaName, Vector.empty)
}

/** The ordered operation list (reference: Operation.scala:93-131). */
final case class Operations private (schemaName: String, operations: Vector[MigrationOp]) {
  import MigrationOp._

  val lastVersion: Int = operations.length + 1

  private def add(op: MigrationOp) = copy(operations = operations :+ op)

  def addTable(label: String): Operations = add(AddTable(label))
  def addProperty(table: String, name: String, dataType: DataType, default: Column): Operations =
    add(AddProperty(table, name, dataType, Some(default)))
  def addProperty(table: String, name: String, dataType: DataType): Operations =
    add(AddProperty(table, name, dataType, None))
  def removeProperty(table: String, name: String): Operations = add(RemoveProperty(table, name))
  def updateTable(comment: String, table: String)(update: DataFrame => DataFrame): Operations =
    add(UpdateTable(table, comment, update))
  def checkUnique(table: String, cols: String*): Operations = add(CheckUnique(table, cols.toSeq))
  def noop: Operations = add(NoOp)

  /** Version-ordered execution against a store (reference loop,
    * Operation.scala:116-131). Returns the applied op infos. */
  def execute(store: MigrationStore, log: String => Unit = _ => ()): Seq[String] =
    store.version(schemaName) match {
      case 0 =>
        // fresh install: the current schema IS the target; skip the ops
        log(s"*** UPDATE SCHEMA OF $schemaName ($lastVersion): Create database schema")
        store.setVersion(schemaName, lastVersion)
        Seq("Create database schema")
      case version =>
        operations.zipWithIndex.collect {
          case (op, v) if v + 1 >= version =>
            log(s"*** UPDATE SCHEMA OF $schemaName (${v + 1}): ${op.info}")
            op match {
              case o: AddProperty => store.rewrite(o.table)(o.transform)
              case o: RemoveProperty => store.rewrite(o.table)(o.transform)
              case o: UpdateTable => store.rewrite(o.table)(o.transform)
              case o: CheckUnique => o.verify(store.read(o.table))
              case _: AddTable | NoOp => ()
            }
            store.setVersion(schemaName, v + 2)
            op.info
        }
    }

  /** The same pipeline as a pure DataFrame transform (storage-free), for
    * tables addressed by `table`. Check ops verify in place. */
  def transformOf(table: String)(df: DataFrame): DataFrame =
    operations.foldLeft(df) {
      case (acc, o: AddProperty) if o.table == table => o.transform(acc)
      case (acc, o: RemoveProperty) if o.table == table => o.transform(acc)
      case (acc, o: UpdateTable) if o.table == table => o.transform(acc)
      case (acc, o: CheckUnique) if o.table == table => o.verify(acc); acc
      case (acc, _) => acc
    }
}
