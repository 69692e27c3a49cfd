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
  * Hadoop connector — not just local disk. Caveat, documented not hidden:
  * on object stores (S3A/GCS) `rename` is a non-atomic copy+delete, so the
  * swap window is wider there; HDFS and local `file:` renames are atomic.
  * The crash-safety story is unchanged on every scheme: the stage write
  * completes before any rename, so a crash at any point leaves either the
  * old table, or the new table, or the old table plus a recoverable
  * `__stage`/`__old` sibling — never a half-written live directory. */
final class MigrationStore(spark: SparkSession, root: String) {
  import org.apache.hadoop.fs.Path

  private def tableDir(name: String) = s"$root/$name"
  private val rootPath = new Path(root)
  private val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def versionFile(schema: String) = new Path(new Path(rootPath, "_version"), schema)

  def read(table: String): DataFrame = spark.read.parquet(tableDir(table))

  /** Staged rewrite: write to `<table>__stage`, swap directories via
    * `fs.rename`. Parquet cannot overwrite a directory it is reading from;
    * the stage-and-swap also means a crash mid-write leaves the old table
    * intact. Any `__old` leftover from a previous crashed swap is cleared
    * first so the rename has a free target. */
  def rewrite(table: String)(f: DataFrame => DataFrame): Unit = {
    val stage = tableDir(table + "__stage")
    f(read(table)).write.mode("overwrite").parquet(stage)
    val dir = new Path(tableDir(table))
    val old = new Path(tableDir(table + "__old"))
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(dir, old), s"rename $dir -> $old failed")
    require(fs.rename(new Path(stage), dir), s"rename $stage -> $dir failed")
    fs.delete(old, true)
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
