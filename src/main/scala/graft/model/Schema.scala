package graft.model

import org.apache.spark.sql.types._

/**
 * Schema kernel — the Spark-native analog of the reference's
 * `Model`/`Mapping` registry (reference: core/.../models/Model.scala:64-97,
 * core/.../models/Mapping.scala:57-106).
 *
 * A labeled property graph is a set of homogeneous vertex tables plus edge
 * tables with (src, dst) foreign keys (reference stores each entity as a
 * TinkerPop element filtered by a `_label` property,
 * janus/JanusDatabase.scala:487-503). Here each label IS a table
 * (parquet dataset), so the label filter becomes partition pruning by
 * construction and the `Mapping` layer collapses into `StructType`.
 */
object Audit {
  /** The six system columns every reference entity carries
    * (models/Model.scala:25-32). `_id` is the surrogate key; `_label` is
    * implied by the table but kept addressable for `hasLabel`. */
  val columns: Seq[StructField] = Seq(
    StructField("_id", StringType, nullable = false),
    StructField("_label", StringType, nullable = false),
    StructField("_createdBy", StringType, nullable = false),
    StructField("_updatedBy", StringType, nullable = true),
    StructField("_createdAt", TimestampType, nullable = false),
    StructField("_updatedAt", TimestampType, nullable = true)
  )
  val names: Seq[String] = columns.map(_.name)
}

/** Cardinality of a property (reference: MappingCardinality,
  * core/.../models/Mapping.scala:20-40). list/set become ArrayType; set
  * additionally carries an array_distinct invariant enforced on write. */
sealed trait Cardinality
object Cardinality {
  case object Single extends Cardinality
  case object Opt extends Cardinality
  case object List extends Cardinality
  case object Set extends Cardinality
}

/** One declared property: the analog of a `Mapping[M, D, G]`
  * (Mapping.scala:108-145). `zero` reproduces the reference's NoValue
  * zero-fill for missing single-valued reads (Mapping.scala:179-186,
  * models/NoValue.scala:10-20) — only applied where that behavior is
  * observable. */
final case class FieldDef(
    name: String,
    dataType: DataType,
    cardinality: Cardinality = Cardinality.Single,
    indexed: Boolean = false,
    unique: Boolean = false) {
  def zero: Any = dataType match {
    case StringType => ""
    case IntegerType | LongType => 0L
    case DoubleType | FloatType => 0.0
    case BooleanType => false
    case TimestampType => new java.sql.Timestamp(0L)
    case _ => null
  }
}

/** A vertex model: label + fields (reference macro output,
  * macro/ModelMacro.scala:19-91). */
final case class VertexDef(label: String, fields: Seq[FieldDef], idField: String = "_id")

/** An edge model: label + endpoints + fields (ModelMacro.scala:93-153).
  * In storage the edge table carries `_src`/`_dst` foreign keys. */
final case class EdgeDef(label: String, srcLabel: String, dstLabel: String, fields: Seq[FieldDef])
