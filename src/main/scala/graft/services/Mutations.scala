package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{Cardinality, EdgeDef, FieldDef, VertexDef}

/**
 * Write-path operations — the Spark rendering of the reference's OLTP
 * services (reference: services/VertexSrv.scala:61-95, EdgeSrv.scala:36-38,
 * query/PublicProperty.scala:107-141 PropertyUpdater,
 * TraversalOps.scala:156-160 remove, models/Database.scala:175-208 audit
 * columns, services/IntegrityCheckOps.scala:313-343,486-493 dedup resolve).
 *
 * In an analytics engine these are pure table→table rewrites the caller
 * persists (overwrite or MERGE at the storage layer); none of them
 * collect to the driver. At 100 TB an update/delete is a partition-
 * pruned rewrite of affected partitions, and the duplicate-merge is two
 * hash joins on the key columns.
 */
object Mutations {

  /** Attach the six audit columns to new rows (reference:
    * models/Model.scala:25-32; materialized at write time,
    * janus/JanusDatabase.scala:436-471). `idCol` must already be unique. */
  def withAudit(rows: DataFrame, label: String, by: String, at: java.sql.Timestamp): DataFrame =
    rows
      .withColumn("_label", lit(label))
      .withColumn("_createdBy", lit(by))
      .withColumn("_createdAt", lit(at))
      .withColumn("_updatedBy", lit(null).cast("string"))
      .withColumn("_updatedAt", lit(null).cast("timestamp"))

  /** Insert = append (reference: VertexSrv.createEntity). */
  def create(table: DataFrame, rows: DataFrame): DataFrame =
    table.unionByName(rows, allowMissingColumns = true)

  /** Model-aware insert: enforces declared cardinalities on the written
    * rows before appending (see [[conform]]). */
  def create(table: DataFrame, rows: DataFrame, model: VertexDef): DataFrame =
    create(table, conform(rows, model.fields, isEdge = false))

  /** Edge insert: additionally rejects multi-valued properties — the
    * reference throws for edges at the Mapping layer
    * (MultiValueMapping.addValue, models/Mapping.scala:147-158). */
  def create(table: DataFrame, rows: DataFrame, model: EdgeDef): DataFrame =
    create(table, conform(rows, model.fields, isEdge = true))

  /** Enforce declared property cardinalities on rows about to be written
    * (reference: models/Mapping.scala:147-168 MultiValueMapping — edges
    * reject multi-valued properties; :275-308 SetMapping — a Set-valued
    * property is a value SET): `Set` columns get `array_distinct` applied
    * map-side (no shuffle), and any List/Set field on an edge model is a
    * schema error, surfaced at plan time rather than per row. */
  def conform(rows: DataFrame, fields: Seq[FieldDef], isEdge: Boolean): DataFrame = {
    val multi = fields.filter(f =>
      f.cardinality == Cardinality.List || f.cardinality == Cardinality.Set)
    if (isEdge && multi.nonEmpty)
      throw new IllegalArgumentException(
        s"edges don't support multi-valued properties: ${multi.map(_.name).mkString(", ")} " +
          "(reference: models/Mapping.scala:150-158)")
    fields.foldLeft(rows) { (df, f) =>
      if (f.cardinality == Cardinality.Set && df.columns.contains(f.name))
        df.withColumn(f.name, array_distinct(col(f.name)))
      else df
    }
  }

  /** The declared unique-index key set of a model (reference:
    * models/Model.scala:16-19 IndexType.unique + DedupCheck reading the
    * model's unique indexes, IntegrityCheckOps.scala:486-493). */
  def uniqueKeys(model: VertexDef): Seq[String] =
    model.fields.filter(_.unique).map(_.name)

  /** Duplicate-vertex resolution driven by the model's declared `unique`
    * flags instead of a caller-supplied key list. */
  def mergeDuplicates(
      vertices: DataFrame,
      model: VertexDef,
      orderCol: String): (DataFrame, DataFrame) = {
    val keys = uniqueKeys(model)
    require(keys.nonEmpty, s"model '${model.label}' declares no unique fields")
    mergeDuplicates(vertices, model.idField, keys, orderCol)
  }

  /** Point update of selected rows + `_updatedAt`/`_updatedBy` stamping
    * (reference: PropertyUpdater, PublicProperty.scala:107-141). Rows not
    * matching `cond` pass through unchanged. */
  def updateWhere(
      table: DataFrame,
      cond: Column,
      sets: Map[String, Column],
      by: String,
      at: java.sql.Timestamp): DataFrame = {
    val withSets = sets.foldLeft(table) { case (df, (field, value)) =>
      df.withColumn(field, when(cond, value).otherwise(col(field)))
    }
    if (!table.columns.contains("_updatedAt")) withSets
    else withSets
      .withColumn("_updatedAt", when(cond, lit(at)).otherwise(col("_updatedAt")))
      .withColumn("_updatedBy", when(cond, lit(by)).otherwise(col("_updatedBy")))
  }

  /** Append ONE value to a multi-valued property of the rows matching
    * `cond` (reference: MultiValueMapping.addValue,
    * models/Mapping.scala:147-151,161-162; TraversalOps.scala:589-593).
    * Cardinality decides the semantics exactly as gremlin's does: List
    * appends unconditionally (duplicates accumulate), Set appends only
    * when the value is absent (a no-op otherwise, preserving stored
    * order). A null array means "no values yet" and becomes `[value]`.
    * Pure map-side column rewrite through [[updateWhere]] — no shuffle,
    * audit stamping included. Single/Opt fields refuse: the reference
    * only exposes these steps on Seq/Set selectors. */
  def addValueWhere(
      table: DataFrame,
      cond: Column,
      field: String,
      value: Column,
      cardinality: Cardinality,
      by: String,
      at: java.sql.Timestamp): DataFrame = {
    val cur = col(field)
    val appended = cardinality match {
      case Cardinality.List =>
        when(cur.isNull, array(value)).otherwise(concat(cur, array(value)))
      case Cardinality.Set =>
        // array_contains is three-valued: NULL for a null `value`, and
        // NULL when the array holds a null but no match — either way the
        // membership branch silently never matched, so repeated adds
        // accumulated duplicate nulls, violating add-if-absent. Null-safe
        // membership: a null value is "present" iff the set already holds
        // a null; an indeterminate no-match-over-nulls reads as absent.
        val present = coalesce(array_contains(cur, value), lit(false)) ||
          (value.isNull && exists(cur, _.isNull))
        when(cur.isNull, array(value))
          .when(present, cur)
          .otherwise(concat(cur, array(value)))
      case single =>
        throw new IllegalArgumentException(
          s"addValue on '$field': cardinality $single is not multi-valued " +
            "(reference exposes addValue only on Seq/Set properties, TraversalOps.scala:589-593)")
    }
    updateWhere(table, cond, Map(field -> appended), by, at)
  }

  /** Model-aware [[addValueWhere]]: resolves the field's DECLARED
    * cardinality (so callers can't accidentally apply List semantics to a
    * Set property) and rejects unknown fields at plan time. */
  def addValueWhere(
      table: DataFrame,
      cond: Column,
      field: String,
      value: Column,
      model: VertexDef,
      by: String,
      at: java.sql.Timestamp): DataFrame =
    addValueWhere(table, cond, field, value, declaredCardinality(model.fields, model.label, field), by, at)

  /** Remove EVERY occurrence of one value from a multi-valued property of
    * the rows matching `cond` (reference: MultiValueMapping.removeValue
    * removes all matching property values, models/Mapping.scala:152-159,
    * 164-167; TraversalOps.scala:595-599). Same for List and Set (a set
    * holds at most one occurrence). Null arrays pass through as null. */
  def removeValueWhere(
      table: DataFrame,
      cond: Column,
      field: String,
      value: Column,
      by: String,
      at: java.sql.Timestamp): DataFrame =
    updateWhere(table, cond, Map(field -> array_remove(col(field), value)), by, at)

  /** The declared cardinality of a multi-valued field; throws on unknown
    * or single-valued fields, and edge models reject multi-valued
    * properties entirely (reference: Mapping.scala:150-158). */
  private def declaredCardinality(fields: Seq[FieldDef], label: String, field: String): Cardinality =
    fields.find(_.name == field) match {
      case Some(f) => f.cardinality
      case None => throw new IllegalArgumentException(s"model '$label' has no field '$field'")
    }

  /** Delete by predicate (reference: remove = drop().iterate()). Rows where
    * `cond` evaluates to NULL (predicate over a nullable column) did not
    * match the delete and must be KEPT — hence the coalesce: a bare
    * `where(!cond)` would silently drop them (!NULL is NULL). */
  def removeWhere(table: DataFrame, cond: Column): DataFrame =
    table.where(!coalesce(cond, lit(false)))

  /** Delete the rows a traversal selected: anti-join on the id column. */
  def removeIds(table: DataFrame, idCol: String, ids: DataFrame): DataFrame =
    table.alias("__t").join(
      ids.selectExpr(s"$idCol AS __del_id").distinct().alias("__d"),
      col(s"__t.$idCol") === col("__d.__del_id"), "left_anti")

  /** Duplicate-vertex resolution (reference: DedupCheck.resolve +
    * copyEdge, IntegrityCheckOps.scala:403-493): group vertices on the
    * unique-property set, keep the first per group (min of `orderCol`),
    * re-point every edge FK from a duplicate to its keeper, drop the
    * duplicates. Returns (dedupedVertices, mapping dup→keeper). */
  def mergeDuplicates(
      vertices: DataFrame,
      idCol: String,
      keyCols: Seq[String],
      orderCol: String): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(orderCol), col(idCol))
    val ranked = vertices.withColumn("__rn", row_number().over(w))
    val keepers = ranked.where(col("__rn") === 1).drop("__rn")
    val dups = ranked.where(col("__rn") > 1)
    val keeperIds = keepers.select((col(idCol).as("keeper_id") +: keyCols.map(col)): _*)
    val joinCond = keyCols.map(k => dups(k) <=> keeperIds(k)).reduce(_ && _)
    val mapping = dups.join(keeperIds, joinCond)
      .select(dups(idCol).as("dup_id"), col("keeper_id"))
    (keepers, mapping)
  }

  /** Re-point an edge endpoint column through a dup→keeper mapping
    * (reference: copyEdge, IntegrityCheckOps.scala:313-343). */
  def repointEdges(edges: DataFrame, endpointCol: String, mapping: DataFrame): DataFrame =
    edges.alias("__e")
      .join(mapping.alias("__m"), col(s"__e.$endpointCol") === col("__m.dup_id"), "left_outer")
      .withColumn(endpointCol, coalesce(col("__m.keeper_id"), col(s"__e.$endpointCol")))
      .drop("dup_id", "keeper_id")
}
