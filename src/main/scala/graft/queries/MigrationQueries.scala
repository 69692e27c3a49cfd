package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.services.{MigrationOp, Operations}
import graft.sources.TestData
import CoreQueries.Q

/**
 * Schema-migration operation pipeline (reference: models/Operation.scala:
 * 12-131 — ordered AddProperty/UpdateGraph/RemoveProperty/reindex ops).
 * mg01 runs the canonical upgrade against `documents`: add a column with
 * a default, backfill it with a transform, verify the unique key, drop a
 * retired column — the storage-free `transformOf` pipeline, identical to
 * what `Operations.execute` stages through a [[graft.services.MigrationStore]]
 * (the version-ordering and resume semantics are pinned by MigrationSpec).
 */
object MigrationQueries {

  val all: Seq[Q] = Seq(
    Q("mg01_schema_migration",
      (s, dir) => {
        val docs = TestData.graph(s, dir).V("documents").df
        val ops = Operations("graft-test")
          .addProperty("documents", "quality_tier", StringType, lit("unknown"))
          .updateTable("backfill quality_tier from n_chars", "documents")(
            _.withColumn("quality_tier",
              when(col("n_chars") >= 1000, "long")
                .when(col("n_chars") >= 200, "medium")
                .otherwise("short")))
          .checkUnique("documents", "doc_id")
          .removeProperty("documents", "source")
        ops.transformOf("documents")(docs).orderBy("doc_id")
      },
      Some("""SELECT doc_id, text, lang, n_chars,
             |  CASE WHEN n_chars >= 1000 THEN 'long'
             |       WHEN n_chars >= 200 THEN 'medium'
             |       ELSE 'short' END AS quality_tier
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
