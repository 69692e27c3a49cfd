package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Referential-integrity repair strategies — the Spark rendering of the
 * reference's link checkers (reference: services/IntegrityCheckOps.scala:
 * 105-170 SingleLinkChecker, :172-252 MultiLinkChecker, orphan strategies;
 * behavioral spec = the 13 named IntegrityCheckTest cases).
 *
 * Every strategy is a pure table→table rewrite the caller persists; at
 * scale each is one aggregation and/or one join on the entity id / link
 * key — no per-entity iteration (the reference pages through ids in
 * 100-element transactions; here the whole repair is a single plan).
 */
object Integrity {

  /** SingleLinkChecker SET strategy: entities expected to hold exactly one
    * link get their FK column healed from the links table — where exactly
    * ONE link exists and the FK is NULL or disagrees, the FK is set to the
    * link target; entities with zero or multiple links are untouched
    * (those are the orphan / multi cases, handled by their own
    * strategies). `links` has columns (src, dst), src = entity id. */
  def setSingleLink(entities: DataFrame, idCol: String, fkCol: String, links: DataFrame): DataFrame = {
    val single = links.groupBy(col("src")).agg(count(lit(1)).as("__n"), max(col("dst")).as("__target"))
      .where(col("__n") === 1).select(col("src").as("__lid"), col("__target"))
    entities.alias("__e")
      .join(single.alias("__s"), col(s"__e.$idCol") === col("__s.__lid"), "left_outer")
      .withColumn(
        fkCol,
        when(col("__target").isNotNull && !(col(fkCol) <=> col("__target")), col("__target"))
          .otherwise(col(fkCol)))
      .drop("__lid", "__target")
  }

  /** MultiLinkChecker duplicate-link repair (reference
    * removeDuplicateIn/OutEdges, IntegrityCheckOps.scala:289-309):
    * keep-first per duplicate group, return (kept, removed) so the caller
    * can persist the kept set and audit the removals. */
  def splitDuplicateLinks(
      links: DataFrame,
      keyCols: Seq[String],
      orderCol: String): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val ranked = links.withColumn("__rn", row_number().over(w))
    (ranked.where(col("__rn") === 1).drop("__rn"), ranked.where(col("__rn") > 1).drop("__rn"))
  }

  /** Orphan SET strategy: entities with NO link get the given columns
    * rewritten (reference orphan cases that reset/rename a field rather
    * than delete). */
  def setOnOrphans(
      entities: DataFrame,
      idCol: String,
      links: DataFrame,
      sets: Map[String, Column]): DataFrame = {
    val linked = links.select(col("src").as("__lid")).distinct()
    val flagged = entities.alias("__e")
      .join(linked.alias("__l"), col(s"__e.$idCol") === col("__l.__lid"), "left_outer")
    sets.foldLeft(flagged) { case (df, (field, value)) =>
      df.withColumn(field, when(col("__lid").isNull, value).otherwise(col(field)))
    }.drop("__lid")
  }

  /** Orphan REMOVE strategy: drop entities with no link (reference orphan
    * delete cases) — one anti-join on the entity id. */
  def removeOrphans(entities: DataFrame, idCol: String, links: DataFrame): DataFrame =
    entities.alias("__e")
      .join(links.select(col("src").as("__lid")).distinct().alias("__l"),
        col(s"__e.$idCol") === col("__l.__lid"), "left_semi")
}
