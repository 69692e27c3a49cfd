package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Source-boundary type conformance — the read-time half of the reference's
 * `Mapping` contract (reference: core/.../models/Mapping.scala:108-145,
 * `toDomain`; models/Model.scala:69-76): every stored value is coerced
 * through a DECLARED graph-type↔domain-type mapping instead of trusting
 * whatever the storage layer hands back.
 *
 * The Spark analog: parquet physical encodings vary by writer — this lake
 * has delivered `events.ts` as int64 nanoseconds, TIMESTAMP(NANOS) (read
 * as LongType under `spark.sql.legacy.parquet.nanosAsLong`), and
 * timezone-less `timestamp[us]` (TIMESTAMP_NTZ to Spark ≥3.4) across
 * writer generations. The engine declares the LOGICAL Spark type per
 * (table, column) here and projects every scan onto it at load, so query
 * code downstream (`unix_millis`, `withWatermark`, window()) always sees
 * one type regardless of which writer produced the file.
 *
 * Scale note: each conformance is a single projection folded into the
 * scan stage (whole-stage codegen'd, no shuffle, no extra pass); at
 * 100 TB it is free relative to the read itself.
 */
object Conform {

  /** The conformance catalog: (table, column) → declared Spark type.
    * Event-time columns MUST be TimestampType — watermarks and the
    * epoch-millis bucket math reject TIMESTAMP_NTZ. */
  val declared: Map[String, Map[String, DataType]] = Map(
    "events" -> Map("ts" -> TimestampType),
    // the vector family's native expressions (DecimalDotProduct) require
    // array<float>: a writer generation emitting list<double> would break
    // every ANN query the same way NTZ broke the time family
    "embeddings" -> Map("embedding" -> ArrayType(FloatType))
  )

  /** Conform one column to TimestampType from any encoding this lake has
    * historically delivered. All engine sessions run with
    * `spark.sql.session.timeZone=UTC`, which makes the NTZ→TIMESTAMP cast
    * lossless (same micros-since-epoch bit pattern). */
  def toTimestamp(df: DataFrame, name: String): DataFrame =
    df.schema.find(_.name == name).map(_.dataType) match {
      case None | Some(TimestampType) => df
      case Some(TimestampNTZType) =>
        df.withColumn(name, col(name).cast(TimestampType))
      case Some(LongType) =>
        // int64 nanoseconds since epoch (the nanosAsLong read of
        // TIMESTAMP(NANOS) as well as raw-long writers): floor to micros
        df.withColumn(name, timestamp_micros(expr(s"`$name` div 1000")))
      case Some(other) =>
        throw new IllegalArgumentException(
          s"cannot conform column `$name`: $other to TIMESTAMP — " +
            "declare a conversion in graft.model.Conform")
    }

  private def toDeclared(df: DataFrame, name: String, target: DataType): DataFrame =
    target match {
      case TimestampType => toTimestamp(df, name)
      case t =>
        df.schema.find(_.name == name).map(_.dataType) match {
          case None | Some(`t`) => df
          case Some(_) => df.withColumn(name, col(name).cast(t))
        }
    }

  /** Project `df` onto the declared types for `table` (no-op for tables
    * and columns with no declaration). Works on batch AND streaming
    * DataFrames — a `withColumn` cast preserves streaming-ness. */
  def apply(table: String, df: DataFrame): DataFrame =
    declared.getOrElse(table, Map.empty).foldLeft(df) {
      case (acc, (name, target)) => toDeclared(acc, name, target)
    }
}
