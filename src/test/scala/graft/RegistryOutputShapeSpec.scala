package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/**
 * Driver-harness output-shape gate: the driver's correctness compare
 * (tools/check.py / the round harness) materializes both sides with
 * pandas and SORTS ROWS BEFORE HASHING — an array- or map-typed output
 * column arrives as an ndarray/dict cell that pandas can neither sort
 * nor hash (`TypeError: unhashable type: 'numpy.ndarray'`), so the query
 * silently loses its green gate row (round 10's s14 was red for exactly
 * this, while every builder-side check — which ordered by key instead of
 * sorting — stayed green). Contract pinned here: EVERY registered
 * query's output schema is free of ArrayType/MapType at any nesting
 * depth. Collection-shaped results stringify (d08's comma-joined
 * signature) or flatten to scalar columns (s14's c00..c15).
 *
 * Schema-only: `fn(spark, dir)` is invoked for its DataFrame, never
 * collected. Batch plans stay lazy; the handful of streaming entries
 * execute their replay (they do under the driver gate too), which keeps
 * this spec honest for the very family that regressed.
 */
class RegistryOutputShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def offenders(dt: DataType, path: String): Seq[String] = dt match {
    case ArrayType(et, _)  => Seq(s"$path: array") ++ offenders(et, s"$path[]")
    case MapType(k, v, _)  => Seq(s"$path: map") ++ offenders(k, s"$path.key") ++ offenders(v, s"$path.value")
    case st: StructType    => st.fields.flatMap(f => offenders(f.dataType, s"$path.${f.name}"))
    case _                 => Nil
  }

  describe("registry output schemas") {
    it("contain no ArrayType/MapType column at any depth (driver sort-then-hash constraint)") {
      val bad = SparkEntry.registry.flatMap { q =>
        val hits = q.fn(spark, sfDir).schema.fields
          .flatMap(f => offenders(f.dataType, f.name))
        if (hits.isEmpty) Nil else Seq(s"${q.name} -> ${hits.mkString("; ")}")
      }
      assert(bad.isEmpty,
        s"array/map-typed output columns break the driver's pandas sort-then-hash:\n  ${bad.mkString("\n  ")}")
    }
  }
}
