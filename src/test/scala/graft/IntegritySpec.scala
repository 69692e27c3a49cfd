package graft

import org.apache.spark.sql.functions._
import graft.model.{Cardinality, EdgeDef, FieldDef, VertexDef}
import graft.services.{Integrity, Mutations}
import org.apache.spark.sql.types._

/** Repair-strategy semantics on small fixtures (the reference proves the
  * same behaviors in IntegrityCheckTest's 13 named cases). */
class IntegritySpec extends SparkSpec {

  import spark.implicits._

  describe("setSingleLink") {
    it("heals null/mismatched FKs only where exactly one link exists") {
      val entities = Seq((1L, Some(10L)), (2L, None), (3L, Some(99L)), (4L, None), (5L, Some(50L)))
        .toDF("id", "fk").select(col("id"), col("fk").cast("long"))
      val links = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (4L, 41L)).toDF("src", "dst")
      val out = Integrity.setSingleLink(entities, "id", "fk", links)
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(out(1L).contains(10L)) // agreed already
      assert(out(2L).contains(20L)) // null healed
      assert(out(3L).contains(30L)) // mismatch healed
      assert(out(4L).isEmpty)       // TWO links → untouched (multi case)
      assert(out(5L).contains(50L)) // no link → untouched (orphan case)
    }
  }

  describe("orphan strategies") {
    it("setOnOrphans rewrites only unlinked entities; removeOrphans drops them") {
      val entities = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      val links = Seq(Tuple1(1L), Tuple1(3L)).toDF("src")
      val set = Integrity.setOnOrphans(entities, "id", links, Map("tag" -> lit("X")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(set == Map(1L -> "a", 2L -> "X", 3L -> "c"))
      val kept = Integrity.removeOrphans(entities, "id", links)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 3L))
    }
  }

  describe("splitDuplicateLinks") {
    it("keeps first per group and returns the removed complement") {
      val links = Seq((1L, 2L, 1), (1L, 2L, 2), (1L, 3L, 1)).toDF("s", "d", "ord")
      val (keptDf, removedDf) = Integrity.splitDuplicateLinks(links, Seq("s", "d"), "ord")
      assert(keptDf.count() == 2 && removedDf.count() == 1)
      assert(removedDf.collect().head.getInt(2) == 2)
    }
  }

  describe("cardinality enforcement on the write path") {
    val vModel = VertexDef("doc", Seq(
      FieldDef("id", LongType),
      FieldDef("tags", StringType, Cardinality.Set),
      FieldDef("notes", StringType, Cardinality.List)))

    it("Set columns are deduplicated by the model-aware create") {
      val rows = Seq((1L, Seq("a", "b", "a"), Seq("x", "x")), (2L, Seq("c", "c"), Seq("y")))
        .toDF("id", "tags", "notes")
      val out = Mutations.create(rows.limit(0), rows, vModel)
        .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1).sorted, r.getSeq[String](2)))).toMap
      assert(out(1L) == ((Seq("a", "b"), Seq("x", "x")))) // Set deduped, List kept verbatim
      assert(out(2L) == ((Seq("c"), Seq("y"))))
    }

    it("edge models reject multi-valued properties at plan time") {
      val eModel = EdgeDef("link", "doc", "doc", Seq(
        FieldDef("kind", StringType),
        FieldDef("tags", StringType, Cardinality.Set)))
      val rows = Seq((1L, 2L, "k", Seq("a"))).toDF("_src", "_dst", "kind", "tags")
      val ex = intercept[IllegalArgumentException] {
        Mutations.create(rows.limit(0), rows, eModel)
      }
      assert(ex.getMessage.contains("multi-valued"))
      // a single-valued edge model passes
      val okModel = EdgeDef("link", "doc", "doc", Seq(FieldDef("kind", StringType)))
      assert(Mutations.create(rows.limit(0), rows, okModel).count() == 1)
    }

    it("addValue honors cardinality: List accumulates, Set is add-if-absent, null becomes [v]") {
      val at = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val rows = Seq(
        (1L, Seq("a", "b")), (2L, Seq("b")), (3L, null)
      ).toDF("id", "vals")
      val asList = Mutations.addValueWhere(rows, lit(true), "vals", lit("b"),
        Cardinality.List, "admin", at)
        .orderBy("id").collect().map(_.getSeq[String](1).toList)
      assert(asList.toList == List(List("a", "b", "b"), List("b", "b"), List("b")))
      val asSet = Mutations.addValueWhere(rows, lit(true), "vals", lit("b"),
        Cardinality.Set, "admin", at)
        .orderBy("id").collect().map(_.getSeq[String](1).toList)
      assert(asSet.toList == List(List("a", "b"), List("b"), List("b")))
      // rows the condition doesn't select pass through untouched
      val cond = Mutations.addValueWhere(rows, col("id") === 1, "vals", lit("z"),
        Cardinality.List, "admin", at)
        .orderBy("id").collect().map(r => Option(r.getSeq[String](1)).map(_.toList).orNull)
      assert(cond.toList == List(List("a", "b", "z"), List("b"), null))
      // single-valued cardinality refuses (the reference only exposes
      // addValue on Seq/Set selectors)
      intercept[IllegalArgumentException] {
        Mutations.addValueWhere(rows, lit(true), "vals", lit("b"),
          Cardinality.Single, "admin", at)
      }
    }

    it("Set addValue is null-safe: a null value adds once and repeated adds stay idempotent") {
      // array_contains is three-valued — NULL for a null probe, NULL when
      // the array holds a null but no match. The naive membership branch
      // never matched on those, so every repeated add appended another
      // null. Pinned here: null joins the set once; a non-null add into a
      // null-holding set still works.
      val at = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val rows = Seq((1L, Seq("a")), (2L, Seq("a", null)), (3L, null))
        .toDF("id", "vals")
      val once = Mutations.addValueWhere(rows, lit(true), "vals",
        lit(null).cast("string"), Cardinality.Set, "admin", at)
      val twice = Mutations.addValueWhere(once, lit(true), "vals",
        lit(null).cast("string"), Cardinality.Set, "admin", at)
        .orderBy("id").collect().map(_.getSeq[String](1).toList)
      assert(twice.toList == List(List("a", null), List("a", null), List(null)))
      // non-null add into a set that already carries a null: indeterminate
      // array_contains must read as ABSENT, not skip the add
      val addB = Mutations.addValueWhere(rows, lit(true), "vals", lit("b"),
        Cardinality.Set, "admin", at)
        .orderBy("id").collect().map(_.getSeq[String](1).toList)
      assert(addB.toList == List(List("a", "b"), List("a", null, "b"), List("b")))
    }

    it("removeValue strips every occurrence; the model-aware overload resolves cardinality") {
      val at = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val rows = Seq((1L, Seq("a", "b", "a")), (2L, Seq("b"))).toDF("id", "vals")
      val removed = Mutations.removeValueWhere(rows, lit(true), "vals", lit("a"), "admin", at)
        .orderBy("id").collect().map(_.getSeq[String](1).toList)
      assert(removed.toList == List(List("b"), List("b")))
      val model = VertexDef("doc", Seq(
        FieldDef("id", LongType), FieldDef("vals", StringType, Cardinality.Set)))
      val viaModel = Mutations.addValueWhere(rows, lit(true), "vals", lit("a"),
        model, "admin", at)
        .orderBy("id").collect().map(_.getSeq[String](1).toList)
      // declared Set cardinality: row 1 already holds "a" (twice — Set
      // semantics never introduce a THIRD), row 2 gains it
      assert(viaModel.toList == List(List("a", "b", "a"), List("b", "a")))
      intercept[IllegalArgumentException] {
        Mutations.addValueWhere(rows, lit(true), "nope", lit("a"), model, "admin", at)
      }
    }

    it("mergeDuplicates driven by the model's declared unique flags") {
      val model = VertexDef("user", Seq(
        FieldDef("email", StringType, unique = true),
        FieldDef("name", StringType)), idField = "id")
      val vertices = Seq(
        (1L, "a@x", "first"), (2L, "a@x", "dup"), (3L, "b@x", "only"))
        .toDF("id", "email", "name")
      val (kept, mapping) = Mutations.mergeDuplicates(vertices, model, "id")
      assert(kept.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      assert(mapping.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(2L -> 1L))
      // no unique flags declared → explicit error, not a silent no-key dedup
      val bare = VertexDef("user", Seq(FieldDef("email", StringType)))
      intercept[IllegalArgumentException] {
        Mutations.mergeDuplicates(vertices, bare, "id")
      }
    }
  }
}
