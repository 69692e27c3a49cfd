package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Content-defined chunking (d24/d25) invariants.
  *
  * The fold in `TextIndex.chunksOf` must PARTITION the token stream:
  * re-joining the chunks with single spaces reconstructs the input text
  * exactly, for any text — including empty tokens from repeated spaces,
  * punctuation, and texts whose final token is/isn't a boundary. A
  * violation would silently drop or duplicate corpus content in the
  * dedup statistics.
  */
class ChunkingSpec extends SparkSpec {
  import graft.sources.TextIndex

  private def chunksFor(texts: Seq[String]): Seq[(String, Seq[String])] = {
    import spark.implicits._
    texts.toDF("text")
      .select(col("text"), TextIndex.chunksOf("text").as("chunks"))
      .as[(String, Seq[String])].collect().toSeq
  }

  describe("content-defined chunking") {
    it("chunks partition the token stream: join(chunks, ' ') == text") {
      val texts = Seq(
        "the quick brown fox jumps over the lazy dog",
        "a", "", "  ", "one  two   three",
        ("x " * 200).trim,
        Seq.tabulate(64)(i => s"tok$i").mkString(" "))
      chunksFor(texts).foreach { case (text, chunks) =>
        assert(chunks.nonEmpty)
        assert(chunks.mkString(" ") === text)
      }
    }

    it("holds for arbitrary generated texts (property)") {
      val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("the"))
      val textGen = Gen.listOfN(30, word).map(_.mkString(" "))
      val texts = (0 until 100).flatMap(i =>
        textGen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
      assert(texts.size >= 90) // the generator must actually produce cases
      chunksFor(texts).foreach { case (t, chunks) =>
        assert(chunks.mkString(" ") === t)
      }
    }

    it("boundaries are content-defined: a prefix insertion re-aligns after the next cut") {
      // append-only change upstream of a boundary must leave the suffix
      // chunks identical — the CDC property fixed-size splitting lacks
      val base = Seq.tabulate(80)(i => s"w$i").mkString(" ")
      val shifted = "INSERTED " + base
      val Seq((_, c1), (_, c2)) = chunksFor(Seq(base, shifted)).sortBy(_._1.length)
      // all base chunks after the first boundary survive in the shifted text
      val common = c1.toSet.intersect(c2.toSet)
      assert(common.size >= c1.size - 1, s"expected suffix chunks to re-align: $c1 vs $c2")
    }
  }
}
