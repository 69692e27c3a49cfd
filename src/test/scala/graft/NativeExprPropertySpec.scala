package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property test for the native decimal dot product: on randomly generated
 * float vectors (mixed magnitudes, negative zero, subnormals, null
 * elements) the compiled expression must equal an independent driver-side
 * model of the oracle's arithmetic — DuckDB's double→DECIMAL(·,12) cast,
 * i.e. `nearbyint(v·1e12)` on the binary-scaled double converted exactly
 * to decimal (validated 0/100k vs DuckDB incl. ties and >2^53 scales) —
 * and exact decimal summation. NOT compared against Spark's declarative
 * `aggregate(zip_with(CAST …))` form: Spark's cast rounds HALF_UP and
 * legitimately diverges from the oracle at representation ties. All 200
 * generated pairs are evaluated in ONE Spark job (each pair a row), not
 * one job per case.
 */
class NativeExprPropertySpec extends SparkSpec {

  private val finiteFloat: Gen[Float] = Gen.oneOf(
    Gen.choose(-1e6f, 1e6f),
    Gen.choose(-1f, 1f),
    Gen.oneOf(0f, -0f, 1.4e-45f, -1.4e-45f, 3.1415927f, -2.5f, 1e-20f))
    .flatMap(g => g)

  private val elem: Gen[Option[Float]] =
    Gen.frequency(9 -> finiteFloat.map(Some(_)), 1 -> Gen.const(None))

  private val pair: Gen[(Seq[Option[Float]], Seq[Option[Float]])] = for {
    n <- Gen.choose(0, 96)
    x <- Gen.listOfN(n, elem)
    y <- Gen.listOfN(n, elem)
  } yield (x, y)

  // independent model of the oracle arithmetic: Math.rint on the
  // 1e12-scaled double (DuckDB's nearbyint), exact binary→decimal
  // conversion, exact decimal sum
  private def model(x: Seq[Option[Float]], y: Seq[Option[Float]]): Option[Double] = {
    import java.math.{BigDecimal => JBD}
    val n = math.min(x.length, y.length)
    var acc = JBD.ZERO
    var i = 0
    while (i < n) {
      (x(i), y(i)) match {
        case (Some(a), Some(b)) =>
          acc = acc.add(new JBD(Math.rint(a.toDouble * b.toDouble * 1e12)).movePointLeft(12))
        case _ => return None
      }
      i += 1
    }
    Some(acc.doubleValue())
  }

  it("DecimalDotProduct equals the oracle-arithmetic model on 200 random vectors") {
    import spark.implicits._
    val cases = Gen.listOfN(200, pair)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    val df = cases.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val got = df.select(
      col("id"),
      GraftBridge.column(graft.functions.DecimalDotProduct(
        GraftBridge.expression(col("x")), GraftBridge.expression(col("y")))).as("native"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    cases.zipWithIndex.foreach { case ((x, y), i) =>
      assert(got(i.toLong) == model(x, y), s"case $i")
    }
  }

  it("fast long-path accumulation equals the exact decimal loop across magnitude regimes") {
    // r15: compute() sums the 1e12-scaled integral terms in a long and
    // falls back to the all-BigDecimal loop when a term leaves the exact
    // long range or the accumulator would overflow. This property drives
    // both paths: element magnitudes up to ~4000 put single products
    // (×1e12) on either side of 2^63, and long vectors of large values
    // force accumulator overflow mid-sum. The model is the r14
    // implementation verbatim.
    import java.math.{BigDecimal => JBD}
    def model(x: Seq[Float], y: Seq[Float]): Double = {
      var acc = JBD.ZERO
      x.zip(y).foreach { case (a, b) =>
        acc = acc.add(new JBD(graft.functions.DecimalDotProduct.duckRound(
          a.toDouble * b.toDouble * 1e12)).movePointLeft(12))
      }
      acc.doubleValue()
    }
    val gen = for {
      n <- Gen.choose(1, 96)
      scale <- Gen.oneOf(1f, 100f, 3000f, 4000f)
      x <- Gen.listOfN(n, Gen.choose(-scale, scale))
      y <- Gen.listOfN(n, Gen.choose(-scale, scale))
    } yield (x, y)
    val cases = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator exhausted")) ++ Seq(
      // deterministic boundary cases: products straddling 2^63/1e12≈9.22e6
      (List(3037000.5f, -3037000.5f), List(3037000.4f, 3037000.6f)),
      // accumulator overflow: 96 terms each ≈ 8.9e18 scaled
      (List.fill(96)(2985000f), List.fill(96)(2985000f)))
    import org.apache.spark.sql.catalyst.util.ArrayData
    val expr = graft.functions.DecimalDotProduct(
      GraftBridge.expression(lit(1)), GraftBridge.expression(lit(1)))
    cases.zipWithIndex.foreach { case ((x, y), i) =>
      val got = expr.compute(ArrayData.toArrayData(x.toArray), ArrayData.toArrayData(y.toArray))
      assert(got == model(x, y), s"case $i")
    }
  }

  it("rounds representation ties like the DuckDB oracle cast") {
    import spark.implicits._
    // this float pair's double product has shortest repr 0.4318219756885 —
    // a tie at 12 fractional digits. Probed DuckDB answer: …688; Spark's
    // own double→decimal Cast would emit …689 (half-up on the shortest
    // repr), which is exactly the divergence this expression exists to
    // avoid.
    val df = Seq((Seq(0.5898358225822449f), Seq(0.7321053743362427f))).toDF("x", "y")
    val got = df.select(
      GraftBridge.column(graft.functions.DecimalDotProduct(
        GraftBridge.expression(col("x")), GraftBridge.expression(col("y")))).as("d"))
      .collect().head.getDouble(0)
    assert(got == 0.431821975688)
  }

  it("quantizes on the binary-scaled double, not the shortest decimal repr") {
    import spark.implicits._
    // Each product's SHORTEST repr ends …5 at digit 13, but the binary
    // double scaled by 1e12 sits on the other side of the half — DuckDB
    // (nearbyint on the scaled double) disagrees with half-even-on-
    // shortest-repr here. Probed DuckDB answers: 0.260854279887,
    // 0.186223201842, 0.501032347701 (shortest-repr half-even would give
    // …888 / …841 / …702).
    val cases = Seq(
      (Seq(0.5296157598495483f), Seq(0.49253496527671814f), 0.260854279887),
      (Seq(0.5288658738136292f), Seq(0.35211801528930664f), 0.186223201842),
      (Seq(0.8280673623085022f), Seq(0.6050623059272766f), 0.501032347701))
    val df = cases.map { case (x, y, _) => (x, y) }.toDF("x", "y")
    val got = df.select(
      GraftBridge.column(graft.functions.DecimalDotProduct(
        GraftBridge.expression(col("x")), GraftBridge.expression(col("y")))).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == cases.map(_._3))
  }

  it("DuckDecimalToDouble matches the measured hugeint golden file bit-for-bit") {
    // duck_decimal38_12_to_double.csv: 2556 (unscaled, double-bits) pairs
    // measured through DuckDB's parquet vectorized path (tools note: the
    // VALUES / constant-fold paths behave differently and must not be
    // used) — ±int128 values spanning 2^50..10^38−1, every 2^k±3
    // boundary for k in {53,54,62,63,64,65,70,80,100,120,126}, and
    // e06b's live sf10 sum 24213004132582506019, whose >2^63 magnitude
    // the pre-round-8 model refused. Asserts the split-combine model
    // (double(lower) + double(upper)·2^64) reproduces every bit.
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/duck_decimal38_12_to_double.csv"))
    val rows = try src.getLines().drop(1).map { line =>
      val Array(u, b) = line.split(','); (BigInt(u), b.toLong)
    }.toVector finally src.close()
    assert(rows.size == 2556)
    val bad = rows.filterNot { case (unscaled, bits) =>
      val dec = org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(unscaled.bigInteger, 12), 38, 12)
      java.lang.Double.doubleToLongBits(
        graft.functions.DuckDecimalToDouble.compute(dec, 12)) == bits
    }
    assert(bad.isEmpty, s"${bad.size} mismatches, first: ${bad.take(3)}")
  }

  // contract scope: ≥1 non-null hash per row — the engine only signs
  // shingle arrays of filtered documents (≥3 tokens), and on an empty /
  // all-null array the declarative array_min yields null where the native
  // form yields the MaxValue sentinel
  private val hashElem: Gen[Option[Long]] =
    Gen.frequency(9 -> Gen.choose(0L, 4294967295L).map(Some(_)), 1 -> Gen.const(None))

  private val hashArray: Gen[Seq[Option[Long]]] = for {
    n <- Gen.choose(0, 60)
    xs <- Gen.listOfN(n, hashElem)
    pinned <- Gen.choose(0L, 4294967295L)
  } yield Some(pinned) +: xs

  it("CodebookArgmin equals the r15 array_min-over-structs composition (ties, null slots, null/short vectors)") {
    // r16: the native argmin must pick EXACTLY the entry the struct-array
    // form picks — same decimal-dot score, Spark's struct ordering
    // (nulls-first score, then ascending id). The generator engineers the
    // hard cases: duplicated codebook entries (exact score ties → id
    // tie-break), null elements inside the used slice (null score sorts
    // FIRST), whole-null vectors (every score null → smallest id), and
    // vectors shorter than the slice offset (empty slice → dot 0.0).
    // Mixed cvec lengths exercise PER-ENTRY nullness.
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import graft.sources.AnnIndex.dotNativeC
    val rnd = new scala.util.Random(20260818L)
    def smallVec(n: Int): IndexedSeq[Float] =
      IndexedSeq.fill(n)((rnd.nextInt(17) - 8).toFloat)
    for (kind <- Seq("l2", "cos"); offset <- Seq(0, 3)) {
      val dim = 6
      val base = IndexedSeq.tabulate(4)(_ => smallVec(dim))
      // ids 0..6 ascending; entries 4 and 5 DUPLICATE entries 0 and 2
      // (exact ties for every input); entry 6 is SHORTER (len 3)
      val vecs = base ++ IndexedSeq(base(0), base(2), smallVec(3))
      val cents = vecs.zipWithIndex.map { case (v, i) =>
        val norm = if (kind == "cos") rnd.nextInt(5) + 1.0 else (rnd.nextInt(9) - 4).toDouble
        (i.toLong, v, norm)
      }
      val oldCol = array_min(array(cents.map { case (id, cvec, n2) =>
        val dot = dotNativeC(
          expr(s"slice(v, $offset + 1, ${cvec.length})"),
          array(cvec.map(lit): _*))
        val score = if (kind == "l2") lit(-2d) * dot + lit(n2) else -(dot / lit(n2))
        struct(score.as("s"), lit(id).as("id"))
      }: _*)).getField("id")
      val newCol = GraftBridge.column(graft.functions.CodebookArgmin(
        GraftBridge.expression(col("v")),
        cents.map(_._1), cents.map(_._2), cents.map(_._3),
        kind = kind, offset = offset, intOut = false))
      val inputs: Seq[Seq[Option[Float]]] =
        (1 to 60).map(_ => (0 until rnd.nextInt(12)).map(_ => Some((rnd.nextInt(17) - 8).toFloat))) ++
        (1 to 20).map(_ => (0 until 9).map(i =>
          if (rnd.nextInt(4) == 0) None else Some((rnd.nextInt(17) - 8).toFloat))) ++
        Seq(Seq.empty, Seq(Some(1f)), Seq.fill(9)(None))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(inputs.map(v =>
          org.apache.spark.sql.Row(v.map(_.map(Float.box).orNull))), 2),
        org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField(
          "v", org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true), true))))
      val rows = df.select(oldCol.as("old"), newCol.as("nw"), col("v")).collect()
      rows.foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"kind=$kind off=$offset v=${r.get(2)}: old=${r.get(0)} new=${r.get(1)}")
      }
      // null INPUT ARRAY: the struct form nulls every score; both pick id 0
      val nullRow = df.sparkSession.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS v")
        .select(oldCol.as("old"), newCol.as("nw")).collect()(0)
      assert(nullRow.getLong(0) == 0L && nullRow.getLong(1) == 0L, nullRow.toString)
      // and the interpreted (no-codegen) eval path agrees
      val ad: ArrayData = new GenericArrayData(Array[Any](1.0f, null, 2.0f))
      val e = graft.functions.CodebookArgmin(GraftBridge.expression(col("v")),
        cents.map(_._1), cents.map(_._2), cents.map(_._3), kind, offset, intOut = false)
      assert(e.compute(null) == 0L)
      assert(e.compute(ad) == e.compute(ad)) // deterministic
    }
  }

  it("DistinctTokenNgrams equals array_distinct(transform(concat…)) on 200 random token arrays") {
    // r16: the native one-pass distinct n-gram build must keep the
    // declarative composition's exact semantics — first-occurrence order,
    // byte-equality dedup, a NULL element at the first null-touching
    // window, empty for short inputs. Small vocab + repeated tokens force
    // real duplicate shingles; nulls and empty strings included.
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val vocab = IndexedSeq("a", "bb", "", "dd d", "e")
    for (n <- Seq(2, 3)) {
      val inputs: Seq[Seq[String]] = (1 to 200).map { _ =>
        (0 until (n + rnd.nextInt(12))).map { _ =>
          if (rnd.nextInt(12) == 0) null else vocab(rnd.nextInt(vocab.length))
        }
      }
      val df = inputs.toDF("toks").where(size(col("toks")) >= n)
      val concatArgs = (0 until n).map(w => s"element_at(toks, i + $w)")
        .mkString(", ' ', ")
      val oldCol = expr(
        s"array_distinct(transform(sequence(1, size(toks) - ${n - 1}), i -> concat($concatArgs)))")
      val newCol = GraftBridge.column(graft.functions.DistinctTokenNgrams(
        GraftBridge.expression(col("toks")), n))
      df.select(oldCol.as("old"), newCol.as("nw")).collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n: $r")
      }
    }
  }

  it("BandKeys equals the slice/concat_ws/md5/substring composition on 200 random signatures") {
    // r16: the native band-key pass must be bit-equal to the declarative
    // chain it replaces — Long.toString rendering, concat_ws null-skip,
    // short/empty slices hashing "", first-16-hex truncation. Random
    // signatures include short arrays (partial last band), null slots,
    // negative longs, and a null signature column (concat_ws of a null
    // array arg is "", so both forms yield md5("")-keys, not null).
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val b = 4; val r = 3
    val inputs: Seq[Seq[Option[Long]]] =
      (1 to 200).map { _ =>
        (0 until rnd.nextInt(b * r + 3)).map(_ =>
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextLong()))
      } :+ Seq.empty
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(v =>
        org.apache.spark.sql.Row(v.map(_.map(Long.box).orNull))), 2),
      org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField(
        "sig", org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, true), true))))
    val oldCol = array((0 until b).map { j =>
      substring(md5(concat_ws(",", slice(col("sig"), j * r + 1, r).cast("array<string>"))
        .cast("binary")), 1, 16)
    }: _*)
    val newCol = GraftBridge.column(graft.functions.BandKeys(
      GraftBridge.expression(col("sig")), b, r))
    df.select(oldCol.as("old"), newCol.as("nw"), col("sig")).collect().foreach { row =>
      assert(row.getSeq[String](0) == row.getSeq[String](1), row.toString)
    }
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS sig")
      .select(oldCol.as("old"), newCol.as("nw")).collect()(0)
    assert(nullRow.getSeq[String](0) == nullRow.getSeq[String](1), nullRow.toString)
  }

  it("NormalizedPrefix equals the regex normalize+truncate chain on 400 adversarial strings") {
    // r16: the early-exit scan must match substring(lower(rr(rr(text,
    // '[^A-Za-z0-9 ]', ''), ' +', ' ')), 1, n) byte-for-byte — space
    // runs merged ACROSS removed chars, leading/trailing/only-space
    // collapse, the n-char cap interacting with a pending space, full
    // Unicode removal, and null. Generator biases toward spaces,
    // punctuation and multibyte codepoints around the 64-char boundary.
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val alphabet = "aB3 ..  !?—é漢 \t😀zQ 9"
    val inputs: Seq[String] =
      (1 to 400).map { _ =>
        val len = rnd.nextInt(160)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      } ++ Seq("", " ", "   ", "ab ", " ab", "a.b", "a . b", "a" * 63 + " x",
        "a" * 63 + "  x", "a" * 64 + " tail ignored", ". . .", "——", "x")
    for (n <- Seq(5, 64)) {
      val oldCol = substring(lower(regexp_replace(
        regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), " +", " ")), 1, n)
      val newCol = GraftBridge.column(graft.functions.NormalizedPrefix(
        GraftBridge.expression(col("text")), n))
      inputs.toDF("text").select(oldCol.as("old"), newCol.as("nw"), col("text"))
        .collect().foreach { r =>
          assert(r.getString(0) == r.getString(1),
            s"n=$n text=${r.getString(2).take(80)}: old=[${r.getString(0)}] new=[${r.getString(1)}]")
        }
      val nullRow = spark.sql("SELECT CAST(NULL AS STRING) AS text")
        .select(oldCol.as("old"), newCol.as("nw")).collect()(0)
      assert(nullRow.isNullAt(0) && nullRow.isNullAt(1), nullRow.toString)
    }
  }

  it("MinHashSignature equals K independent transform+array_min columns on 200 random hash arrays") {
    import spark.implicits._
    val P = 4294967311L
    val as = Seq(3L, 1048573L, 7919L, 536870909L, 2L, 104729L, 15485863L, 999983L)
    val bs = Seq(11L, 99991L, 0L, 4294967295L, 1L, 7L, 123456789L, 31L)
    val cases = Gen.listOfN(200, hashArray)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator exhausted"))
    val df = cases.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }.toDF("id", "hs")
    val both = df.select(
      col("id"),
      GraftBridge.column(graft.functions.MinHashSignature(
        GraftBridge.expression(col("hs")), as, bs, P)).as("native"),
      array(as.zip(bs).map { case (a, b) =>
        array_min(transform(col("hs"), h => (h * lit(a) + lit(b)) % lit(P)))
      }: _*).as("declarative"))
    val diverging = both.where(!(col("native") <=> col("declarative"))).collect()
    assert(diverging.isEmpty, diverging.take(5).mkString("\n"))
  }

  it("SimHash equals an independent sign-counting model on 200 random hash arrays") {
    import spark.implicits._
    val NBits = 48
    // independent reference: straightforward driver-side sign counting
    // with the same null-skip and counts>0 packing contract
    def model(hs: Seq[Option[Long]]): Long = {
      val counts = Array.fill(NBits)(0)
      hs.foreach(_.foreach { h =>
        (0 until NBits).foreach(j => if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1)
      })
      (0 until NBits).foldLeft(0L)((acc, j) => if (counts(j) > 0) acc | (1L << j) else acc)
    }
    val cases = Gen.listOfN(200, hashArray)
      .apply(Gen.Parameters.default, Seed(99L))
      .getOrElse(fail("generator exhausted"))
    val df = cases.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }.toDF("id", "hs")
    val got = df.select(
      col("id"),
      GraftBridge.column(graft.functions.SimHash(
        GraftBridge.expression(col("hs")), NBits)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (hs, i) =>
      assert(got(i.toLong) == model(hs), s"case $i: $hs")
    }
  }

  it("WindowMd5Hashes equals the declarative slice/array_join/md5 transform on 200 random token arrays") {
    import spark.implicits._
    val W = 4
    val token: Gen[Option[String]] = Gen.frequency(
      8 -> Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(cs => Some(cs.mkString))),
      1 -> Gen.oneOf("", "日本", "a b", "naïve").map(Option(_)),
      1 -> Gen.const(None))
    val tokArray: Gen[Seq[Option[String]]] =
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, token))
    val cases = Gen.listOfN(200, tokArray)
      .apply(Gen.Parameters.default, Seed(41L))
      .getOrElse(fail("generator exhausted"))
    val df = cases.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toDF("id", "toks")
    val both = df.select(
      col("id"),
      GraftBridge.column(graft.functions.WindowMd5Hashes(
        GraftBridge.expression(col("toks")), W)).as("native"),
      expr(s"""CASE WHEN size(toks) >= $W THEN
             |  transform(sequence(1, size(toks) - ${W - 1}),
             |    i -> md5(CAST(array_join(slice(toks, i, $W), ' ') AS BINARY)))
             |ELSE array() END""".stripMargin).as("declarative"))
    val diverging = both.where(!(col("native") <=> col("declarative"))).collect()
    assert(diverging.isEmpty, diverging.take(5).mkString("\n"))
  }
}
