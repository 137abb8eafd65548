package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.HashKernels

/** Property laws for the native sketch kernels — pure JVM, no Spark
  * session, so thousands of cases run in milliseconds. */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)
  private def farr(xs: Seq[Float]) =
    new GenericArrayData(xs.toArray.map(x => x: Any))
  private def farrD(xs: Seq[Double]) =
    new GenericArrayData(xs.toArray.map(x => x: Any))

  test("sortedJaccard equals classic set Jaccard on random long sets") {
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    check(forAll(gen) { case (a, b) =>
      val expected =
        if (a.isEmpty && b.isEmpty) 0.0
        else {
          val sa = a.toSet; val sb = b.toSet
          sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
        }
      math.abs(HashKernels.sortedJaccard(arr(a), arr(b)) - expected) < 1e-12
    })
  }

  test("tokenCount equals size(split(trim, \\s+)) on arbitrary strings") {
    val wsChars = Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')
    val gen = Gen.listOf(Gen.frequency(
      3 -> Gen.alphaNumChar, 1 -> wsChars)).map(_.mkString)
    check(forAll(gen) { s =>
      val expected = s.trim.split("\\s+").length
      graft.plans.TextKernels.tokenCount(UTF8String.fromString(s)) == expected
    })
  }

  test("deflatedSize: total, deterministic, and orders repetition " +
      "below entropy; SQL registration works") {
    import graft.plans.TextKernels
    // total + deterministic on arbitrary strings — the generator MIXES
    // multi-byte UTF-8 runs (CJK, combining marks, astral emoji) into
    // ASCII so the numBytes≠numChars path is actually exercised
    val gen = Gen.listOf(Gen.frequency(
      3 -> Gen.asciiPrintableStr,
      1 -> Gen.oneOf("中文テキスト", "héllo wörld", "😀🎉🚀",
        "éé", "مرحبا", "Ω≈ç√∫"))).map(_.mkString)
    check(forAll(gen) { s =>
      val u = UTF8String.fromString(s)
      val a = TextKernels.deflatedSize(u)
      a >= 0 && a == TextKernels.deflatedSize(u)
    })
    // a repeated phrase compresses far below a same-length
    // hash-chain string (the signal the quality gate keys on)
    val rep = UTF8String.fromString("the quick brown fox " * 200)
    val noise = UTF8String.fromString(
      (0 until 200).map(i => java.util.UUID.nameUUIDFromBytes(
        Array(i.toByte)).toString.replace("-", "")).mkString.take(4000))
    val repSz = TextKernels.deflatedSize(rep)
    val noiseSz = TextKernels.deflatedSize(noise)
    assert(rep.numBytes == 4000 && noise.numBytes == 4000)
    assert(repSz * 10 < noiseSz,
      s"repetition ($repSz) should compress far below entropy ($noiseSz)")
    // SQL path ≡ kernel
    val spark = SparkTestSession.spark
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT deflated_size('aaaaaaaaaaaaaaaaaaaa')")
      .head().getInt(0) ==
      TextKernels.deflatedSize(UTF8String.fromString("a" * 20)))
  }

  test("unicodeNormalize: agrees with UAX#15, idempotent, fast paths " +
      "return the input instance; NFKC folds what NFC preserves; SQL " +
      "registration + literal-form validation") {
    import graft.plans.TextKernels
    val NFC = java.text.Normalizer.Form.NFC
    val NFKC = java.text.Normalizer.Form.NFKC
    def nfc(s: String): String =
      TextKernels.unicodeNormalize(UTF8String.fromString(s), NFC).toString
    def nfkc(s: String): String =
      TextKernels.unicodeNormalize(UTF8String.fromString(s), NFKC).toString
    // mixed ASCII + decomposed/composed/astral runs: agree with the
    // JDK normalizer and be idempotent (UAX#15 guarantees NFC(NFC(x))
    // = NFC(x); the kernel's fast paths must not break it)
    val gen = Gen.listOf(Gen.frequency(
      3 -> Gen.asciiPrintableStr,
      1 -> Gen.oneOf("café", "Å", "각",
        "Ω", "ö", "😀", "café"))).map(_.mkString)
    check(forAll(gen) { s =>
      val out = nfc(s)
      out == java.text.Normalizer.normalize(s, NFC) && nfc(out) == out
    })
    // ASCII fast path: the INPUT UTF8String comes back (no decode, no
    // copy) — this is the 100 TB common path
    val a = UTF8String.fromString("plain ascii only")
    assert(TextKernels.unicodeNormalize(a, NFC) eq a)
    // already-normalized non-ASCII: quick-check path, same instance
    val c = UTF8String.fromString("café")
    assert(TextKernels.unicodeNormalize(c, NFC) eq c)
    // canonical-equivalence witnesses (the q_text_unicode_norm plants)
    assert(nfc("café") == "café")
    assert(nfc("Å") == "Å")          // angstrom sign → Å
    assert(nfc("각") == "각") // jamo → hangul syllable
    assert(nfc("Ω") == "Ω")          // ohm sign → omega
    // compatibility forms: NFC preserves, NFKC folds
    assert(nfc("ﬁle") == "ﬁle")
    assert(nfkc("ﬁle Ａ 2²") == "file A 22")
    // SQL path ≡ kernel; the form parameter must be a literal from
    // the UAX#15 set
    val spark = SparkTestSession.spark
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT unicode_normalize('café')")
      .head().getString(0) == "café")
    assert(spark.sql("SELECT unicode_normalize('ﬁle', 'NFKC')")
      .head().getString(0) == "file")
    intercept[Exception](
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect())
  }

  test("fixMojibake: inverts cp1252 mojibake, fixpoints double-encoding, " +
      "never touches legitimate text; ASCII fast path returns the input " +
      "instance; SQL registration") {
    import graft.plans.TextKernels
    def fix(s: String): String =
      TextKernels.fixMojibake(UTF8String.fromString(s)).toString
    // single-encoded: é, ’ (0x80-0x9F punctuation block), ü, …
    assert(fix("cafÃ©") == "café")
    assert(fix("donâ€™t") == "don’t")
    assert(fix("Ã¼ber") == "über")
    assert(fix("â€¦end") == "…end")
    // double-encoded é needs two fixpoint rounds
    assert(fix("ÃƒÂ©") == "é")
    // conservative: legitimate precomposed text is NOT valid UTF-8
    // after the cp1252 round-trip → untouched
    assert(fix("café") == "café")
    assert(fix("café Ã©") == "café Ã©") // mixed damage: no partial fix
    // not cp1252-encodable → untouched (CJK, emoji)
    assert(fix("日本語") == "日本語")
    assert(fix("ok 😀") == "ok 😀")
    // ASCII fast path: the input instance comes back unallocated
    val a = UTF8String.fromString("plain ascii")
    assert(TextKernels.fixMojibake(a) eq a)
    // property: generic text round-trips through corruption — corrupt
    // any cp1252-representable repair target by the inverse map, the
    // kernel must invert it; and fixing is idempotent
    // space-joined so non-ASCII chars stay isolated: adjacent repaired
    // chars can form byte runs that legitimately re-decode as UTF-8
    // ("é……" IS byte-identical to mojibake of a CJK char) — that
    // ambiguity is inherent to encoding repair, not a kernel defect
    val gen = Gen.listOf(Gen.frequency(
      4 -> Gen.asciiPrintableStr,
      1 -> Gen.oneOf("é", "ü", "’", "…", "Ω"))).map(_.mkString(" "))
    check(forAll(gen) { s =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val corrupted = new String(bytes,
        java.nio.charset.Charset.forName("windows-1252"))
      // skip strings whose UTF-8 bytes hit cp1252's five unmapped
      // holes (0x81/8D/8F/90/9D → U+FFFD on decode): a real cp1252
      // reader couldn't have produced that mojibake either
      corrupted.contains('�') ||
        (fix(corrupted) == s && fix(fix(corrupted)) == fix(corrupted))
    })
    val spark = SparkTestSession.spark
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT fix_mojibake('caf' || chr(195) || chr(169))")
      .head().getString(0) == "café")
  }

  test("scriptCounts: per-script letter counts, ASCII fast path, " +
      "marks/digits/punct excluded; SQL registration") {
    import graft.plans.TextKernels
    def counts(s: String): Seq[Long] = {
      val r = TextKernels.scriptCounts(UTF8String.fromString(s))
      (0 until 8).map(r.getLong)
    }
    // (n_letters, latin, cyrillic, greek, arabic, han, hangul, other)
    assert(counts("Hello, 42!") == Seq(5L, 5L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(counts("привет Hi") == Seq(8L, 2L, 6L, 0L, 0L, 0L, 0L, 0L))
    assert(counts("αβγ 中文 한") == Seq(6L, 0L, 0L, 3L, 0L, 2L, 1L, 0L))
    assert(counts("مرحبا") == Seq(5L, 0L, 0L, 0L, 5L, 0L, 0L, 0L))
    // Devanagari letters land in 'other'; the combining mark (Mn, not
    // a letter) and the decomposed U+0301 are excluded entirely
    assert(counts("नमस्ते") == Seq(4L, 0L, 0L, 0L, 0L, 0L, 0L, 4L))
    assert(counts("é") == Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(counts("  12 --") == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    val spark = SparkTestSession.spark
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT script_counts('привет Hi').cyrillic")
      .head().getLong(0) == 6L)
  }

  test("winnowFingerprints: rolling hashes equal the per-window " +
      "definition; shared-substring guarantee; degenerate inputs; SQL " +
      "registration") {
    import graft.plans.TextKernels
    val M = 1000000007L
    def windowHash(cps: Array[Int], from: Int, w: Int): Long = {
      var h = 0L
      for (i <- from until from + w) h = (h * 257 + cps(i)) % M
      h
    }
    // the definitional recompute the oracle also uses
    def naive(s: String, w: Int, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.isEmpty) return Seq.empty
      if (cps.length < w) return Seq(windowHash(cps, 0, cps.length))
      val hs = (0 to cps.length - w).map(windowHash(cps, _, w))
      if (hs.length < k) Seq(hs.min)
      else hs.sliding(k).map(_.min).toSeq.distinct.sorted
    }
    def kernel(s: String, w: Int, k: Int): Seq[Long] =
      TextKernels.winnowFingerprints(UTF8String.fromString(s), w, k)
        .toLongArray().toSeq
    check(forAll(Gen.asciiPrintableStr, Gen.choose(1, 12),
        Gen.choose(1, 6)) { (s, w, k) =>
      kernel(s, w, k) == naive(s, w, k)
    })
    // winnowing guarantee: a shared run of ≥ w+k−1 codepoints yields
    // at least one common pick in BOTH docs' fingerprint sets
    val common = "the quick brown fox"
    check(forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) {
      (a, b) =>
        val fa = kernel(a + common + b, 8, 4).toSet
        val fb = kernel(b + "|" + common + "|" + a, 8, 4).toSet
        fa.intersect(fb).nonEmpty
    })
    assert(kernel("", 8, 4).isEmpty)
    assert(kernel("hi", 8, 4).size == 1) // whole-text hash under w
    val spark = SparkTestSession.spark
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT size(winnow_fingerprints('abcdefghij'))")
      .head().getInt(0) >= 1)
  }

  test("topCount equals max group multiplicity on random string lists") {
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e f", ""))
    check(forAll(gen) { xs =>
      val expected =
        if (xs.isEmpty) 0
        else xs.groupBy(identity).values.map(_.size).max
      val arr = new GenericArrayData(
        xs.map(s => UTF8String.fromString(s): Any).toArray)
      graft.plans.TextKernels.topCount(arr) == expected
    })
  }

  test("top/dup gram char fracs: bounded, total, match a reference " +
      "recomputation on random string lists") {
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e f", "", "üx"))
    def utf8(xs: Seq[String]) = new GenericArrayData(
      xs.map(s => UTF8String.fromString(s): Any).toArray)
    check(forAll(gen) { xs =>
      val a = utf8(xs)
      val top = graft.plans.TextKernels.topGramCharFrac(a)
      val dup = graft.plans.TextKernels.dupGramCharFrac(a)
      val total = xs.map(_.length).sum.toLong
      val expTop =
        if (xs.isEmpty || total == 0L) 0.0
        else {
          // kernel tie rule: count desc, char length desc, binary asc
          val byKey = xs.groupBy(identity).map { case (k, v) =>
            (k, v.size, k.length)
          }
          val best = byKey.minBy { case (k, c, l) =>
            (-c, -l, k) // String natural order == binary for these cases
          }
          best._2.toLong * best._3 / total.toDouble
        }
      val expDup =
        if (xs.isEmpty || total == 0L) 0.0
        else xs.groupBy(identity).collect {
          case (k, v) if v.size >= 2 => v.size.toLong * k.length
        }.sum / total.toDouble
      top == expTop && dup == expDup &&
        top >= 0.0 && top <= 1.0 && dup >= 0.0 && dup <= 1.0
    })
    // SQL path ≡ kernel
    val spark = SparkTestSession.spark
    graft.plans.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT top_gram_char_frac(array('ab', 'ab', 'c')), " +
        "dup_gram_char_frac(array('ab', 'ab', 'c'))").head()
    assert(row.getDouble(0) == 4.0 / 5.0 && row.getDouble(1) == 4.0 / 5.0)
  }

  test("fused repetitionNgramFeatures: text-char-normalized top mass " +
      "and dup positional coverage match a reference recomputation, " +
      "incl. supplementary-plane words") {
    import graft.plans.TextKernels
    val word = Gen.oneOf("a", "bb", "ccc", "é", "x😀y", "go", "stop")
    val gen = Gen.listOf(word).map(_.mkString(" "))
    def cp(s: String) = s.codePointCount(0, s.length)
    def cpLess(a: String, b: String) = java.util.Arrays.compare(
      a.codePoints.toArray, b.codePoints.toArray) < 0
    check(forAll(gen) { text =>
      val u = UTF8String.fromString(text)
      val fused = TextKernels.repetitionNgramFeatures(u)
      val words = TextKernels.splitWords(u)
      val wTotal = words.map(cp(_).toLong).sum
      (2 to 10).forall { k =>
        val exp: Double =
          if (words.length < k || wTotal == 0L) 0.0
          else {
            val grams = (0 to words.length - k)
              .map(i => words.slice(i, i + k).mkString(" "))
            val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
            if (k <= 4) {
              // tie rule: count desc, gram chars desc, codepoint asc
              val best = counts.keys.reduce { (a, b) =>
                val (ca, cb) = (counts(a), counts(b))
                if (ca != cb) { if (ca > cb) a else b }
                else if (cp(a) != cp(b)) { if (cp(a) > cp(b)) a else b }
                else if (cpLess(a, b)) a else b
              }
              counts(best).toLong * (cp(best) - (k - 1)) / wTotal.toDouble
            } else {
              val covered = grams.indices
                .filter(i => counts(grams(i)) >= 2)
                .flatMap(i => i until i + k).toSet
              covered.toSeq.map(p => cp(words(p)).toLong).sum /
                wTotal.toDouble
            }
          }
        fused.getDouble(k - 2) == exp
      }
    })
    // dup coverage counts each covered word ONCE: in
    // "a b c d e x y z a b c d e" only the 5-gram "a b c d e"
    // repeats; its two occurrences cover word positions 0..4 and
    // 8..12 → 10 of 13 single-char words → 10/13 (the mass rule
    // would have scored 2·5-gram chars over gram mass instead)
    val hand = TextKernels.repetitionNgramFeatures(UTF8String.fromString(
      "a b c d e x y z a b c d e"))
    assert(hand.getDouble(5 - 2) == 10.0 / 13.0)
    // top-2-gram on pure repetition exceeds the 0.20 cut in paper
    // units: "ab ab ab" → top gram "ab ab" ×2 overlapping → 2·4/6
    val rep = TextKernels.repetitionNgramFeatures(
      UTF8String.fromString("ab ab ab"))
    assert(rep.getDouble(0) == 2.0 * 4.0 / 6.0)
  }

  test("wordShingleHashes output is sorted and distinct") {
    check(forAll(Gen.listOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))) { words =>
      val out = HashKernels
        .wordShingleHashes(UTF8String.fromString(words.mkString(" ")), 3)
      val xs = (0 until out.numElements()).map(out.getLong)
      xs == xs.sorted && xs.distinct == xs
    })
  }

  test("minhashText: permutation-invariant to duplicate shingles, " +
      "identical text => identical signature") {
    check(forAll(Gen.alphaNumStr) { s =>
      val a = HashKernels.minhashText(UTF8String.fromString(s), 5, 20)
      val b = HashKernels.minhashText(UTF8String.fromString(s), 5, 20)
      (0 until 20).forall(i => a.getLong(i) == b.getLong(i))
    })
    // doubling the text adds no new 5-shingles beyond the seam — the
    // signature is a set sketch, so min values can only move down with
    // new shingles, never up
    check(forAll(Gen.alphaLowerStr.suchThat(_.length >= 5)) { s =>
      val once = HashKernels.minhashText(UTF8String.fromString(s), 5, 20)
      val twice = HashKernels.minhashText(UTF8String.fromString(s + s), 5, 20)
      (0 until 20).forall(i => twice.getLong(i) <= once.getLong(i))
    })
  }

  test("cosineFloat: symmetric, self-similarity 1, bounded") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))
    check(forAll(vec, vec) { (a, b) =>
      val ab = HashKernels.cosineFloat(farr(a), farr(b)).asInstanceOf[Double]
      val ba = HashKernels.cosineFloat(farr(b), farr(a)).asInstanceOf[Double]
      ab == ba && ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9
    })
    check(forAll(vec) { a =>
      val aa = HashKernels.cosineFloat(farr(a), farr(a)).asInstanceOf[Double]
      math.abs(aa - 1.0) < 1e-6
    })
  }

  test("hyperplaneSig: deterministic; negation flips (almost) every bit") {
    // seeded continuous floats, NOT scalacheck: shrinking steers toward
    // "nice" values (0.0, ±1.0, ±10.0) whose ± sums cancel to an exact
    // 0.0 dot product, where both signs legitimately report bit 0
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val v = List.fill(8)((rnd.nextFloat() - 0.5f) * 20f + 1e-3f)
      val s1 = HashKernels.hyperplaneSig(farr(v), 16)
      val s2 = HashKernels.hyperplaneSig(farr(v), 16)
      val neg = HashKernels.hyperplaneSig(farr(v.map(-_)), 16)
      // dot products flip sign under negation, so bits complement except
      // where a dot lands exactly on 0.0 (measure-zero for these values)
      val hamming = java.lang.Long.bitCount((s1 ^ neg) & 0xFFFFL)
      assert(s1 == s2)
      assert(hamming >= 15, s"v=$v hamming=$hamming")
    }
  }

  test("hyperplaneSig offset: per-band sigs are slices of the packed form") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val v = List.fill(8)((rnd.nextFloat() - 0.5f) * 20f + 1e-3f)
      val packed = HashKernels.hyperplaneSig(farr(v), 48)
      (0 until 4).foreach { b =>
        val band = HashKernels.hyperplaneSig(farr(v), 12, b * 12)
        assert(band == ((packed >>> (b * 12)) & 0xFFFL),
          s"band $b of $v")
      }
      // beyond 64 total planes: distinct bands, still deterministic
      val hi = HashKernels.hyperplaneSig(farr(v), 12, 64)
      assert(hi == HashKernels.hyperplaneSig(farr(v), 12, 64))
      // double kernel honors the same offset contract
      val dv = farrD(v.map(_.toDouble))
      assert(HashKernels.hyperplaneSigDouble(dv, 12, 24) ==
        ((packed >>> 24) & 0xFFFL))
    }
  }

  test("md5-basis hyperplane sigs: band elements are offset slices, " +
      "signs come from the DuckDB-replayable md5 low bit, and the " +
      "float/double kernels agree") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val v = List.fill(8)((rnd.nextFloat() - 0.5f) * 20f + 1e-3f)
      val banded = HashKernels
        .hyperplaneBandSigsMd5(farr(v), 4, 6).toLongArray()
      (0 until 4).foreach { b =>
        assert(banded(b) == HashKernels.hyperplaneSigMd5(farr(v), 6, b * 6),
          s"band $b of $v")
      }
      assert(HashKernels.hyperplaneSigMd5Double(
        farrD(v.map(_.toDouble)), 6, 6) == banded(1))
    }
    // the sign source IS md5Prefix60("p:d") & 1 — recompute plane 3's
    // signature by hand for one vector (the oracle's replay recipe)
    val v = List(1.5f, -2.25f, 3.0f, 0.5f, -1.0f, 2.0f, -0.75f, 4.0f)
    val byHand = (0 until 8).foldLeft(0.0) { (acc, d) =>
      val bit = HashKernels.md5Prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"3:$d")) & 1L
      acc + (if (bit == 1L) v(d).toDouble else -v(d).toDouble)
    }
    val sig = HashKernels.hyperplaneSigMd5(farr(v), 4, 0)
    assert((((sig >>> 3) & 1L) == 1L) == (byHand > 0))
  }

  test("double-array inputs keep double precision; other types fail analysis") {
    import org.apache.spark.sql.functions._
    import graft.plans.HashExpressions
    val spark = SparkTestSession.spark
    import spark.implicits._
    // values whose float narrowing visibly shifts the similarity
    val a = Array(1.0 + 1e-9, 2.0, 3.0, 4.0)
    val b = Array(1.0, 2.0 + 1e-9, 3.0, 4.0)
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(
      HashExpressions.cosine_sim(col("a"), col("b")).as("sim"),
      HashExpressions.hyperplane_sig(col("a"), 16).as("sig")).head()
    // exact double ground truth, computed in plain Scala
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val expect = dot / (math.sqrt(a.map(x => x * x).sum) *
      math.sqrt(b.map(x => x * x).sum))
    assert(got.getDouble(0) == expect,
      s"double path not exact: ${got.getDouble(0)} vs $expect")
    // and the double sig matches the float sig for float-exact values
    val fdf = Seq((a.map(_.toFloat), a)).toDF("f", "d")
    val sigs = fdf.select(
      HashExpressions.hyperplane_sig(col("f"), 16).as("sf"),
      HashExpressions.hyperplane_sig(col("d"), 16).as("sd")).head()
    assert(sigs.getLong(0) == sigs.getLong(1))
    // int arrays must fail analysis, not silently cast
    val idf = Seq((Array(1, 2, 3), Array(1, 2, 3))).toDF("x", "y")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      idf.select(HashExpressions.cosine_sim(col("x"), col("y"))).collect()
    }
    assert(err.getMessage.contains("cast explicitly"))
  }

  test("TopK aggregator: any partitioning ≡ global sort-take-k") {
    import graft.operators.TopK
    import graft.operators.TopK.Scored
    // partial aggregation reorders reduce/merge arbitrarily — the
    // result must equal the global best-first top-k for ANY split
    val gen = for {
      n <- Gen.choose(0, 60)
      k <- Gen.choose(1, 8)
      scores <- Gen.listOfN(n, Gen.choose(0, 12)) // ties likely
      ids <- Gen.listOfN(n, Gen.choose(0L, 20L))  // duplicate ids too
      cut1 <- Gen.choose(0, n)
      cut2 <- Gen.choose(0, n)
    } yield (k, scores.map(_.toDouble).zip(ids).map(Scored.tupled),
      math.min(cut1, cut2), math.max(cut1, cut2))
    check(forAll(gen) { case (k, items, lo, hi) =>
      val agg = TopK.aggregator(k)
      def fold(xs: Seq[Scored]) = xs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(agg.merge(fold(items.take(lo)),
        fold(items.slice(lo, hi))), fold(items.drop(hi)))
      // ground truth: distinct items, best-first, take k
      val truth = items.distinct
        .sortBy(s => (-s.score, s.id)).take(k)
      merged == truth
    })
  }

  test("native TopKBuffer: any partitioning ≡ global sort-take-k") {
    import graft.plans.TopKBuffer
    // same contract as the typed-udaf test above, driven through the
    // primitive-array buffer the native aggregate uses: arbitrary
    // reduce/merge splits (and a serialize-shaped bulk copy) must equal
    // the global distinct best-first top-k
    val gen = for {
      n <- Gen.choose(0, 60)
      k <- Gen.choose(1, 8)
      scores <- Gen.listOfN(n, Gen.choose(0, 12)) // ties likely
      ids <- Gen.listOfN(n, Gen.choose(0L, 20L))  // duplicate ids too
      cut1 <- Gen.choose(0, n)
      cut2 <- Gen.choose(0, n)
    } yield (k, scores.map(_.toDouble).zip(ids),
      math.min(cut1, cut2), math.max(cut1, cut2))
    check(forAll(gen) { case (k, items, lo, hi) =>
      def fold(xs: Seq[(Double, Long)]): TopKBuffer = {
        val b = new TopKBuffer(k)
        xs.foreach { case (s, i) => b.insert(s, i) }
        b
      }
      def merge(a: TopKBuffer, o: TopKBuffer): TopKBuffer = {
        (0 until o.size).foreach(i => a.insert(o.scores(i), o.ids(i)))
        a
      }
      val merged = merge(merge(fold(items.take(lo)),
        fold(items.slice(lo, hi))), fold(items.drop(hi)))
      val got = (0 until merged.size).map(i => (merged.scores(i), merged.ids(i)))
      val truth = items.distinct
        .sortBy { case (s, i) => (-s, i) }.take(k)
      got == truth
    })
  }

  test("pair_combos ≡ filtered nested-transform cross, long and string ids") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.plans.HashExpressions
    import spark.implicits._
    // the composable reference form the kernel replaced
    def reference(ids: org.apache.spark.sql.Column) = filter(
      flatten(transform(ids, a => transform(ids,
        b => struct(a.as("id1"), b.as("id2"))))),
      p => p.getField("id1") < p.getField("id2"))
    val rnd = new scala.util.Random(3)
    val longRows = Seq.fill(60)(
      Seq.fill(rnd.nextInt(8))(rnd.nextInt(6).toLong)) // dup ids likely
    val ldf = longRows.toDF("ids")
    val l = ldf.select(
      HashExpressions.pair_combos(col("ids")).as("k"),
      reference(col("ids")).as("r")).collect()
    l.foreach { row =>
      def pairs(i: Int) = row.getSeq[org.apache.spark.sql.Row](i)
        .map(p => (p.getLong(0), p.getLong(1)))
      // same SET — both forms emit value-duplicates when ids repeat in
      // the list (impossible in real buckets: one row per (id, band));
      // the downstream .distinct() owns dedup either way
      assert(pairs(0).toSet == pairs(1).toSet)
      // canonical orientation: every emitted pair is (smaller, larger)
      pairs(0).foreach { case (a, b) => assert(a < b) }
    }
    // null ids are dropped, not unboxed to 0 / NPE'd (SQL callers can
    // hand the kernel arrays with nulls)
    graft.plans.GraftExtensions.register(spark)
    val withNulls = spark.sql(
      "SELECT pair_combos(array(2L, CAST(NULL AS BIGINT), 1L)) AS p")
    val np = withNulls.head().getSeq[org.apache.spark.sql.Row](0)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(np == Seq((1L, 2L)))
    assert(spark.sql("SELECT pair_combos(array('b', CAST(NULL AS STRING)))")
      .head().getSeq[org.apache.spark.sql.Row](0).isEmpty)

    val strRows = Seq.fill(40)(
      Seq.fill(rnd.nextInt(6))(s"s${rnd.nextInt(5)}"))
    val sdf = strRows.toDF("ids")
    val sOut = sdf.select(
      HashExpressions.pair_combos(col("ids")).as("k"),
      reference(col("ids")).as("r")).collect()
    sOut.foreach { row =>
      def pairs(i: Int) = row.getSeq[org.apache.spark.sql.Row](i)
        .map(p => (p.getString(0), p.getString(1)))
      assert(pairs(0).toSet == pairs(1).toSet)
    }
  }

  test("native top_k_agg ≡ typed-udaf top_k on a grouped query") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(4000)(i =>
      (i % 7, rnd.nextInt(40).toDouble / 4.0, rnd.nextInt(50).toLong))
    val df = rows.toDF("g", "sim", "id").repartition(8)
    def flat(c: org.apache.spark.sql.DataFrame) = c
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .sortBy(identity).toSeq
    val native = flat(df.groupBy("g")
      .agg(graft.plans.TopKAgg.top_k_agg(5)(col("sim"), col("id")).as("top")))
    val udaf = flat(df.groupBy("g")
      .agg(graft.operators.TopK.top_k(5)(col("sim"), col("id")).as("top")))
    assert(native == udaf)
    assert(native.nonEmpty)
    // and through SQL via the registered function
    graft.plans.GraftExtensions.register(spark)
    df.createOrReplaceTempView("topk_in")
    val sql = flat(spark.sql(
      "SELECT g, top_k_agg(sim, id, 5) AS top FROM topk_in GROUP BY g"))
    assert(sql == native)
  }

  test("native rpm_stream_reduce ≡ typed-udaf aggregator on a grouped " +
      "query") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // epoch-ful EVR strings across a few base streams per group, with
    // dist-tag releases so the EVR compare (not string order) decides
    val rows = Seq.tabulate(3000) { i =>
      val epoch = rnd.nextInt(2)
      val base = s"$epoch:${rnd.nextInt(3)}.${rnd.nextInt(4)}"
      (i % 11, s"$base.${rnd.nextInt(10)}-${rnd.nextInt(5)}.el9_${rnd.nextInt(6)}")
    }
    val df = rows.toDF("g", "ver").repartition(8)
    def flat(c: org.apache.spark.sql.DataFrame) = c
      .select(col("g"), col("r.canonical"), col("r.n_streams"),
        array_join(transform(col("r.streams"),
          x => concat_ws("|", x.getField("base"), x.getField("version"))),
          ",").as("s"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        r.getString(3))).sortBy(_._1).toSeq
    val native = flat(df.groupBy("g").agg(
      graft.plans.RpmStreamAgg.rpm_stream_reduce(col("ver")).as("r")))
    val udaf = flat(df.groupBy("g").agg(
      graft.operators.RpmStreamReduce.rpm_stream_reduce(col("ver")).as("r")))
    assert(native == udaf)
    assert(native.nonEmpty && native.exists(_._3 > 1))
    // and through SQL via the registered function
    graft.plans.GraftExtensions.register(spark)
    df.createOrReplaceTempView("rpm_stream_in")
    val sql = flat(spark.sql(
      """SELECT g, rpm_stream_reduce(ver) AS r
         FROM rpm_stream_in GROUP BY g"""))
    assert(sql == native)
  }

  test("rpm_stream_reduce buffer survives >64KB strings across the " +
      "shuffle (writeUTF would throw)") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val big = "9.0-" + ("x" * 70000)
    val df = Seq((1, big), (1, "1.0-1"), (2, "2.0-1"))
      .toDF("g", "ver").repartition(3)
    val out = df.groupBy("g")
      .agg(graft.plans.RpmStreamAgg.rpm_stream_reduce(col("ver")).as("r"))
      .select(col("g"), col("r.canonical")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == big && out(2) == "2.0-1")
  }

  test("hyperplane_band_sigs ≡ per-offset hyperplane_sig slices") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.plans.HashExpressions
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val (bands, bits) = (6, 6)
    val df = vecs.zipWithIndex.map(_.swap).toDF("id", "v")
    val rows = df.select(col("id"),
        HashExpressions.hyperplane_band_sigs(col("v"), bands, bits).as("bs"),
        array((0 until bands).map(b =>
          HashExpressions.hyperplane_sig(col("v"), bits, b * bits)): _*)
          .as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"band keys diverged for id ${r.getInt(0)}")
    }
    // the double kernel agrees with the float kernel on float-exact input
    val d = df.select(
      HashExpressions.hyperplane_band_sigs(col("v"), bands, bits).as("f"),
      HashExpressions.hyperplane_band_sigs(
        col("v").cast("array<double>"), bands, bits).as("d")).collect()
    d.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("cms_topk: never undercounts, exact on a wide sketch, " +
      "partition-invariant on skewed data") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Zipf-ish: key_i appears (200 - i) times for i in 0..39 — the
    // head is unambiguous, so the top-10 is exactly key_0..key_9
    val rows = (0 until 40).flatMap(i => Seq.fill(200 - i)(f"key_$i%02d"))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val shuffled = new scala.util.Random(5).shuffle(rows)
    for (parts <- Seq(1, 7, 32)) {
      val df = shuffled.toDF("k").repartition(parts)
      val got = df.agg(graft.plans.CmsAgg.cms_topk(10, 4, 1 << 14)(col("k"))
          .as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.key"), col("e.est"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // wide sketch (2^14 cells, 40 keys): estimates are exact w.h.p.,
      // and CMS can never undercount regardless; the ε·N slack must be
      // computed in doubles — integer division truncates it to zero
      val slack = math.ceil(3.0 * n / (1 << 14))
      got.foreach { case (k, est) =>
        assert(est >= exact(k), s"undercount for $k")
        assert(est - exact(k) <= slack, s"overcount for $k")
      }
      assert(got.map(_._1).toSeq ==
        (0 until 10).map(i => f"key_$i%02d"), s"top-10 order at $parts")
    }
    // and through SQL via the registered function
    graft.plans.GraftExtensions.register(spark)
    rows.toDF("k").createOrReplaceTempView("cms_in")
    val sql = spark.sql(
      "SELECT cms_topk(k, 3, 4, 16384) AS top FROM cms_in")
      .select(explode(col("top")).as("e")).select(col("e.key"))
      .collect().map(_.getString(0)).toSeq
    assert(sql == Seq("key_00", "key_01", "key_02"))
  }

  test("cms_sketch: partition-invariant counters; md5 cells match the " +
      "hex-prefix arithmetic; min-over-rows probe never undercounts") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0 until 30).flatMap(i => Seq.fill(i + 1)(s"w$i"))
    val shuffled = new scala.util.Random(9).shuffle(rows)
    val (depth, w) = (4, 64) // narrow: collisions guaranteed
    val sketches = Seq(1, 8, 32).map { parts =>
      shuffled.toDF("k").repartition(parts)
        .agg(graft.plans.CmsAgg.cms_sketch(depth, w, md5Basis = true)(
          col("k")).as("sk"))
        .head().getSeq[Long](0)
    }
    // counter addition is commutative: any partitioning, same matrix
    assert(sketches.distinct.size == 1, "sketch not partition-invariant")
    val sk = sketches.head
    assert(sk.length == depth * w && sk.sum == rows.size.toLong * depth)
    // md5 cells: replay the hex-prefix arithmetic and probe
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
    def bucket(k: String, r: Int): Int =
      (graft.plans.HashKernels.md5Prefix60(
        org.apache.spark.unsafe.types.UTF8String
          .fromString(s"$k:$r")) % w).toInt
    exact.foreach { case (k, n) =>
      val est = (0 until depth).map(r => sk(r * w + bucket(k, r))).min
      assert(est >= n, s"undercount for $k")
    }
  }

  test("hll_registers: partition-invariant max-merge; registers match " +
      "the md5-prefix arithmetic; estimate within the published bound") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val keys = (0 until 3000).map(i => s"user_${i % 1700}")
    val shuffled = new scala.util.Random(3).shuffle(keys)
    val p = 8
    val m = 1 << p
    val regsByParts = Seq(1, 8, 32).map { parts =>
      shuffled.toDF("k").repartition(parts)
        .agg(graft.plans.HllAgg.hll_registers(p)(col("k")).as("r"))
        .head().getSeq[Int](0)
    }
    assert(regsByParts.distinct.size == 1, "registers not partition-invariant")
    val regs = regsByParts.head
    // reference recompute straight from the md5-prefix definition
    val exp = new Array[Int](m)
    keys.distinct.foreach { k =>
      val v = graft.plans.HashKernels.md5Prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(k))
      val idx = (v % m).toInt
      val w = v >>> p
      val rank = if (w == 0L) 53
        else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > exp(idx)) exp(idx) = rank
    }
    assert(regs == exp.toSeq, "registers diverge from the definition")
    // estimate: within ~3σ of truth (σ = 1.04/√m ≈ 6.5%)
    val est = shuffled.toDF("k")
      .agg(graft.plans.HllAgg.hll_registers(p)(col("k")).as("r"))
      .select(graft.plans.HllAgg.hll_estimate(col("r"), p).as("e"))
      .head().getDouble(0)
    assert(math.abs(est - 1700.0) / 1700.0 < 0.2, s"estimate $est vs 1700")
    // α_m: the published exact constants at the three smallest register
    // counts, asymptotic form above (the advisor-flagged small-m bias)
    assert(graft.plans.HllAgg.alphaMM(4) == 0.673 * 16 * 16)
    assert(graft.plans.HllAgg.alphaMM(5) == 0.697 * 32 * 32)
    assert(graft.plans.HllAgg.alphaMM(6) == 0.709 * 64 * 64)
    assert(graft.plans.HllAgg.alphaMM(8) ==
      0.7213 / (1.0 + 1.079 / 256) * 256 * 256)
  }

  test("cms_topk property: estimates never undercount on arbitrary " +
      "multisets at arbitrary partitionings") {
    // pure-JVM like the TopKBuffer properties: drive CmsBuffer.add /
    // mergeIn / top directly over list slices — the identical code
    // path CmsTopKExpr runs, without 200 Spark jobs per property
    import graft.plans.CmsBuffer
    import org.apache.spark.unsafe.types.UTF8String
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.oneOf(
        Gen.alphaLowerStr.map(_.take(3)), Gen.const("")))
      parts <- Gen.oneOf(1, 3, 8)
    } yield (keys, parts)
    check(forAll(gen) { case (keys, parts) =>
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      // narrow sketch (64 cells) to force collisions — the bound must
      // hold anyway
      val slice = math.max(1, math.ceil(keys.size / parts.toDouble).toInt)
      val merged = keys.grouped(slice).map { sl =>
        val b = new CmsBuffer(2, 64, 1000)
        sl.foreach(k => b.add(UTF8String.fromString(k)))
        b
      }.reduce { (a, o) => a.mergeIn(o); a }
      merged.top().forall { case (k, est) => est >= exact(k) }
    })
  }

  test("mat_project: SQL ≡ column API, double ≡ float, basis validated") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import graft.plans.HashExpressions
    import spark.implicits._
    val mean = Array(0.5, -0.5)
    val mat = Array(1.0, 2.0, 3.0, 4.0) // 2×2 row-major
    val df = Seq((1L, Seq(2.0f, 1.0f))).toDF("id", "v")
    val api = df.select(
      HashExpressions.mat_project(col("v"), mean, mat)).head().getSeq[Double](0)
    assert(api == Seq(1.5 * 1.0 + 1.5 * 2.0, 1.5 * 3.0 + 1.5 * 4.0))
    val dbl = df.select(HashExpressions.mat_project(
      col("v").cast("array<double>"), mean, mat)).head().getSeq[Double](0)
    assert(dbl == api)
    graft.plans.GraftExtensions.register(spark)
    df.createOrReplaceTempView("matproj_in")
    val sql = spark.sql(
      """SELECT mat_project(v, cast(array(0.5, -0.5) as array<double>),
        cast(array(1.0, 2.0, 3.0, 4.0) as array<double>)) AS p
        FROM matproj_in""").head().getSeq[Double](0)
    assert(sql == api)
    // non-foldable basis rejected with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT mat_project(v, v, v) FROM matproj_in").collect()
    }
    assert(err.getMessage.contains("foldable array<double>"))
  }

  test("probeVideo is total on arbitrary bytes: never throws, always " +
      "terminates, feature is 8-dim when produced") {
    import graft.operators.Multimodal
    val rawBytes = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray)
    // half the cases wear a valid ftyp header so the box walk actually
    // engages on a random tail (pure-random bytes rarely pass the gate)
    val gen = for {
      tail <- rawBytes
      dressed <- Gen.oneOf(true, false)
    } yield
      if (!dressed) tail
      else {
        val hdr = java.nio.ByteBuffer.allocate(20)
        hdr.putInt(20); hdr.put("ftyp".getBytes("ISO-8859-1"))
        hdr.put("isom".getBytes); hdr.putInt(0); hdr.put("isom".getBytes)
        hdr.array() ++ tail
      }
    check(forAll(gen) { bytes =>
      Multimodal.probeVideo(bytes).forall(_.length == 8)
    })
  }
}
