package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text
import graft.operators.Corpus

/** Value-level pins for the corpus-curation operators (the DuckDB oracle
  * checks the full-query surface; these pin the per-operator arithmetic
  * on hand-computable cases). */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetition features on hand-computed docs") {
    val df = Seq(
      (1L, "a a a a"),          // 4 words, 1 distinct; "a a" fills all 3 slots
      (2L, "w x y z"),          // all distinct; every bigram unique
      (3L, "go stop go stop go"), // "go stop"×2 + "stop go"×2 of 4 slots
      (4L, "solo")              // single word: no bigrams
    ).toDF("doc_id", "text")
    val f = Text.repetition_features(col("text"))
    val out = df.select(col("doc_id"),
      f.getField("n_words").as("n"),
      round(f.getField("dup_word_frac"), 4).as("dup"),
      round(f.getField("top_bigram_frac"), 4).as("top"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 0.75, 1.0)))
    assert(out(2L) == ((4L, 0.0, 0.3333)))
    assert(out(3L) == ((5L, 0.6, 0.5)))
    assert(out(4L) == ((1L, 0.0, 0.0)))
  }

  test("compression_ratio: boilerplate < prose < noise; empty/null → null") {
    val noise = (0 until 100).map(i => java.util.UUID.nameUUIDFromBytes(
      Array(i.toByte, 7)).toString).mkString(" ")
    val df = Seq(
      (1L, "subscribe to our newsletter today! " * 120), // boilerplate
      (2L, "The committee reviewed the updated proposal on Thursday " +
        "and raised two concerns about the revised funding schedule " +
        "before adjourning until the following week. " * 8), // prose
      (3L, noise),                                        // high entropy
      (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        Text.compression_ratio(col("text")).as("r"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(4L).isEmpty && out(5L).isEmpty)
    val (b, p, n) = (out(1L).get, out(2L).get, out(3L).get)
    assert(b < p && p < n, s"ordering violated: $b, $p, $n")
    assert(b < 0.10, s"repeated boilerplate should collapse, got $b")
    assert(n > 0.5, s"high-entropy text should resist, got $n")
  }

  test("hashKeep is deterministic and tracks the requested rate") {
    val df = (1 to 4000).map(i => s"document body number $i").toDF("text")
    val kept = df.filter(Corpus.hashKeep(col("text"), 0.25)).count()
    val keptAgain = df.filter(Corpus.hashKeep(col("text"), 0.25)).count()
    assert(kept == keptAgain, "sampling not deterministic")
    // md5 is uniform: expect 1000 ± 5 sigma (sigma = sqrt(n·p·(1-p)) ≈ 27)
    assert(math.abs(kept - 1000) < 140, s"kept=$kept far from rate")
    // monotone: a larger rate keeps a superset
    val small = df.filter(Corpus.hashKeep(col("text"), 0.1))
    val bigger = df.filter(Corpus.hashKeep(col("text"), 0.5))
    assert(small.exceptAll(bigger).count() == 0, "rates not nested")
    // regression: rate = 1.0 keeps EVERYTHING — the threshold would
    // format as 5-char "10000", which string-compares below most
    // 4-char buckets (only ~1/16 of rows survived)
    assert(df.filter(Corpus.hashKeep(col("text"), 1.0)).count() == 4000)
    assert(df.filter(Corpus.hashKeep(col("text"), 0.0)).count() == 0)
  }

  test("capPerGroup bounds group size and keeps best-first") {
    val df = Seq(
      ("s1", 1L, 10L), ("s1", 2L, 30L), ("s1", 3L, 20L), ("s1", 4L, 40L),
      ("s2", 5L, 1L)
    ).toDF("source", "doc_id", "n_tokens")
    val out = Corpus.capPerGroup(df, "source",
      Seq(col("n_tokens").desc, col("doc_id").asc), 2)
    val s1 = out.filter(col("source") === "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == Set(4L, 2L), s"expected top-2 by tokens, got $s1")
    assert(out.groupBy("source").count()
      .filter(col("count") > 2).count() == 0)
  }

  test("bm25 ranks heavier term usage higher at equal length") {
    val df = Seq(
      (1L, "table table table pad pad pad"),
      (2L, "table pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val out = Corpus.bm25(df, "doc_id", "text", Seq("table"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(3L), "doc without the term must be excluded")
    assert(out(1L) > out(2L), s"tf=3 must beat tf=1: $out")
  }

  test("scrubPii replaces and counts each class; clean text untouched") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org and 10.1.2.3 tel 555-0199"),
      (2L, "no pii here at all")
    ).toDF("id", "text")
    val p = Corpus.scrubPii(col("text"))
    val out = df.select(col("id"), p.getField("scrubbed").as("s"),
      p.getField("n_emails").as("e"), p.getField("n_ips").as("i"),
      p.getField("n_phones").as("ph"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("mail <EMAIL> and <IP> tel <PHONE>", 1L, 1L, 1L)))
    assert(out(2L) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("profile emits one stats row per column") {
    val df = Seq(
      (Some("a"), 1L), (Some("b"), 2L), (None, 2L)
    ).toDF("s", "k")
    val out = Corpus.profile(df, Seq("s" -> col("s"), "k" -> col("k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out("s") == ((3L, 1L, 2L, "a")))
    assert(out("k") == ((3L, 0L, 2L, "1")))
  }

  test("bm25 idf discounts common terms") {
    // 'common' appears in every doc, 'rare' in one: for the doc holding
    // both once, the rare term must contribute more than the common one
    val df = Seq(
      (1L, "common rare pad"), (2L, "common pad pad"), (3L, "common pad pad")
    ).toDF("doc_id", "text")
    val scores = Corpus.bm25(df, "doc_id", "text", Seq("common", "rare"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val commonOnly = Corpus.bm25(df, "doc_id", "text", Seq("common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) - commonOnly(1L) > commonOnly(1L),
      "rare-term contribution should dominate the common term's")
  }

  test("unigram log-prob on a hand-computed corpus") {
    // corpus: a a a b  → P(a)=3/4, P(b)=1/4
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = Corpus.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == BigDecimal(math.log(0.75))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L) == BigDecimal(math.log(0.25))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("unigram log-prob: broadcast-head split is exact at any cut") {
    val docs = (1L to 60L).map(i =>
      (i, s"the of and tail$i the of rare${i % 7} the")).toDF("doc_id", "text")
    val full = Corpus.unigramLogProb(docs, "doc_id", "text", headVocab = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (h <- Seq(1, 3, 1000)) {
      val split = Corpus.unigramLogProb(docs, "doc_id", "text", headVocab = h)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(split == full, s"headVocab=$h diverged from the exact join")
    }
  }

  test("cross-corpus containment on a hand-built overlap") {
    import graft.operators.Contamination
    // a: shingles {x y z, y z w} ; b: {x y z, y z q} → overlap 1
    // containment(a→b) = 1/|b| = 0.5 and symmetric here
    val df = Seq(
      ("a", "x y z w"), ("b", "x y z q")
    ).toDF("source", "text")
    val out = Contamination.crossContainment(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("a", "b")) == ((1L, 0.5)))
    assert(out(("b", "a")) == ((1L, 0.5)))
  }

  test("C4 line dedup: frequent lines deleted everywhere, order kept") {
    import graft.operators.Corpus
    val docs = Seq(
      (1L, "unique intro\ncookie banner\nreal content one"),
      (2L, "cookie banner\nreal content two\ncookie banner"),
      (3L, "cookie banner\nanother body\ntwice line"),
      (4L, "all boilerplate doc\ncookie banner\ntwice line")
    ).toDF("doc_id", "text")
    // "cookie banner" occurs 5 times (> 2) → stripped; "twice line"
    // occurs exactly 2 times (not > 2) → kept at this threshold
    val out = Corpus.dedupLines(docs, "text",
        delim = "\n", maxOccurrences = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique intro\nreal content one")
    assert(out(2L) == "real content two")
    assert(out(3L) == "another body\ntwice line")
    assert(out(4L) == "all boilerplate doc\ntwice line")
    // nothing frequent → corpus unchanged
    val same = Corpus.dedupLines(docs, "text",
        delim = "\n", maxOccurrences = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(same == docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    // maxOccurrences = 1 crosses the boundary: "twice line" (count 2)
    // is now ALSO stripped, distinguishing the two thresholds
    val strict = Corpus.dedupLines(docs, "text",
        delim = "\n", maxOccurrences = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strict(3L) == "another body")
    assert(strict(1L) == "unique intro\nreal content one")
    // the broadcast-join fallback (literal caps forced to 0) must be
    // row-identical to the literal path — same pin as the per-group
    // variant's lit≡join
    val viaJoin = Corpus.dedupLines(docs, "text",
        delim = "\n", maxOccurrences = 2,
        maxLiteralLines = 0L, maxLiteralBytes = 0L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaJoin == out, "join fallback diverged from literal path")
  }

  test("deterministic shuffle: rerun-stable, layout-independent, " +
      "seed-sensitive") {
    import graft.operators.Corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Corpus.shuffleDeterministic(df, "doc_id", seed)
        .collect().map(_.getLong(0)).toSeq
    val a = order(docs, 7L)
    assert(a == order(docs, 7L), "not rerun-stable")
    assert(a == order(docs.repartition(13), 7L), "layout-dependent")
    assert(a != order(docs, 8L), "seed ignored")
    assert(a.sorted != a, "suspiciously already sorted — no permutation?")
    assert(a.toSet == docs.collect().map(_.getLong(0)).toSet)
  }

  test("shuffleWithPositions: distributed prefix-sum positions ≡ " +
      "global window, dense 1-based, layout-independent") {
    import graft.operators.Corpus
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    val got = Corpus.shuffleWithPositions(docs, "doc_id", 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs
      .select(col("doc_id"), row_number().over(Window.orderBy(
        Corpus.shuffleKey(col("doc_id"), 42L))).cast("long").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "prefix-sum positions diverge from the window")
    assert(got.values.toSeq.sorted == (1L to got.size).toSeq,
      "positions not a dense 1-based sequence")
    val relaid = Corpus.shuffleWithPositions(
        docs.repartition(13), "doc_id", 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relaid == got, "positions depend on input layout")
  }

  test("dedupLinesAuto: in-flow |docs| threshold ≡ explicit count") {
    import graft.operators.Corpus
    val docs = Seq(
      (1L, "common\nalpha"), (2L, "common\nbeta"), (3L, "common\ngamma"),
      (4L, "common\ncommon")  // 5 "common" > 4 docs → stripped
    ).toDF("doc_id", "text")
    val auto = Corpus.dedupLinesAuto(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val explicit = Corpus.dedupLines(docs, "text",
        maxOccurrences = docs.count())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(auto == explicit)
    assert(auto(1L) == "alpha" && auto(4L) == "")
  }

  test("dedupLines: maxFrequentLines guard fails fast with sizing " +
      "guidance instead of collecting an oversized frequent set") {
    import graft.operators.Corpus
    val docs = Seq(
      (1L, "a\nb\nc"), (2L, "a\nb\nc"), (3L, "a\nb\nc")
    ).toDF("doc_id", "text") // 3 distinct frequent lines at threshold 1
    val e = intercept[IllegalArgumentException] {
      Corpus.dedupLines(docs, "text", maxOccurrences = 1,
        maxFrequentLines = 2).collect()
    }
    assert(e.getMessage.contains("maxOccurrences"))
    // the BYTE cap trips independently of the row cap (a row cap alone
    // would let few-but-huge lines assemble an oversized collect)
    val eb = intercept[IllegalArgumentException] {
      Corpus.dedupLines(docs, "text", maxOccurrences = 1,
        maxFrequentBytes = 2).collect()
    }
    assert(eb.getMessage.contains("bytes"))
    // at cap = 3 the same call succeeds and strips all three lines
    val ok = Corpus.dedupLines(docs, "text", maxOccurrences = 1,
        maxFrequentLines = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ok.values.forall(_ == ""))
  }

  test("containment: hashed (default) path ≡ string-shingle path") {
    import graft.operators.Contamination
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(hashed: Boolean) =
      Contamination.crossContainment(docs, "source", "text", hashed = hashed)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    val h = rows(hashed = true)
    val s = rows(hashed = false)
    assert(h.nonEmpty, "containment produced no pairs at sf0.001")
    assert(h == s, "64-bit hashed shingles diverged from string shingles")
    // and the md5-prefix (oracle-replayable) basis agrees too
    val m = Contamination.crossContainment(docs, "source", "text",
        md5Keys = true)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m == s, "md5-prefix shingle keys diverged from string shingles")
  }

  test("md5Prefix60 kernel matches the DuckDB-replay arithmetic " +
      "conv(substr(md5(s),1,15),16,10) exactly") {
    import org.apache.spark.unsafe.types.UTF8String
    val words = Seq("the", "vector ngram", "", "ünïcode-wörd", "été",
      "0", "a b c", "zzz")
    val viaSql = words.toDF("w")
      .select(conv(substring(md5(col("w")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .collect().map(_.getLong(0))
    val viaKernel = words.map(w =>
      graft.plans.HashKernels.md5Prefix60(UTF8String.fromString(w)))
    assert(viaSql.toSeq == viaKernel,
      "kernel md5 prefix diverged from the SQL md5 arithmetic")
  }

  test("bigramLogProb: hand-computed scores; head split is exact") {
    // corpus: "a b", "a b", "a c" → bigram counts: "a b"=2, "a c"=1;
    // prefix counts: a=3. lp("a b") = ln(2)-ln(3); lp("a c") = ln(1)-ln(3)
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo")
    ).toDF("doc_id", "text")
    val out = Corpus.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lnAB = math.log(2.0 / 3.0)
    val lnAC = math.log(1.0 / 3.0)
    assert(math.abs(out(1L) - math.rint(lnAB * 1000) / 1000) < 1e-9)
    assert(out(1L) == out(2L))
    assert(math.abs(out(3L) - math.rint(lnAC * 1000) / 1000) < 1e-9)
    assert(!out.contains(4L), "single-token doc must carry no bigram")
    // Zipf-head split exactness on real text at several cuts
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def scores(h: Int) = Corpus.bigramLogProb(real, "doc_id", "text", h)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = scores(0)
    assert(base.nonEmpty)
    assert(scores(3) == base && scores(64) == base,
      "head-broadcast split changed bigram scores")
  }

  test("distinctiveTerms: group-exclusive term outranks shared terms") {
    val docs = Seq(
      (1L, "a", "spark spark spark common common"),
      (2L, "a", "spark common"),
      (3L, "b", "flink flink common common"),
      (4L, "b", "flink common")
    ).toDF("doc_id", "source", "text")
    val out = Corpus.distinctiveTerms(docs, "source", "text", 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // "spark" only in a (tf 4, gdf 1), "flink" only in b (tf 3, gdf 1);
    // "common" is everywhere (gdf 2 → idf ln(3/3) = 0) so it ranks last
    val bySource = out.groupBy(_._1)
    assert(bySource("a").head == (("a", "spark", 4L, 1L)))
    assert(bySource("b").head == (("b", "flink", 3L, 1L)))
    assert(bySource("a")(1)._2 == "common" && bySource("b")(1)._2 == "common")
    assert(bySource.values.forall(_.length == 2))
  }

  test("contaminationFraction: clean 0.0, exact copy 1.0, partial between") {
    import graft.operators.Contamination
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),        // exact copy → frac 1.0
      (2L, "totally unrelated words here"),  // clean → 0.0
      (3L, "alpha beta gamma zzz www qqq")   // 1 of 4 shingles shared
    ).toDF("doc_id", "text")
    val out = Contamination
      .contaminationFraction(docs, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((4L, 1L, 0.25)))
  }

  test("hitsBloom ≡ hits on a real slice, and exact under a saturated filter") {
    import graft.operators.Contamination
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = rows(Contamination.hits(train, "doc_id", "text",
      bench, "text"))
    assert(exact.nonEmpty, "fixture must plant real contamination")
    val bloom = rows(Contamination.hitsBloom(train, "doc_id", "text",
      bench, "text"))
    assert(bloom == exact, "bloom-guarded path must be row-identical")
    // expectedItems = 1 under-sizes the filter to its 64-bit floor →
    // near-every probe is a false positive; the verify join must still
    // deliver the exact answer (the filter sizes the shuffle, never
    // the result)
    val saturated = rows(Contamination.hitsBloom(train, "doc_id", "text",
      bench, "text", expectedItems = 1L))
    assert(saturated == exact,
      "a saturated (all-false-positive) filter must not change results")
    // EMPTY benchmark → empty hit frame with the right schema (a naive
    // null probe literal would also return empty here — the guard is
    // for schema + no crash)
    val none = Contamination.hitsBloom(train, "doc_id", "text",
      bench.filter(lit(false)), "text")
    assert(none.columns.toSeq == Seq("doc_id", "n_hits"))
    assert(none.count() == 0)
  }

  test("dedupLinesPerGroup: boilerplate strips in its own group only") {
    val docs = Seq(
      // site A: "cookie banner" in 3/4 docs (share .75 > .5)
      (1L, "a", "intro\ncookie banner\nreal content one"),
      (2L, "a", "cookie banner\nreal content two"),
      (3L, "a", "other words\ncookie banner"),
      (4L, "a", "clean page"),
      // site B: same line in 1/3 docs (share .33 < .5) → survives;
      // within-doc repetition must NOT count toward the share
      (5L, "b", "cookie banner\nsomething"),
      (6L, "b", "repeat\nrepeat\nrepeat"),
      (7L, "b", "unrelated"),
      // site C: a SINGLETON group — every line is 100% of its docs,
      // so without the minDocs floor the whole document would erase
      (8L, "c", "lone page\nwith every line unique to it")
    ).toDF("doc_id", "site", "text")
    val out = Corpus.dedupLinesPerGroup(docs, "site", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "intro\nreal content one")
    assert(out(2L) == "real content two")
    assert(out(3L) == "other words")
    assert(out(4L) == "clean page")
    assert(out(5L) == "cookie banner\nsomething",
      "site B is under the share — its copy must survive")
    assert(out(6L) == "repeat\nrepeat\nrepeat",
      "within-doc repetition is not boilerplate")
    assert(out(7L) == "unrelated")
    assert(out(8L) == "lone page\nwith every line unique to it",
      "singleton groups are exempt — minDocs floor")
    // guard trips before any oversized frequent set collects
    intercept[IllegalArgumentException] {
      Corpus.dedupLinesPerGroup(docs, "site", "text",
        maxDocShare = 0.1, maxFrequentLines = 1L)
    }
    // broadcast-join fallback: force the literal threshold to zero so
    // the frequent frame joins instead of typedlit-ing — results must
    // be IDENTICAL to the literal path, and the plan must carry the
    // broadcast join the literal path doesn't have
    val viaJoin = Corpus.dedupLinesPerGroup(docs, "site", "text",
      maxLiteralLines = 0L)
    val outJ = viaJoin.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(outJ == out, "join fallback diverged from the literal path")
    val plan = viaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"fallback must broadcast the frequent frame:\n$plan")
    assert(!Corpus.dedupLinesPerGroup(docs, "site", "text")
      .queryExecution.executedPlan.toString.contains("Join"),
      "literal path must stay join-free")
  }

  test("takeTokenBudget: strict hash-ordered prefix per group, seeded") {
    // per-group md5(id:0) order is knowable: compute it here the same
    // way the operator does and check the kept set is exactly the
    // strict prefix under the budget
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = (1L to 8L).map(i =>
      (i, "g", Seq.fill(i.toInt)("w").mkString(" "))) // i tokens each
      .toDF("doc_id", "grp", "text")
    val order = (1L to 8L).sortBy(i => (md5hex(s"$i:0"), i))
    val budget = 12L
    val expect = order
      .scanLeft((0L, 0L)) { case ((_, cum), id) => (id, cum + id) }
      .tail.takeWhile(_._2 <= budget).map(_._1).toSet
    val got = Corpus.takeTokenBudget(docs, "grp", "text", "doc_id", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect, s"order=$order got=$got expect=$expect")
    assert(expect.nonEmpty && expect.size < 8,
      "fixture must exercise a partial prefix")
    // working column dropped; rerun-stable; another seed = another draw
    assert(Corpus.takeTokenBudget(docs, "grp", "text", "doc_id", budget)
      .columns.toSeq == Seq("doc_id", "grp", "text"))
    val seeded = Corpus.takeTokenBudget(docs, "grp", "text", "doc_id",
      budget, seed = 7).select("doc_id").collect().map(_.getLong(0)).toSet
    val order7 = (1L to 8L).sortBy(i => (md5hex(s"$i:7"), i))
    val expect7 = order7
      .scanLeft((0L, 0L)) { case ((_, cum), id) => (id, cum + id) }
      .tail.takeWhile(_._2 <= budget).map(_._1).toSet
    assert(seeded == expect7)
  }

  test("splitByHash: partition of the corpus, rerun- and layout-stable") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def splits(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        Corpus.splitByHash(col("text"), fracs)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = splits(docs)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.size == docs.count(), "split must cover every row")
    assert(a == splits(docs.repartition(13)), "layout-dependent split")
    // fractions roughly honored (md5 uniformity; 500 docs → loose band)
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // degenerate and invalid fraction lists rejected
    intercept[IllegalArgumentException] {
      Corpus.splitByHash(col("text"), Seq("a" -> 0.5))
    }
  }

  test("buildVocab: deterministic rank by (count desc, word asc)") {
    val docs = Seq(
      (1L, "b b b a a c"), (2L, "a c d"), (3L, "B A")
    ).toDF("doc_id", "text")
    val v = Corpus.buildVocab(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // counts: a=4, b=4, c=2, d=1 → a beats b on the word tie-break
    assert(v.toSeq == Seq(("a", 4L, 1L), ("b", 4L, 2L), ("c", 2L, 3L)))
  }

  test("encodeTokens: order preserved, OOV → 0, rerun-stable") {
    val docs = Seq(
      (1L, "b a zzz b"), (2L, "c a"), (3L, "")
    ).toDF("doc_id", "text")
    val vocab = Corpus.buildVocab(docs, "text", 3)
    def enc() = Corpus.encodeTokens(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val e = enc()
    // counts: a=2, b=2, c=1, ""=1 → vocab a=1, b=2, plus one of ("", c)
    assert(e(1L).take(2) == List(2L, 1L) && e(1L)(2) == 0L
      && e(1L)(3) == 2L, s"doc1 encoded ${e(1L)}")
    // vocab cut: the count-1 tie goes to "" (word asc), so doc2's c is OOV
    assert(e(2L) == List(0L, 1L), s"doc2 encoded ${e(2L)}")
    assert(e(3L).length == 1) // empty text → single empty-string token
    assert(enc() == e, "not rerun-stable")
  }

  test("rebalanceTemperature: α endpoints recover explicit mixtures") {
    val df = (1 to 400).map(i => (i.toLong, s"big doc $i", "big")) ++
      (1 to 100).map(i => (500L + i, s"small doc $i", "small"))
    val docs = df.toDF("doc_id", "text", "lang")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    // α = 1: weights ∝ n_g — identical to the natural-proportion mixture
    val natural = ids(Corpus.rebalanceMixture(docs, "lang", col("text"),
      Map("big" -> 0.8, "small" -> 0.2), 200))
    assert(ids(Corpus.rebalanceTemperature(docs, "lang", col("text"),
      alpha = 1.0, targetTotal = 200)) == natural)
    // α = 0: every group weighs the same — identical to the uniform mix
    val uniform = ids(Corpus.rebalanceMixture(docs, "lang", col("text"),
      Map("big" -> 0.5, "small" -> 0.5), 200))
    val equalized = ids(Corpus.rebalanceTemperature(docs, "lang", col("text"),
      alpha = 0.0, targetTotal = 200))
    assert(equalized == uniform)
    // α = 0 keeps ALL of the small group (rate 100/100 ≥ 1) and
    // downsamples the big one — the up-weight-the-tail point
    val eqLangs = Corpus.rebalanceTemperature(docs, "lang", col("text"),
        alpha = 0.0, targetTotal = 200)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eqLangs("small") == 100L)
    assert(eqLangs("big") < 400L)
    intercept[IllegalArgumentException] {
      Corpus.rebalanceTemperature(docs, "lang", col("text"), 1.5, 100)
    }
    // maxGroups fail-fast: keying on a corpus-cardinality column must
    // throw the named contract, not pull the count table on the driver
    val e = intercept[IllegalArgumentException] {
      Corpus.rebalanceTemperature(docs, "doc_id", col("text"),
        alpha = 0.5, targetTotal = 200, maxGroups = 10)
    }
    assert(e.getMessage.contains("more than 10 groups"))
  }

  test("scrubSpans: buffered windows cut, nearby hits merge to one span, " +
      "full containment empties the doc, clean docs pass through") {
    val docs = Seq(
      (1L, "w0 w1 w2 SECRET EVAL GRAM w6 w7 w8 w9 w10 w11"),
      (2L, "clean words only nothing shared here at all"),
      (3L, "SECRET EVAL GRAM"), // ≤ n words: whole-text window rule
      (4L, "a b SECRET EVAL GRAM c d SECRET EVAL GRAM e f g h")
    ).toDF("doc_id", "text")
    val bench = Seq("SECRET EVAL GRAM plus trailing context").toDF("btext")
    val out = graft.operators.Contamination
      .scrubSpans(docs, "doc_id", "text", bench, "btext", n = 3, buffer = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: hit at p=3 → span [1,7] → words 1..7 cut
    assert(out(1L) == (("w0 w8 w9 w10 w11", 7L, 1L)))
    // doc 2: clean → normalized text unchanged, zero spans
    assert(out(2L) == (("clean words only nothing shared here at all", 0L, 0L)))
    // doc 3: the whole doc IS the gram → scrubbed to empty
    assert(out(3L) == (("", 3L, 1L)))
    // doc 4: hits at p=2 and p=7, 5 apart ≤ n+2b=7 → ONE merged span
    // [0,11]; only the tail survives
    assert(out(4L) == (("g h", 12L, 1L)))
    // broadcast size guard: over the hit-doc cap the span side falls
    // back to a plain shuffled join — same rows, no driver-sized
    // broadcast of a corpus-scale span list
    val shuffled = graft.operators.Contamination
      .scrubSpans(docs, "doc_id", "text", bench, "btext", n = 3,
        buffer = 2, broadcastMaxHitDocs = 0L)
    assert(shuffled.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap == out)
  }

  test("gopher_features/gopher_keep: hand-computed word- and line-shape " +
      "features; each rule vetoes independently") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),              // clean single line
      (2L, "one two\none two\n- bullet item"),     // dup line + bullet
      (3L, "look here...\nmore text…"),            // both ellipsis forms
      (4L, "# # tag"),                             // symbols, non-alpha words
      (5L, "")                                     // empty
    ).toDF("doc_id", "text")
    val f = Text.gopher_features(col("text"))
    val out = docs.select(col("doc_id"), f.as("f")).select(col("doc_id"),
        col("f.n_words"), col("f.mean_word_len"), col("f.alpha_word_frac"),
        col("f.symbol_word_ratio"), col("f.bullet_line_frac"),
        col("f.ellipsis_line_frac"), col("f.dup_line_frac"),
        col("f.dup_line_char_frac"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // doc 1: 4 words, (5+4+5+5)/4 = 4.75 mean, all alpha, no symbols
    assert(out(1L) == Seq(4L, 4.75, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    // doc 2: 3 lines, one dup pair → dup_line_frac 1-2/3; char frac:
    // lines 7+7+13=27 chars, distinct 7+13=20 → 7/27
    assert(out(2L)(4) == 0.3333 && out(2L)(6) == 0.3333)
    assert(out(2L)(7) == 0.2593)
    // doc 3: '...' counts once via 3-char removal, '…' once; both lines
    // ellipsis-terminated
    assert(out(3L)(3) == 0.5 && out(3L)(5) == 1.0)
    // doc 4: two '#' symbols over 3 words; 2 of 3 words non-alpha
    assert(out(4L)(3) == 0.6667 && out(4L)(2) == 0.3333)
    // doc 5: all-zero features, 1 implicit empty line
    assert(out(5L) == Seq(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    // keep: doc 1 passes every rule except the 50-word default floor;
    // with the floor at 1 it survives, the others each trip a rule
    val kept = docs.select(col("doc_id"), f.as("f"))
      .filter(Text.gopher_keep(col("f"), minWords = 1, minMeanWordLen = 1.0))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("paragraph_dup_features/gopher_para_keep: hand-computed " +
      "paragraph-repetition fractions; frac and char-frac rules trip " +
      "independently") {
    val docs = Seq(
      (1L, "alpha beta\n\ngamma delta"),             // clean: 2 distinct
      (2L, "one two\n\none two\n\nthree"),           // dup pair of 3
      // 4 paras, dup frac 0.25 (passes 0.30) but the duplicated LONG
      // para owns most chars → char rule fails alone
      (3L, "a long duplicated paragraph\n\nx\n\ny\n\na long duplicated paragraph"),
      (4L, "")                                       // split("") = [""]
    ).toDF("doc_id", "text")
    val f = Text.paragraph_dup_features(col("text"))
    val out = docs.select(col("doc_id"), f.as("f")).select(col("doc_id"),
        col("f.n_paras"), col("f.dup_para_frac"),
        col("f.dup_para_char_frac"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(out(1L) == Seq(2L, 0.0, 0.0))
    // doc 2: 1 - 2/3; chars 7+7+5=19, distinct 12 → 7/19
    assert(out(2L) == Seq(3L, 0.3333, 0.3684))
    // doc 3: 1 - 3/4 = 0.25; chars 27+1+1+27=56, distinct 29 → 27/56
    assert(out(3L) == Seq(4L, 0.25, 0.4821))
    // doc 4: one implicit empty paragraph, zero fractions
    assert(out(4L) == Seq(1L, 0.0, 0.0))
    val kept = docs.select(col("doc_id"), f.as("f"))
      .filter(Text.gopher_para_keep(col("f")))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L)) // 2 fails frac; 3 fails char-frac only
  }

  test("scriptFractions: fractions, canonical-order dominant tie-break, " +
      "letterless → none") {
    import graft.plans.TextExpressions.script_counts
    val docs = Seq(
      (1L, "Hello world"),       // pure latin
      (2L, "привет миру ab"),    // cyrillic-dominant, mixed
      (3L, "ab αβ"),             // 2-2 tie → latin (earlier bucket)
      (4L, "中文 한국"),          // 2-2 tie → han (earlier bucket)
      (5L, "123 --")             // no letters
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), script_counts(col("text")).as("c"))
      .select(col("doc_id"), Text.scriptFractions(col("c")).as("f"))
      .select(col("doc_id"), col("f.n_letters"), col("f.latin_frac"),
        col("f.cyrillic_frac"), col("f.dominant"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(out(1L) == Seq(10L, 1.0, 0.0, "latin"))
    assert(out(2L) == Seq(12L, 0.1667, 0.8333, "cyrillic"))
    assert(out(3L) == Seq(4L, 0.5, 0.0, "latin"))
    assert(out(4L)(3) == "han")
    assert(out(5L) == Seq(0L, 0.0, 0.0, "none"))
  }

  test("topDuplicatedUnits: occurrence vs doc counts, minCount floor, " +
      "count-then-unit ordering, k cut") {
    val docs = Seq(
      (1L, "x\ny\nx"),   // x twice in one doc
      (2L, "x\nz"),
      (3L, "z\nw")
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .topDuplicatedUnits(docs, "doc_id", col("text"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // x: 3 occurrences across 2 docs; z: 2/2; y,w floored out (count 1)
    assert(out.toSeq == Seq(("x", 3L, 2L), ("z", 2L, 2L)))
    val top1 = graft.operators.Corpus
      .topDuplicatedUnits(docs, "doc_id", col("text"), k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("x"))
  }

  test("vocabCoverage: cumulative fractions by rank, tie order, k cut, " +
      "last-row sanity") {
    // tokens: a×4, b×2, c×2, d×1, e×1 → total 10
    val docs = Seq((1L, "a a b c d"), (2L, "a a b c e")).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .vocabCoverage(docs, "text", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // rank order (n desc, word asc); d/e tie at 1 → d enters at k=4
    assert(out.toSeq == Seq(
      ("a", 4L, 1L, 0.4), ("b", 2L, 2L, 0.6),
      ("c", 2L, 3L, 0.8), ("d", 1L, 4L, 0.9)))
    // full vocab covers everything
    val full = graft.operators.Corpus.vocabCoverage(docs, "text", 10)
      .collect()
    assert(full.last.getDouble(3) == 1.0 && full.length == 5)
  }

  test("code_features/code_like: structural fractions; each signal " +
      "routes independently; prose stays prose") {
    val docs = Seq(
      (1L, "def f(x) {\n    return x;\n}"),       // braces + indent
      (2L, "plain prose line\nanother line"),     // nothing
      (3L, "\tindented line\n\tmore indent\nx"),  // tabs only
      (4L, "a=b;c=d;e=f[0];")                     // minified: symbols
    ).toDF("doc_id", "text")
    val f = Text.code_features(col("text"))
    val out = docs.select(col("doc_id"), f.as("f"))
      .select(col("doc_id"), col("f.brace_line_frac"),
        col("f.indent_line_frac"), col("f.symbol_char_frac"),
        Text.code_like(col("f")).as("c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4)))).toMap
    assert(out(1L) == ((1.0, 0.3333, 0.1923, true)))
    assert(out(2L) == ((0.0, 0.0, 0.0, false)))
    assert(out(3L)._2 == 0.6667 && out(3L)._4)
    // doc 4: one line, ';' counts as brace-punct; 8 of 15 chars are
    // code symbols (= ; [ ])
    assert(out(4L)._1 == 1.0 && out(4L)._3 == 0.5333 && out(4L)._4)
  }

  test("unitLangProfile: per-unit votes, dominance fraction, und " +
      "fallback, tie toward the larger code") {
    val docs = Seq(
      (1L, "the cat is here\nel que la de los\nthe sun is to rise"),
      (2L, "le chat et la vie\nqwerty asdf"),  // fr 1, und 1 → tie: und
      (3L, "zz yy\nxx ww\nvv uu"),             // all und
      (4L, "der hund und das ist")             // single de unit
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .unitLangProfile(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, "en", 0.6667)))
    assert(out(2L) == ((2L, "und", 0.5)))
    assert(out(3L) == ((3L, "und", 1.0)))
    assert(out(4L) == ((1L, "de", 1.0)))
  }

  test("html_to_text: blocks drop, breaks become newlines, entities " +
      "decode after the tag strip, whitespace canonicalizes") {
    val html =
      """<!DOCTYPE html><html><head><style>p { color: red }</style>""" +
        """<script type="text/js">if (1 < 2) { x("</b>"); }</script>""" +
        """<title>T</title></head><body><h1>Head</h1>""" +
        """<p>alpha <b>beta</b>&nbsp;gamma &amp;lt; &quot;q&#39;s&quot;</p>""" +
        """<div>one<br/>two<br >three</div>""" +
        """<ul><li>item A.</li><li>item B.</li></ul></body></html>"""
    val out = Seq(html).toDF("h")
      .select(Text.html_to_text(col("h")).as("t")).head.getString(0)
    // script content (with its embedded quote/brace/tag text) and style
    // are gone wholesale; <title> strips as a tag, its text survives
    assert(!out.contains("color") && !out.contains("x(") &&
      !out.contains("{"))
    assert(out.startsWith("T Head\n")) // </title> strips to a space; </h1> breaks
    // inline <b> strips to a space: words never glue
    assert(out.contains("alpha beta gamma"))
    // &amp; decodes LAST: "&amp;lt;" is the TEXT "&lt;", not "<"
    assert(out.contains("&lt; \"q's\""))
    // <br> variants and </li>/</div>/</h1> all break lines
    assert(out.contains("one\ntwo\nthree"))
    assert(out.contains("item A.\nitem B."))
    // no leading/trailing whitespace, no 3+ newline runs
    assert(out == out.trim && !out.contains("\n\n\n"))
    // plain text passes through untouched modulo whitespace rules
    val plain = Seq("already plain text.").toDF("h")
      .select(Text.html_to_text(col("h"))).head.getString(0)
    assert(plain == "already plain text.")
  }

  test("c4FilterLines: each rule drops its line, doc gate drops docs, " +
      "kept lines keep original bytes and order") {
    val docs = Seq(
      (1L, "A good first sentence here.\nno\nall lowercase but long enough\n" +
        "Please enable JavaScript to view.\nbad { brace } line here.\n" +
        "And a good closer!"),
      (2L, "Only one good line survives here.\ntoo short."),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Corpus.c4FilterLines(docs, "text", "doc_id",
        minWordsPerLine = 3, minKeptLines = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: six lines; "no" (words), "all lowercase…" (punct),
    // "…JavaScript…" (deny, case-insensitive), "{" each drop exactly one
    assert(out(1L) ==
      (("A good first sentence here.\nAnd a good closer!", 2L, 4L)))
    // doc 2 keeps 1 line < minKeptLines → dropped; doc 3 empty → dropped
    assert(!out.contains(2L) && !out.contains(3L))
    // minKeptLines = 0 keeps even fully-stripped docs
    val lax = Corpus.c4FilterLines(docs, "text", "doc_id",
      minWordsPerLine = 3, minKeptLines = 0)
    assert(lax.count() == 3L)
    assert(lax.filter(col("doc_id") === 3L).head.getString(1) == "")
  }

  test("repetition_ngram_features: hand-computed Gopher n-gram fractions") {
    val df = Seq(
      (1L, "a b a b a"),
      (2L, "x y x y x y x y"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val f = Text.repetition_ngram_features(col("text"))
    val out = df.select(col("doc_id"),
        f.getField("top_2gram_char_frac").as("t2"),
        f.getField("top_3gram_char_frac").as("t3"),
        f.getField("top_4gram_char_frac").as("t4"),
        f.getField("dup_5gram_char_frac").as("d5"),
        f.getField("dup_6gram_char_frac").as("d6"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // text-char units (W = word chars): doc 1 "a b a b a", W=5.
    // 2-grams {a b:2, b a:2} tie → "a b" (codepoint asc), 2·2/5;
    // 3-grams {a b a:2, b a b:1} → 2·3/5 (>1: overlapping
    // occurrences, the published numerator); 4-grams tie at c=1 →
    // 1·4/5; one 5-gram → no dup; <6 words → 0
    assert(out(1L) == ((0.8, 1.2, 0.8, 0.0, 0.0)))
    // doc 2: every 5-gram appears twice → coverage = all 8 words;
    // 6-grams "x y x y x y" repeats at 0 and 2 → coverage 0..7 = 1.0
    assert(out(2L)._4 == 1.0 && out(2L)._5 == 1.0)
    assert(out(3L) == ((0.0, 0.0, 0.0, 0.0, 0.0)))
    // table-A1 gate: repetitive docs fail, the clean one passes
    val keep = df.select(col("doc_id"),
        Text.repetition_ngram_keep(f).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep == Map(1L -> false, 2L -> false, 3L -> true))
    // NULL text ≡ empty text: all-zero features, keep=true — the
    // null-safe kernel alone returned a NULL struct and silently
    // flipped the gate to a drop
    val nt = Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val fr = Text.repetition_ngram_features(col("text"))
    val row = nt.select(fr.getField("top_2gram_char_frac").as("t2"),
        Text.repetition_ngram_keep(fr).as("k")).head()
    assert(row.getDouble(0) == 0.0 && row.getBoolean(1))
  }

  test("dedupSubstrings: repeated >=k-word runs survive only at the " +
      "globally first site; arbitrary offsets, island merge, " +
      "within-doc repeats, short docs exempt") {
    val k = 3
    val docs = Seq(
      // doc 1: the canonical copy of "p q r s" (its 3-grams "p q r",
      // "q r s" are first here)
      (1L, "a b p q r s c d"),
      // doc 2: same run at a DIFFERENT offset mid-text → cut from
      // doc 2 only (paragraph dedup would never align these)
      (2L, "x y z p q r s w"),
      // doc 3: within-doc repetition — "m n o" twice, second cut
      (3L, "m n o t u m n o"),
      // doc 4: shorter than k → exempt even though "p q" repeats
      (4L, "p q"),
      // doc 5: clean
      (5L, "e f g h i j")
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .dedupSubstrings(docs, "text", "doc_id", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a b p q r s c d", 0L, 0L)))
    // doc 2: non-first anchors at p=3 ("p q r") and p=4 ("q r s")
    // merge into one island → span [3, 6] → "p q r s" cut
    assert(out(2L) == (("x y z w", 4L, 1L)))
    // doc 3: anchor "m n o" repeats at p=0 and p=5; p=5 is non-first
    // → span [5, 7]
    assert(out(3L) == (("m n o t u", 3L, 1L)))
    assert(out(4L) == (("p q", 0L, 0L)))
    assert(out(5L) == (("e f g h i j", 0L, 0L)))
    // k >= 2 contract
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.dedupSubstrings(docs, "text", "doc_id", k = 1)
    }
  }

  test("dedupSubstringsAgainstIndex: historical runs strip wholesale, " +
      "in-batch repeats keep first, novel text passes") {
    val k = 3
    val history = Seq((1L, "a b p q r s c d")).toDF("doc_id", "text")
    val idx = graft.operators.Corpus
      .substringAnchorIndex(history, "text", "doc_id", k)
    val batch = Seq(
      // historical run "p q r s" at a new offset → cut via the index
      (10L, "x y p q r s w"),
      // in-batch within-doc repeat — second "m n o" cut via keep-first
      (11L, "m n o t u m n o"),
      (12L, "fresh words only here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .dedupSubstringsAgainstIndex(batch, idx, "text", "doc_id", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == (("x y w", 4L, 1L)))
    assert(out(11L) == (("m n o t u", 3L, 1L)))
    assert(out(12L) == (("fresh words only here", 0L, 0L)))
    // malformed index fails the named contract
    val e = intercept[IllegalArgumentException] {
      graft.operators.Corpus.dedupSubstringsAgainstIndex(
        batch, history, "text", "doc_id", k)
    }
    assert(e.getMessage.contains("substringAnchorIndex"))
  }

  test("dedupSubstringsAgainstIndexBloom: sidecar path row-identical " +
      "to the plain probe; null sidecar degenerates to in-batch dedup") {
    val k = 3
    val history = Seq((1L, "a b p q r s c d")).toDF("doc_id", "text")
    val idx = graft.operators.Corpus
      .substringAnchorIndex(history, "text", "doc_id", k)
    val batch = Seq(
      (10L, "x y p q r s w"),
      (11L, "m n o t u m n o"),
      (12L, "fresh words only here")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val plain = rows(graft.operators.Corpus
      .dedupSubstringsAgainstIndex(batch, idx, "text", "doc_id", k))
    for (fpp <- Seq(0.5, 0.01)) { // high fpp forces real index probes
      val bloom = graft.operators.Corpus.substringIndexBloom(idx, fpp)
      assert(bloom != null)
      val sidecar = rows(graft.operators.Corpus
        .dedupSubstringsAgainstIndexBloom(
          batch, idx, "text", "doc_id", bloom, k))
      assert(sidecar == plain, s"fpp=$fpp")
      // oversized sliver → the shuffled semi/anti fallback, same rows
      val fallback = rows(graft.operators.Corpus
        .dedupSubstringsAgainstIndexBloom(
          batch, idx, "text", "doc_id", bloom, k,
          maxSliverAnchors = 0L))
      assert(fallback == plain, s"fallback fpp=$fpp")
    }
    // empty index → null sidecar → one-shot in-batch dedupSubstrings
    val emptyIdx = idx.filter(lit(false))
    assert(graft.operators.Corpus.substringIndexBloom(emptyIdx) == null)
    val degenerate = rows(graft.operators.Corpus
      .dedupSubstringsAgainstIndexBloom(
        batch, emptyIdx, "text", "doc_id", null, k))
    val oneShot = rows(graft.operators.Corpus
      .dedupSubstrings(batch, "text", "doc_id", k))
    assert(degenerate == oneShot)
    // historical "p q r s" survives: history isn't in the batch
    assert(degenerate.find(_._1 == 10L).get._2 == "x y p q r s w")
  }

  test("filterFlaggedWords: word-boundary match, case-folded list, " +
      "null text passes, empty list refused") {
    val docs = Seq(
      (1L, "the cat sat"),            // flagged word → dropped
      (2L, "concatenate the results"),// substring only → KEPT
      (3L, "CAT, loud."),             // case + punctuation boundary → dropped
      (4L, "don't panic"),            // apostrophe-internal token → dropped
      (5L, null.asInstanceOf[String]) // null text → kept (pass-through)
    ).toDF("doc_id", "text")
    val kept = Corpus.filterFlaggedWords(docs, "text",
        Seq("Cat", "DON'T"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 5L))
    intercept[IllegalArgumentException] {
      Corpus.filterFlaggedWords(docs, "text", Seq("  ", ""))
    }
  }

  test("filterDomainBlocklist: label-suffix semantics — subdomains " +
      "block, lookalike hosts and null URLs pass") {
    val docs = Seq(
      (1L, "https://a.b.example.com/x"),  // under example.com → dropped
      (2L, "https://example.com/y"),      // exact → dropped
      (3L, "https://notexample.com/z"),   // label boundary → KEPT
      (4L, "https://ok.org/w"),           // unlisted → kept
      (5L, null.asInstanceOf[String])     // null URL → kept
    ).toDF("doc_id", "url")
    val bl = Seq("example.com").toDF("domain")
    val kept = Corpus.filterDomainBlocklist(docs, "url", bl)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L, 5L))
    // empty blocklist: everything survives
    assert(Corpus.filterDomainBlocklist(docs, "url",
      bl.filter(lit(false))).count() == 5L)
    // a multi-column frame is not a blocklist
    intercept[IllegalArgumentException] {
      Corpus.filterDomainBlocklist(docs, "url", docs)
    }
  }

  test("nearDedupUnits: near-dup paragraphs keep the first (doc, pos) " +
      "member across docs; fully-deduped docs vanish") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high\nzebra lion"),
      // u1 near-dups doc 1's u1 (Jaccard 0.6), u2 exact-dups doc 1's u2
      (2L, "the quick brown fox jumps low\nzebra lion"),
      (3L, "completely different words here now\nanother unique paragraph")
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .nearDedupUnits(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "the quick brown fox jumps high\nzebra lion",
      3L -> "completely different words here now\nanother unique paragraph"))
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.nearDedupUnits(docs, "text", "doc_id",
        maxUnitsPerDoc = 0L)
    }
  }

  test("dedupUnitsWithinDoc: first occurrence per doc, order kept, " +
      "no cross-doc effect, trailing empties survive the round-trip") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb"), // repeats collapse to first sighting
      (2L, "a\nb"),          // doc 1's dups must not touch doc 2
      (3L, "x\n\ny\n\nx"),   // empty lines dedup like any unit
      (4L, "a\nb\n")         // trailing empty unit: kept, not dropped
    ).toDF("doc_id", "text")
    val out = Corpus.dedupUnitsWithinDoc(docs, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) == (("a\nb\nc", 2L)))
    assert(out(2L) == (("a\nb", 0L)))
    assert(out(3L) == (("x\n\ny", 2L)))
    assert(out(4L) == (("a\nb\n", 0L)))
  }

  test("dedupKeepFirst keeps only the globally first unit occurrence") {
    val df = Seq(
      (1L, "alpha\nbeta"),
      (2L, "beta\ngamma"),            // beta first seen in doc 1 → strips
      (3L, "alpha\nbeta"),            // all units seen → doc vanishes
      (4L, "delta"),
      (5L, "epsilon\nzeta\nepsilon")  // in-doc repeat: pos 2 strips too
    ).toDF("doc_id", "text")
    val out = Corpus.dedupKeepFirst(df, "text", "doc_id", "\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha\nbeta",
      2L -> "gamma",
      4L -> "delta",
      5L -> "epsilon\nzeta"))
  }

  test("dedupKeepFirstAgainstIndex: index hits strip, batch keeps " +
      "first occurrences, corpus text never joins") {
    val corpus = Seq((1L, "alpha\nbeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "beta\ngamma\ngamma"), // beta in index; 2nd gamma in-batch dup
      (11L, "gamma\ndelta"),       // gamma first seen at (10, 1)
      (12L, "alpha\nbeta")         // all indexed → doc vanishes
    ).toDF("doc_id", "text")
    val idx = Corpus.unitIndex(corpus, "text", "doc_id")
    assert(idx.columns.toSeq == Seq("ufp"))
    val out = Corpus
      .dedupKeepFirstAgainstIndex(batch, idx, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "gamma", 11L -> "delta"))
    // malformed index fails loudly, not silently wrong
    intercept[IllegalArgumentException] {
      Corpus.dedupKeepFirstAgainstIndex(batch,
        corpus.select(col("text")), "text", "doc_id")
    }
  }

  test("dedupKeepFirstAgainstIndexBloom: sidecar row-identical to " +
      "the plain probe at any fpp; null sidecar = in-batch keep-first") {
    val corpus = Seq((1L, "alpha\nbeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "beta\ngamma\ngamma"),
      (11L, "gamma\ndelta"),
      (12L, "alpha\nbeta")
    ).toDF("doc_id", "text")
    val idx = Corpus.unitIndex(corpus, "text", "doc_id")
    def out(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = out(Corpus
      .dedupKeepFirstAgainstIndex(batch, idx, "text", "doc_id"))
    for (fpp <- Seq(0.5, 0.01)) { // high fpp forces real index probes
      val bloom = Corpus.unitIndexBloom(idx, fpp)
      assert(bloom != null)
      assert(out(Corpus.dedupKeepFirstAgainstIndexBloom(
        batch, idx, "text", "doc_id", bloom)) == plain, s"fpp=$fpp")
      // oversized sliver → the shuffled anti-join fallback, same rows
      assert(out(Corpus.dedupKeepFirstAgainstIndexBloom(
        batch, idx, "text", "doc_id", bloom,
        maxSliverUnits = 0L)) == plain, s"fallback fpp=$fpp")
    }
    // empty index → null sidecar → plain in-batch keep-first
    val emptyIdx = idx.filter(lit(false))
    assert(Corpus.unitIndexBloom(emptyIdx) == null)
    assert(out(Corpus.dedupKeepFirstAgainstIndexBloom(
        batch, emptyIdx, "text", "doc_id", null)) ==
      out(Corpus.dedupKeepFirst(batch, "text", "doc_id")))
  }

  test("perplexityBuckets cuts exact per-group terciles, ranked by lp") {
    // en: c(a)=5, c(q)=4 over T=18 → doc 1 (all common) > 2 (mixed) >
    // 3 (all rare); fr mirrors with b/z. Each lang n=3 → one doc per
    // bucket. de: two IDENTICAL docs → rounded-lp tie breaks by id.
    val df = Seq(
      (1L, "en", "a a a"), (2L, "en", "a a q"), (3L, "en", "q q q"),
      (4L, "fr", "b b b"), (5L, "fr", "b b z"), (6L, "fr", "z z z"),
      (7L, "de", "x x"), (8L, "de", "x x")
    ).toDF("doc_id", "lang", "text")
    val out = Corpus.perplexityBuckets(df, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((0L, "head")) && out(2L) == ((1L, "middle")) &&
      out(3L) == ((2L, "tail")))
    assert(out(4L) == ((0L, "head")) && out(5L) == ((1L, "middle")) &&
      out(6L) == ((2L, "tail")))
    // n=2, buckets=3: ranks 1,2 → buckets 0,1 (floor(3(r-1)/n))
    assert(out(7L) == ((0L, "head")) && out(8L) == ((1L, "middle")))
    // dimension-bound guard fails fast rather than collecting unbounded
    intercept[IllegalArgumentException] {
      Corpus.perplexityBuckets(df, "doc_id", "text", "lang",
        maxGroups = 2)
    }
    // null group → named contract failure, not a driver NPE (the
    // offsets join would otherwise silently drop the docs)
    val withNull = df.withColumn("lang",
      when(col("doc_id") === 1L, null).otherwise(col("lang")))
    val e = intercept[IllegalArgumentException] {
      Corpus.perplexityBuckets(withNull, "doc_id", "text", "lang")
    }
    assert(e.getMessage.contains("non-null"))
    // non-string group columns are rejected up front
    intercept[IllegalArgumentException] {
      Corpus.perplexityBuckets(df.withColumn("lang", lit(7)),
        "doc_id", "text", "lang")
    }
  }

  test("filterFlaggedWords: phrase entries match word-boundary-exact " +
      "token sequences; non-token entries throw instead of going inert") {
    val docs = Seq(
      (1L, "some lorem ipsum filler"),     // phrase hit → dropped
      (2L, "Lorem, Ipsum! shouting"),      // case+punct tokenize same → dropped
      (3L, "lorem thoughts on ipsum"),     // words apart → KEPT
      (4L, "breathe catalog entries"),     // substring of phrase only → KEPT
      (5L, "the cat sat")                  // phrase at row start → dropped
    ).toDF("doc_id", "text")
    val kept = Corpus.filterFlaggedWords(docs, "text",
        Seq("Lorem-Ipsum", "the cat"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L))
    val ex = intercept[IllegalArgumentException] {
      Corpus.filterFlaggedWords(docs, "text", Seq("ok", "!!!"))
    }
    assert(ex.getMessage.contains("!!!"),
      s"the inert entry must be named: ${ex.getMessage}")
  }

  test("nearDedupUnits: non-integral id type refused; out-of-contract " +
      "id/pos values fail loudly instead of corrupting keep-first") {
    val ok = Seq((1L, "aa bb cc dd\nee ff gg hh"),
      (2L, "aa bb cc dd\nii jj kk ll")).toDF("doc_id", "text")
    // sanity: the guarded projection still dedups (shared first unit
    // survives only in doc 1)
    val out = Corpus.nearDedupUnits(ok, "text", "doc_id",
        threshold = 0.9, shingleWords = 2, exactCandidates = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "aa bb cc dd\nee ff gg hh")
    assert(out(2L) == "ii jj kk ll")
    // string ids: the stride arithmetic would double-cast silently
    val strIds = Seq(("a", "x y")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Corpus.nearDedupUnits(strIds, "text", "doc_id")
    }
    assert(ex.getMessage.contains("integral"))
    // a doc past maxUnitsPerDoc collides uids into its neighbor —
    // must throw (raise_error), not silently mis-rank
    val wide = Seq((1L, "u0\nu1\nu2")).toDF("doc_id", "text")
    val ex2 = intercept[Exception] {
      Corpus.nearDedupUnits(wide, "text", "doc_id",
        maxUnitsPerDoc = 2L).collect()
    }
    assert(ex2.getMessage.contains("maxUnitsPerDoc"),
      s"got: ${ex2.getMessage}")
    // negative ids break the (id, pos) order encoding
    val neg = Seq((-1L, "x y")).toDF("doc_id", "text")
    val ex3 = intercept[Exception] {
      Corpus.nearDedupUnits(neg, "text", "doc_id").collect()
    }
    assert(ex3.getMessage.contains("maxUnitsPerDoc"))
  }
}
