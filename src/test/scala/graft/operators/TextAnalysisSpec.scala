package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextAnalysisSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private def over(text: String)(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c($"t")).head.get(0)

  test("tokenCount counts whitespace tokens") {
    over("the quick brown fox")(TextAnalysis.tokenCount) shouldBe 4L
  }

  test("regexTokenCount: letter runs, digit runs, single punct") {
    // "ab12, cd" -> ab | 12 | , | cd
    over("ab12, cd")(TextAnalysis.regexTokenCount) shouldBe 4L
  }

  test("shingles produces distinct k-grams; short docs yield empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles($"t", 3)).head.getSeq[String](0)
    sh should contain theSameElementsAs Seq("a b c", "b c d")
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles($"t", 3)).head.getSeq[String](0)
    short shouldBe empty
  }

  test("punctRatio and stopwordRatio") {
    over("ab,!")(TextAnalysis.punctRatio) shouldBe 0.5
    over("the fox and hen run")(TextAnalysis.stopwordRatio) shouldBe 0.4
    over("")(TextAnalysis.stopwordRatio) shouldBe 0.0
  }

  test("meanWordLen") {
    over("ab cdef")(TextAnalysis.meanWordLen) shouldBe 3.0
  }

  test("qualityScore composes its three bands") {
    // long enough, no punct, stopword ratio in range -> 1.0
    over("the quick brown fox jumps over it")(TextAnalysis.qualityScore) shouldBe 1.0
    // too short (< 20 chars), no punct, no stopwords -> 0.3
    over("abcd efgh")(TextAnalysis.qualityScore) shouldBe 0.3
  }

  test("langId argmax with deterministic tie preference") {
    over("the cat and the dog is here")(TextAnalysis.langId) shouldBe "en"
    over("el gato de la casa que")(TextAnalysis.langId) shouldBe "es"
    over("der hund und die katze das")(TextAnalysis.langId) shouldBe "de"
    over("xyz")(TextAnalysis.langId) shouldBe "en" // all-zero tie -> first listed
  }

  test("fingerprint is normalization-invariant") {
    val fps = Seq("Hello,  World!", "hello world").toDF("t")
      .select(TextAnalysis.fingerprint($"t")).collect().map(_.getString(0))
    fps(0) shouldBe fps(1)
  }

  test("profile runs over the synthetic documents table") {
    val df = TextAnalysis.profile(graft.Tables.documents(spark, sf0001))
    df.columns should contain allOf ("doc_id", "n_tokens", "quality_score", "lang_pred")
    df.count() shouldBe 500L
  }

  test("profile: fused single-tokenize pass equals the composed kernel columns") {
    val docs = graft.Tables.documents(spark, sf0001)
    val fused = TextAnalysis.profile(docs)
    val composed = TextAnalysis.profileComposed(docs)
    fused.schema.map(f => (f.name, f.dataType)) shouldBe
      composed.schema.map(f => (f.name, f.dataType))
    fused.exceptAll(composed).count() shouldBe 0L
    composed.exceptAll(fused).count() shouldBe 0L
  }

  test("profile: native byte-walk kernel matches composed kernels on adversarial inputs") {
    // edges the corpus never exercises: empty text, leading/trailing/run
    // spaces (empty tokens), a token hitting TWO language lists ("la" is
    // es AND fr), multi-byte UTF-8 (each non-ASCII code point is one
    // punct char and one regex token), digit/letter run boundaries,
    // tabs/newlines (punct, NOT token separators)
    val edge = Seq(
      (1L, ""), (2L, " "), (3L, "  a  b "), (4L, "la la the"),
      (5L, "héllo wörld 日本語 test"), (6L, "ab12cd 3.14, x!y"),
      (7L, "a\tb\nc d"), (8L, "the quick brown fox and the lazy dog is in"),
      (9L, "el que de la"), (10L, "de5 shi4 le5 zai4 der die und das"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val fused = TextAnalysis.profile(edge)
    val composed = TextAnalysis.profileComposed(edge)
    fused.exceptAll(composed).count() shouldBe 0L
    composed.exceptAll(fused).count() shouldBe 0L
  }

  test("qualityModelScore: hand-computed hashed-linear sigmoid; deterministic") {
    // replicate the derivation outside Spark: distinct token hashes →
    // bucket → integer weight → mean/1000 → sigmoid, rounded to 6
    def h31(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      val h32 = d.take(4).foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))
      h32 % 2147483647L
    }
    val text = "the quick brown fox the"
    val toks = text.split(" ").map(h31).distinct // "the" collapses
    toks.length shouldBe 4
    val s = toks.map(h => TextAnalysis.QualityModelWeights((h % 256).toInt)).sum
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-(s.toDouble / (1000.0 * toks.length)))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    over(text)(TextAnalysis.qualityModelScore) shouldBe expected
    over(text)(TextAnalysis.qualityModelScore) shouldBe expected // stable
  }

  test("qualityModelScore stays in (0, 1) over the documents table") {
    val scores = graft.Tables.documents(spark, sf0001)
      .select(TextAnalysis.qualityModelScore($"text").as("s"))
      .agg(min($"s"), max($"s")).head()
    scores.getDouble(0) should be > 0.0
    scores.getDouble(1) should be < 1.0
  }

  test("vocabCoverage: hand-computed ranks, counts and cumulative shares") {
    val docs = Seq((1L, "a b a c"), (2L, "a b d")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1, d=1 (total 7); ties break token-asc
    val got = TextAnalysis.vocabCoverage(docs, topK = 3)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    got shouldBe Array(
      (1L, "a", 3L, BigDecimal(3.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (2L, "b", 2L, BigDecimal(5.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (3L, "c", 1L, BigDecimal(6.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("tokenEncode: rank ids by count desc/token asc, OOV to 0, empty tokens kept") {
    val docs = Seq((1L, "a b a c"), (2L, "a b d"), (3L, "a  b")).toDF("doc_id", "text")
    // counts: a=5, b=3, ""=1 (double space), c=1, d=1 → vocab(3) = a,b,""
    // (tie among "", c, d breaks token-asc: "" sorts first)
    val got = TextAnalysis.tokenEncode(docs, vocabSize = 3)
      .select($"doc_id", $"ids")
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    got shouldBe Array(
      (1L, Seq(1L, 2L, 1L, 0L)), // c is OOV
      (2L, Seq(1L, 2L, 0L)),     // d is OOV
      (3L, Seq(1L, 3L, 2L)))     // the empty middle token IS vocab id 3
    // vocab larger than the token universe: nothing is OOV
    TextAnalysis.tokenEncode(docs, vocabSize = 100)
      .select($"doc_id", $"ids")
      .as[(Long, Seq[Long])].collect().flatMap(_._2) should not contain 0L
    // driver-bound guard fails fast
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.tokenEncode(docs, vocabSize = 0)
  }

  test("repetitionStats: native kernel matches the composed HOF twin, incl. edges") {
    // edges: empty text, single word (< k), exact self-repeat ("a a a"
    // has "a a" twice), all-distinct grams, empty tokens from space runs,
    // and a doc whose top gram ties (either is fine — count, not gram,
    // is the output)
    val edge = Seq(
      (1L, ""), (2L, "solo"), (3L, "a a a"), (4L, "w x y z"),
      (5L, "  a  b "), (6L, "p q p q p q"), (7L, "m n m n o m n"))
      .toDF("doc_id", "text")
    val native = edge.select($"doc_id",
      TextAnalysis.repetitionStats($"text", 2).as("r")).orderBy($"doc_id")
    val composed = edge.select($"doc_id",
      TextAnalysis.repetitionStatsComposed($"text", 2).as("r")).orderBy($"doc_id")
    native.collect().map(_.toString) shouldBe composed.collect().map(_.toString)
    // hand-check one: "p q p q p q" has 5 2-grams, "p q" x3
    val r6 = native.filter($"doc_id" === 6L).select($"r.n_grams", $"r.top_count")
      .as[(Long, Long)].collect().head
    r6 shouldBe ((5L, 3L))
  }

  test("contamination: eval member fully contaminated, disjoint doc untouched") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),            // = eval doc
      (2L, "alpha beta gamma delta epsilon something else"),  // partial overlap
      (3L, "one two three four five six seven")               // disjoint
    ).toDF("doc_id", "text")
    val eval = train.filter($"doc_id" === 1L)
    val out = TextAnalysis.contamination(train, eval, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out(1L) shouldBe ((2L, 2L, 1.0)) // every 5-gram of the eval doc hits
    out(1L)._3 shouldBe 1.0
    out(2L)._1 shouldBe 1L // shares exactly "alpha beta gamma delta epsilon"
    out(3L) shouldBe ((0L, 3L, 0.0))
  }

  test("keywordSalience: hand-computed scores, corpus-frequent terms demoted, term tie-break") {
    val docs = Seq(
      (1L, "alpha alpha beta common"),
      (2L, "gamma common common"),
      (3L, "delta common")
    ).toDF("doc_id", "text")
    // N = 3; df: alpha 1, beta 1, gamma 1, delta 1, common 3
    // idf-rational: rare terms (3+1)/(1+1) = 2.0, common (3+1)/(3+1) = 1.0
    val out = TextAnalysis.keywordSalience(docs, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    out((1L, 1L)) shouldBe (("alpha", 2L, 4.0)) // tf 2 × 2.0
    out((1L, 2L)) shouldBe (("beta", 1L, 2.0))  // beats common (1.0) despite tf tie
    // gamma (1×2.0) ties common (2×1.0) at 2.0 — ascending term tie-break
    out((2L, 1L)) shouldBe (("common", 2L, 2.0))
    out((2L, 2L)) shouldBe (("gamma", 1L, 2.0))
    out((3L, 1L)) shouldBe (("delta", 1L, 2.0))
    out((3L, 2L)) shouldBe (("common", 1L, 1.0))
  }

  test("contaminationBloom matches exact contamination (false positives verified away)") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon nine ten eleven"),
      (3L, "one two three four five six seven"),
      (4L, "")
    ).toDF("doc_id", "text")
    val eval = train.filter($"doc_id" === 1L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    // smallBytes = 0 pins the bloom path: the size-adaptive default would
    // route this tiny eval slice to the exact join and test nothing
    canon(TextAnalysis.contaminationBloom(train, eval, k = 5, smallBytes = 0L)) shouldBe
      canon(TextAnalysis.contamination(train, eval, k = 5))
    // the adaptive default on a small eval delegates to the exact path —
    // same rows, so the switch is invisible to callers
    canon(TextAnalysis.contaminationBloom(train, eval, k = 5)) shouldBe
      canon(TextAnalysis.contamination(train, eval, k = 5))
    // empty eval set: no hits, but every train doc still reports its totals
    val none = TextAnalysis.contaminationBloom(train, train.filter($"doc_id" < 0), k = 5,
      smallBytes = 0L)
    none.collect().map(_.getLong(1)).sum shouldBe 0L
    none.count() shouldBe 3L // doc 4 has no 5-shingles at all
  }

  test("chunkWords: stride windows, short tail, sub-chunk doc yields one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b"),                                    // shorter than one chunk
      (3L, (1 to 8).map(i => s"w$i").mkString(" "))   // n == chunkSize+overlap boundary
    ).toDF("doc_id", "text")
    // chunkSize 4, overlap 2 -> stride 2; starts < n-2 (plus mandatory 0)
    val out = TextAnalysis.chunkWords(docs, chunkSize = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    // doc 1: starts 0,2,4,6 (start 8 adds no new word beyond the overlap)
    out((1L, 0L)) shouldBe ((4L, "w1 w2 w3 w4"))
    out((1L, 1L)) shouldBe ((4L, "w3 w4 w5 w6"))
    out((1L, 2L)) shouldBe ((4L, "w5 w6 w7 w8"))
    out((1L, 3L)) shouldBe ((4L, "w7 w8 w9 w10"))
    out.keys.count(_._1 == 1L) shouldBe 4
    // doc 2: one short chunk
    out((2L, 0L)) shouldBe ((2L, "a b"))
    out.keys.count(_._1 == 2L) shouldBe 1
    // doc 3 (8 words): starts 0,2,4 — start 6 would only re-cover the overlap
    out.keys.count(_._1 == 3L) shouldBe 3
    out((3L, 2L)) shouldBe ((4L, "w5 w6 w7 w8"))
    // coverage invariant: the chunks of each doc reproduce its full word set
    for ((docId, n) <- Seq(1L -> 10, 3L -> 8)) {
      val covered = out.collect { case ((d, _), (_, t)) if d == docId => t }
        .flatMap(_.split(" ")).toSet
      covered shouldBe (1 to n).map(i => s"w$i").toSet
    }
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.chunkWords(docs, chunkSize = 4, overlap = 4)
  }

  test("qualityThresholdSweep: retention counts over a hand-scored corpus") {
    // doc A scores 1.0 (all three bands), doc B scores 0.0 (too short,
    // high punct, no stopwords)
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (2L, "!!!")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityThresholdSweep(docs, gridSteps = 2)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ntA = 13L
    out(0.0) shouldBe ((2L, ntA + 1L)) // both kept at threshold 0
    out(0.5) shouldBe ((1L, ntA))      // only the quality doc survives
    out(1.0) shouldBe ((1L, ntA))
    // thresholds NO document reaches still appear, reporting zero retention
    // (the most important rows of the calibration read-out)
    val junkOnly = TextAnalysis.qualityThresholdSweep(
      docs.filter($"doc_id" === 2L), gridSteps = 2)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    junkOnly.keySet shouldBe Set(0.0, 0.5, 1.0)
    junkOnly(0.5) shouldBe ((0L, 0L))
    junkOnly(1.0) shouldBe ((0L, 0L))
  }
}
