package graft.functions

import graft.SparkFixture
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Equivalence of the native codegen'd text expressions against the
  * composed built-in formulations they replaced — over the full real
  * documents table plus hand-picked edge cases (empty tokens, short docs).
  */
class TextExpressionsSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("shingle_array matches the composed HOF formulation on real docs") {
    val docs = graft.Tables.documents(spark, sf0001)
    val diff = docs.select(
      TextAnalysis.shingles($"text", 5).as("native"),
      TextAnalysis.shinglesComposed($"text", 5).as("composed"))
      .filter($"native" =!= $"composed")
    diff.count() shouldBe 0L
  }

  test("shingle_array edge cases: empty string, repeated/empty tokens, short docs") {
    val cases = Seq("", " ", "a", "a b", "a b c", "a  b c", "x x x x", "a b a b a")
    val diff = cases.toDF("text").select(
      TextAnalysis.shingles($"text", 3).as("native"),
      TextAnalysis.shinglesComposed($"text", 3).as("composed"))
      .filter($"native" =!= $"composed")
    diff.count() shouldBe 0L
    // spot check: double space produces an empty middle token, kept
    Seq("a  b c").toDF("text").select(TextAnalysis.shingles($"text", 3))
      .head.getSeq[String](0) shouldBe Seq("a  b", " b c")
  }

  test("normalize_text matches the regex chain on real docs and edge cases") {
    def regexNorm(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))
    val docs = graft.Tables.documents(spark, sf0001)
    docs.select(TextFunctions.normalize_text($"text").as("native"),
        regexNorm($"text").as("regex"))
      .filter(!($"native" <=> $"regex")).count() shouldBe 0L
    // adversarial: unicode (multi-byte chars must drop whole), uppercase
    // that lowers into ascii (Kelvin sign), tabs/newlines (dropped, not
    // collapsed as spaces), runs created BY removal ("a . b" -> "a  b"),
    // all-dropped strings, leading/trailing space soup
    val cases = Seq("", " ", "   ", "a", "A.B", "a . b", "Hello,  World!",
      "\u212A elvin", "café touché", "tab\tsep", "nl\nsep",
      "...!!!", "  lead and trail  ", "MiXeD 42 CaSe", "你好 ascii",
      "a\u0000b", "double  space", "-1 -2 -3")
    cases.toDF("text").select(TextFunctions.normalize_text($"text").as("native"),
        regexNorm($"text").as("regex"))
      .filter(!($"native" <=> $"regex")).count() shouldBe 0L
    // null passes through
    Seq[Option[String]](None).toDF("text")
      .select(TextFunctions.normalize_text($"text")).head.isNullAt(0) shouldBe true
  }

  test("term_count_array matches explode+groupBy term counting on real docs") {
    val docs = graft.Tables.documents(spark, sf0001)
    val fused = docs.select($"doc_id",
      inline(TextFunctions.term_count_array($"text")))
    val composed = docs.select($"doc_id",
      explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    fused.join(composed, Seq("doc_id", "term"), "full")
      .filter(fused("tf").isNull || composed("tf").isNull ||
        fused("tf") =!= composed("tf"))
      .count() shouldBe 0L
    // edge cases: empty text is ONE empty token; double space keeps the
    // empty middle token; null text yields no rows (inline of null)
    val edge = Seq((1L, ""), (2L, "a  b a"), (3L, null: String))
      .toDF("doc_id", "text")
    val got = edge.select($"doc_id", inline(TextFunctions.term_count_array($"text")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    got shouldBe Set((1L, "", 1L), (2L, "a", 2L), (2L, "", 1L), (2L, "b", 1L))
  }

  test("vocab_encode honors a non-zero oovId (boxed lookup, not unboxed-null-to-0)") {
    val got = Seq("a b zzz a").toDF("text")
      .select(TextFunctions.vocab_encode($"text", Seq("a", "b"), oovId = -7L))
      .as[Seq[Long]].head()
    got shouldBe Seq(1L, 2L, -7L, 1L)
  }

  test("shingle_hash31_array matches the composed md5-transform formulation on real docs") {
    val docs = graft.Tables.documents(spark, sf0001)
    Dedup.docShingleHashes(docs, 5)
      .join(Dedup.docShingleHashesComposed(docs, 5)
        .withColumnRenamed("hs", "hs_c"), "doc_id")
      .filter($"hs" =!= $"hs_c").count() shouldBe 0L
    Dedup.docShingleHashes(docs, 5).count() shouldBe
      Dedup.docShingleHashesComposed(docs, 5).count()
    // edge cases: short docs drop out, duplicate shingles collapse to one hash
    val edge = Seq((1L, ""), (2L, "a b c d"), (3L, "a b c d e"),
      (4L, "a b c d e a b c d e a b c d e")).toDF("doc_id", "text")
    Dedup.docShingleHashes(edge, 5)
      .join(Dedup.docShingleHashesComposed(edge, 5)
        .withColumnRenamed("hs", "hs_c"), "doc_id")
      .filter($"hs" =!= $"hs_c").count() shouldBe 0L
    Dedup.docShingleHashes(edge, 5).select($"doc_id").as[Long].collect()
      .sorted shouldBe Array(3L, 4L)
  }

  test("shingle_hash31_all_array: positional kernel equals transform(shinglesAll, hash31) on real docs") {
    val docs = graft.Tables.documents(spark, sf0001)
    def composed(df: org.apache.spark.sql.DataFrame) = df.select($"doc_id",
      org.apache.spark.sql.functions.transform(
        graft.operators.TextAnalysis.shinglesAll($"text", 5),
        s => Dedup.shingleHash31(s)).as("hs_c"))
    val diff = docs.select($"doc_id",
        TextFunctions.shingle_hash31_all_array($"text", 5).as("hs"))
      .join(composed(docs), "doc_id")
      .filter($"hs" =!= $"hs_c")
    diff.count() shouldBe 0L
    // positional: duplicate shingles KEEP their occurrences in order
    val edge = Seq((1L, ""), (2L, "a b c d"),
      (3L, "a b a b a b")).toDF("doc_id", "text")
    val got = edge.select($"doc_id",
        TextFunctions.shingle_hash31_all_array($"text", 2).as("hs"))
      .orderBy($"doc_id").as[(Long, Seq[Long])].collect()
    got(0)._2.length shouldBe 0 // "" -> 1 token -> no 2-shingle
    got(1)._2.length shouldBe 3
    got(2)._2.length shouldBe 5
    got(2)._2(0) shouldBe got(2)._2(2) // "a b" repeats positionally
    got(2)._2(1) shouldBe got(2)._2(3)
    // SQL registry surface agrees with the Column API
    edge.createOrReplaceTempView("sh31_edge")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_shingle_hash31_all(text, 2) AS hs FROM sh31_edge")
      .orderBy($"doc_id").as[(Long, Seq[Long])].collect()
    viaSql.map(_._2) shouldBe got.map(_._2)
  }

  test("simhash16 native matches composed bit-for-bit on real docs") {
    val docs = graft.Tables.documents(spark, sf0001)
    val diff = docs.select(
      Dedup.simhash16($"text").as("native"),
      Dedup.simhash16Composed($"text").as("composed"))
      .filter($"native" =!= $"composed")
    diff.count() shouldBe 0L
  }

  test("bounded_levenshtein matches built-in levenshtein on real doc prefixes") {
    val norm = TextAnalysis.normalizedText(substring($"text", 1, 128))
    val t = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", substring(norm, 1, 32).as("p"), substring(norm, 1, 8).as("bk"))
    val pairs = t.as("a").join(t.as("b"),
      $"a.bk" === $"b.bk" && $"a.doc_id" < $"b.doc_id")
    val k = 8
    val diff = pairs.select(
      TextFunctions.bounded_levenshtein($"a.p", $"b.p", k).as("bounded"),
      least(levenshtein($"a.p", $"b.p").cast("long"), lit(k + 1L)).as("capped"))
      .filter($"bounded" =!= $"capped")
    diff.count() shouldBe 0L
  }

  test("bounded_levenshtein edge cases and exactness below the bound") {
    val cases = Seq(
      ("", "", 0L), ("", "abc", 3L), ("abc", "", 3L),
      ("kitten", "sitting", 3L), ("abcdef", "abcdef", 0L),
      ("aaaaaaaaaa", "bbbbbbbbbb", 9L), // distance 10 > 8 → capped at 9
      ("abcdefghij", "jihgfedcba", 9L)) // far apart → capped
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("a", "b")
      .select(TextFunctions.bounded_levenshtein($"a", $"b", 8))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe cases.map(_._3)
  }

  test("bounded_levenshtein property: equals capped classic DP on random strings (incl. multibyte)") {
    // independent reference implementation: the textbook full-matrix DP
    def classic(a: String, b: String): Int = {
      val (n, m) = (a.length, b.length)
      val d = Array.tabulate(n + 1, m + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to n; j <- 1 to m)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(n)(m)
    }
    val rnd = new scala.util.Random(20260812)
    val alphabet = "abcé日ß "
    def randStr() = {
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val cases = Seq.fill(400)((randStr(), randStr()))
    for (k <- Seq(0, 3, 8)) {
      val got = cases.toDF("a", "b")
        .select(TextFunctions.bounded_levenshtein($"a", $"b", k))
        .collect().map(_.getLong(0))
      val want = cases.map { case (a, b) => math.min(classic(a, b), k + 1).toLong }
      got.toSeq shouldBe want
    }
  }

  test("hist_l1 property: lower-bounds 2x the true edit distance (never rejects a real pair)") {
    // soundness of the prefilter: hist_l1 > 2k must IMPLY distance > k,
    // i.e. hist_l1 <= 2 * classic(a, b) on every pair — checked against
    // the independent full-matrix DP on random strings, including clamp
    // pressure (long runs of one char push buckets past the 4-bit cap)
    def classic(a: String, b: String): Int = {
      val (n, m) = (a.length, b.length)
      val d = Array.tabulate(n + 1, m + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to n; j <- 1 to m)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(n)(m)
    }
    val rnd = new scala.util.Random(20260815)
    val alphabet = "aab cdé日 z" // skew toward 'a' to exercise the clamp
    def randStr() = {
      val base = (0 until rnd.nextInt(32)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
      (if (rnd.nextInt(4) == 0) "a" * (8 + rnd.nextInt(24)) else "") + base.mkString
    }
    val cases = Seq.fill(400)((randStr(), randStr()))
    val got = cases.toDF("a", "b").select(
      TextFunctions.hist_l1(TextFunctions.hist_sig16($"a"),
        TextFunctions.hist_sig16($"b")).as("l1")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((a, b), l1) =>
      assert(l1 <= 2L * classic(a, b), s"hist_l1 over-bound on ($a, $b)")
    }
    // and it fires: clearly-different pairs must actually be rejectable
    val far = Seq(("aaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbb")).toDF("a", "b")
      .select(TextFunctions.hist_l1(TextFunctions.hist_sig16($"a"),
        TextFunctions.hist_sig16($"b"))).head.getLong(0)
    assert(far > 16L)
  }

  test("shingle_hash31_array property: equals the composed md5 formulation on random strings") {
    val rnd = new scala.util.Random(20260812)
    val alphabet = "ab é日  " // skewed toward spaces: empty tokens, runs
    def randStr() = {
      val len = rnd.nextInt(60)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val docs = Seq.fill(300)(randStr()).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (k <- Seq(1, 2, 5)) {
      val diff = Dedup.docShingleHashes(docs, k)
        .join(Dedup.docShingleHashesComposed(docs, k)
          .withColumnRenamed("hs", "hs_c"), Seq("doc_id"), "full")
        .filter($"hs".isNull || $"hs_c".isNull || $"hs" =!= $"hs_c")
      diff.count() shouldBe 0L
    }
  }

  test("minhash_sig_array property: equals the composed array_min formulation") {
    val rnd = new scala.util.Random(42)
    val arrs = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(50))(rnd.nextLong().abs % 2147483647L))
      .zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("doc_id", "hs")
    val native = Dedup.minhashSignatures(arrs, 16).orderBy("doc_id").collect()
    val composed = Dedup.minhashSignaturesComposed(arrs, 16).orderBy("doc_id").collect()
    native shouldBe composed
  }

  test("interpreted path matches codegen for the native expressions") {
    val docs = graft.Tables.documents(spark, sf0001).limit(50)
    def snapshot(): (Array[org.apache.spark.sql.Row], Array[org.apache.spark.sql.Row]) = {
      val a = docs.select($"doc_id",
          TextAnalysis.shingles($"text", 3).as("sh"),
          Dedup.simhash16($"text").as("sim"),
          TextFunctions.shingle_hash31_array($"text", 3).as("hs"),
          TextFunctions.normalize_text($"text").as("norm"))
        .withColumn("sig", TextFunctions.minhash_sig_array($"hs", 8))
        .orderBy("doc_id").collect()
      val b = Seq(Seq(5L, 3L, 9L, 3L)).toDF("ids")
        .select(TextFunctions.array_pairs($"ids").as("p")).collect()
      (a, b)
    }
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val (cg, cgPairs) = snapshot()
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val (interp, interpPairs) = snapshot()
      interp shouldBe cg
      interpPairs shouldBe cgPairs
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    // array_pairs sorts, dedups, and emits strictly a < b pairs — equal
    // values never self-pair (the a.id < b.id predicate it replaces)
    cgPairs.head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1))) shouldBe
      Seq((3L, 5L), (3L, 9L), (5L, 9L))
  }

  test("probe_term_stats matches the composed split formulation on real docs and edges") {
    val terms = Seq("vector", "stream", "join")
    def composed(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val cols: Seq[org.apache.spark.sql.Column] =
        // `functions.size` qualified: scalatest Matchers' SizeWord shadows it
        org.apache.spark.sql.functions.size(split(c, " ")).cast("long") +: terms.map(t =>
          org.apache.spark.sql.functions.size(filter(split(c, " "),
            (w: org.apache.spark.sql.Column) => w === lit(t))).cast("long"))
      array(cols: _*)
    }
    val docs = graft.Tables.documents(spark, sf0001).select($"text")
    val edges = Seq("", " ", "  ", "vector", "vector ", " vector",
      "vector  stream", "vectors", "a vector b join join", "join join join")
      .toDF("text")
    for (df <- Seq(docs, edges)) {
      df.select(TextFunctions.probe_term_stats($"text", terms).as("native"),
          composed($"text").as("composed"))
        .filter($"native" =!= $"composed").count() shouldBe 0L
    }
    // spot checks pin the split(-1) contract: empty segments count toward
    // dl (trailing empties kept), byte-exact term equality (no prefixes)
    val one = Seq("vector  stream ").toDF("text")
      .select(TextFunctions.probe_term_stats($"text", terms)).head.getSeq[Long](0)
    one shouldBe Seq(4L, 1L, 1L, 0L) // ["vector", "", "stream", ""]
  }

  test("probe_term_stats: interpreted path matches codegen") {
    val terms = Seq("a", "bb")
    val rows = Seq("a bb a", "", "bb", "ab a")
    def run() = rows.toDF("text")
      .select(TextFunctions.probe_term_stats($"text", terms)).collect()
      .map(_.getSeq[Long](0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val cg = run()
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      run() shouldBe cg
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    cg.toSeq shouldBe Seq(Seq(3L, 2L, 1L), Seq(1L, 0L, 0L), Seq(1L, 0L, 1L), Seq(2L, 1L, 0L))
  }
}
