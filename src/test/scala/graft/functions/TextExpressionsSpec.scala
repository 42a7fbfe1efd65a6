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
          TextFunctions.shingle_hash31_array($"text", 3).as("hs"))
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
}
