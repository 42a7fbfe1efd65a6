package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RetrievalSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bm25 matches a hand-computed score on a tiny corpus") {
    // corpus: 3 docs, query = ["cat"]; df(cat) = 2, N = 3
    val d = docs(
      1L -> "cat sat on mat",          // dl=4, tf=1
      2L -> "cat cat dog",             // dl=3, tf=2
      3L -> "dog runs far home today") // dl=5, tf=0
    val out = Retrieval.bm25(d, Seq("cat")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.keySet shouldBe Set(1L, 2L)
    val avgdl = 4.0
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def score(tf: Double, dl: Double): Double =
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(1L) shouldBe score(1, 4)
    out(2L) shouldBe score(2, 3)
  }

  test("bm25 sums contributions across query terms") {
    val d = docs(1L -> "a b", 2L -> "a a", 3L -> "c c")
    val both = Retrieval.bm25(d, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val onlyA = Retrieval.bm25(d, Seq("a")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val onlyB = Retrieval.bm25(d, Seq("b")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 contains both terms: the two-term score is the sum of the
    // single-term scores (within the 6-decimal rounding convention)
    both(1L) shouldBe (onlyA(1L) + onlyB(1L) +- 2e-6)
    // doc 3 contains neither -> absent from every result
    both.contains(3L) shouldBe false
    onlyA.contains(3L) shouldBe false
  }

  test("bm25: rarer terms score higher at equal tf and dl") {
    val d = docs(
      1L -> "rare common x",
      2L -> "common y z",
      3L -> "common p q")
    val out = Retrieval.bm25(d, Seq("rare", "common")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 has tf=1 of each at the same dl: its score strictly exceeds
    // docs with only the common term
    out(1L) should be > out(2L)
    out(2L) shouldBe out(3L)
  }
}
