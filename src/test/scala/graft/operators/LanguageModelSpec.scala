package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LanguageModelSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private val reference = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran")).toDF("doc_id", "text")

  test("bigramCounts / contextCounts / vocabSize on a 2-doc corpus") {
    val c12 = LanguageModel.bigramCounts(reference)
      .as[(String, Long)].collect().toMap
    c12 shouldBe Map("the cat" -> 2L, "cat sat" -> 1L, "cat ran" -> 1L)

    val c1 = LanguageModel.contextCounts(reference)
      .as[(String, Long)].collect().toMap
    c1 shouldBe Map("the" -> 2L, "cat" -> 2L)

    LanguageModel.vocabSize(reference).as[Long].head() shouldBe 4L // the cat sat ran
  }

  test("crossEntropy: hand-computed add-one probabilities") {
    // V = 4. Score "the cat sat":
    //   P(cat|the) = (2+1)/(2+4) = 1/2,  P(sat|cat) = (1+1)/(2+4) = 1/3
    val docs = Seq((10L, "the cat sat")).toDF("doc_id", "text")
    val row = LanguageModel.crossEntropy(reference, docs)
      .as[(Long, Long, Double)].head()
    row._1 shouldBe 10L
    row._2 shouldBe 2L
    val expected = -(math.log(0.5) + math.log(1.0 / 3.0)) / 2.0
    row._3 shouldBe (BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("crossEntropy: unseen context falls back to uniform 1/V") {
    val docs = Seq((11L, "zz qq")).toDF("doc_id", "text")
    val row = LanguageModel.crossEntropy(reference, docs)
      .as[(Long, Long, Double)].head()
    row._2 shouldBe 1L
    // P(qq|zz) = (0+1)/(0+4)
    val expected = -math.log(0.25)
    row._3 shouldBe (BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("crossEntropy drops sub-bigram documents") {
    val docs = Seq((12L, "solo"), (13L, "a b")).toDF("doc_id", "text")
    LanguageModel.crossEntropy(reference, docs)
      .select("doc_id").as[Long].collect().toSeq shouldBe Seq(13L)
  }

  test("crossEntropy: persisted-c12 scale path ≡ replan small path, row for row") {
    // smallBytes = 0 forces the persist (strict AdaptiveGate), MaxValue
    // forces the replan; the gate must be invisible in the output
    val docs = graft.Tables.documents(spark, sf0001)
    val ref = docs.filter(org.apache.spark.sql.functions.col("lang") === "en")
    def rows(smallBytes: Long): Seq[(Long, Long, Double)] =
      LanguageModel.crossEntropy(ref, docs, smallBytes = smallBytes)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val replan = rows(Long.MaxValue)
    val persisted = rows(0L)
    replan should not be empty
    persisted shouldBe replan
    spark.catalog.clearCache() // drop the forced persist (shared fixture)
  }
}
