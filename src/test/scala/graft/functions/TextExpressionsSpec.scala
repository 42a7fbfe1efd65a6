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

  test("simhash16 native matches composed bit-for-bit on real docs") {
    val docs = graft.Tables.documents(spark, sf0001)
    val diff = docs.select(
      Dedup.simhash16($"text").as("native"),
      Dedup.simhash16Composed($"text").as("composed"))
      .filter($"native" =!= $"composed")
    diff.count() shouldBe 0L
  }

  test("interpreted path matches codegen for both expressions") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      Seq("the quick brown fox jumps").toDF("text")
        .select(TextAnalysis.shingles($"text", 2), Dedup.simhash16($"text"))
        .head.getSeq[String](0).length shouldBe 4
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
