package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract + parity spec for [[TextOps.jsonTopScalars]] (the r12 native
  * JSON kernel behind f14_json_ops).
  *
  * On FLAT objects with scalar values — the kernel's primary domain —
  * it must agree byte-for-byte with Spark's own `get_json_object` for
  * string/integer/boolean values and with SQL NULL for JSON null /
  * missing keys (randomized via scalacheck, evaluated through full Spark
  * plans so codegen is exercised). The deliberate contract DIVERGENCES
  * (scalar-only extraction: nested values → NULL; float literals kept
  * verbatim; malformed docs → all NULL) are pinned by name.
  */
class JsonKernelSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private val Keys = Seq("k", "tag", "missing")

  private def kernel3(df: org.apache.spark.sql.DataFrame) =
    df.select($"id",
        TextFunctions.json_top_scalars($"js", Keys).as("__j"))
      .select($"id", element_at($"__j", 1).as("k"),
        element_at($"__j", 2).as("tag"), element_at($"__j", 3).as("missing"))

  private def jackson3(df: org.apache.spark.sql.DataFrame) =
    df.select($"id",
      get_json_object($"js", "$.k").as("k"),
      get_json_object($"js", "$.tag").as("tag"),
      get_json_object($"js", "$.missing").as("missing"))

  test("property: agrees with get_json_object on flat scalar objects") {
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.choose(-1000000L, 1000000L).map(_.toString),
      Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
      Gen.oneOf("true", "false", "null"),
      // strings with escapes the unescaper must match Jackson on
      Gen.oneOf("\"a\\\"b\"", "\"x\\\\y\"", "\"t\\tn\\n\"", "\"u\\u0041z\"",
        "\"sl\\/ash\"", "\"\\u00e9\\u65e5\""))
    val keyGen: Gen[String] = Gen.oneOf("k", "tag", "missing", "other", "zz")
    val docGen: Gen[String] = for {
      n <- Gen.choose(0, 6)
      kvs0 <- Gen.listOfN(n, Gen.zip(keyGen, scalarGen))
      // DISTINCT keys only: on duplicate keys the kernel's contract is
      // strict first-occurrence-wins (even when that occurrence is JSON
      // null), which deliberately diverges from get_json_object's
      // continue-past-null scan — duplicate semantics are pinned by the
      // named contract tests below, not by this parity property
      kvs = kvs0.distinctBy(_._1)
      spacey <- Gen.oneOf(true, false)
    } yield {
      val sep = if (spacey) " , " else ","
      val colon = if (spacey) " : " else ":"
      kvs.map { case (k, v) => "\"" + k + "\"" + colon + v }
        .mkString(if (spacey) "{ " else "{", sep, if (spacey) " }" else "}")
    }
    val docs = (1 to 300).flatMap(i => docGen.sample.map(s => (i.toLong, s)))
    val df = docs.toDF("id", "js")
    val got = kernel3(df).collect().map(_.toString).sorted
    val exp = jackson3(df).collect().map(_.toString).sorted
    got shouldBe exp
  }

  test("contract: nested values extract as NULL (scalar-only kernel), malformed as all-NULL") {
    val df = Seq(
      (1L, """{"k": {"a": 1}, "tag": "t"}"""), // nested at k → null, tag kept
      (2L, """{"k": [1, 2], "tag": 3}"""),     // array at k → null
      (3L, """{"k": 5"""),                     // malformed → all null
      (4L, """{"k": 5} trailing"""),           // trailing garbage → all null
      (5L, """not json"""),                    // → all null
      (6L, """{"k": abc}"""),                  // invalid scalar → all null
      (7L, """{"k": 1e2, "tag": -0.5}""")      // float literals verbatim
    ).toDF("id", "js")
    val got = kernel3(df).as[(Long, Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1)
    got(0) shouldBe ((1L, None, Some("t"), None))
    got(1) shouldBe ((2L, None, Some("3"), None))
    got(2) shouldBe ((3L, None, None, None))
    got(3) shouldBe ((4L, None, None, None))
    got(4) shouldBe ((5L, None, None, None))
    got(5) shouldBe ((6L, None, None, None))
    got(6) shouldBe ((7L, Some("1e2"), Some("-0.5"), None))
  }

  test("contract: duplicate keys — first occurrence wins; empty object; deep skip") {
    val df = Seq(
      (1L, """{"k": 1, "k": 2}"""),
      (2L, """{}"""),
      (3L, """{"other": {"k": [{"x": "}"}, "\"", 3]}, "k": 9}""")
    ).toDF("id", "js")
    val got = kernel3(df).as[(Long, Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1)
    got(0)._2 shouldBe Some("1")
    got(1) shouldBe ((2L, None, None, None))
    // the nested "k" inside other must NOT match; the brace/quote inside
    // the nested string must not derail the skip
    got(2)._2 shouldBe Some("9")
  }

  test("contract: first occurrence wins even when it maps to SQL NULL (r12 ADVICE)") {
    // the first occurrence CONSUMES the slot: a later duplicate never
    // overwrites a null/non-scalar verdict (get_json_object would scan
    // past the null — that divergence is deliberate and documented)
    val df = Seq(
      (1L, """{"k": {"a": 1}, "k": "v"}"""), // non-scalar first → NULL stays
      (2L, """{"k": null, "k": 7}"""),       // JSON null first → NULL stays
      (3L, """{"k": [0], "k": null, "k": 3}"""),
      (4L, """{"tag": null, "k": 1, "tag": "t"}""") // independent per key
    ).toDF("id", "js")
    val got = kernel3(df).as[(Long, Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1)
    got(0)._2 shouldBe None
    got(1)._2 shouldBe None
    got(2)._2 shouldBe None
    got(3) shouldBe ((4L, Some("1"), None, None))
  }

  test("contract: a duplicate-requested key consumed by a NULL first occurrence nulls every slot") {
    val df = Seq((1L, """{"k": null, "k": 5, "tag": "t"}""")).toDF("id", "js")
    val got = df.select(
        TextFunctions.json_top_scalars($"js", Seq("k", "tag", "k")).as("j"))
      .select(element_at($"j", 1), element_at($"j", 2), element_at($"j", 3))
      .as[(Option[String], Option[String], Option[String])].collect().head
    got shouldBe ((None, Some("t"), None))
  }

  test("contract: bracket-kind mismatches in skipped regions are malformed (r12 ADVICE)") {
    val df = Seq(
      (1L, """{"b": 1, "a": [1}}"""),          // '[' closed by '}' → all null
      (2L, """{"b": {"x": 1], "k": 2}"""),     // '{' closed by ']' → all null
      (3L, """{"b": [[{"x": []}]], "k": 2}""") // deep but well-formed → k kept
    ).toDF("id", "js")
    val got = kernel3(df).as[(Long, Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1)
    got(0) shouldBe ((1L, None, None, None))
    got(1) shouldBe ((2L, None, None, None))
    got(2)._2 shouldBe Some("2")
  }

  test("contract: structures deeper than the 64-level bit-stack still skip correctly") {
    val deep = "[" * 80 + "1" + "]" * 80
    val okDoc = s"""{"skip": $deep, "k": 4}"""
    val badDoc = s"""{"skip": ${"[" * 80 + "1" + "]" * 79}}, "k": 4}"""
    val df = Seq((1L, okDoc), (2L, badDoc)).toDF("id", "js")
    val got = kernel3(df).as[(Long, Option[String], Option[String], Option[String])]
      .collect().sortBy(_._1)
    got(0)._2 shouldBe Some("4")
    got(1) shouldBe ((2L, None, None, None))
  }

  test("contract: a key requested twice fills both slots from one parse") {
    val df = Seq((1L, """{"k": 5, "tag": "t"}""")).toDF("id", "js")
    val got = df.select(
        TextFunctions.json_top_scalars($"js", Seq("k", "tag", "k")).as("j"))
      .select(element_at($"j", 1), element_at($"j", 2), element_at($"j", 3))
      .as[(String, String, String)].collect().head
    got shouldBe (("5", "t", "5"))
  }

  test("contract: null input row and the surrogate-pair escape") {
    val df = Seq((1L, null: String),
      (2L, "{\"k\": \"\\ud83d\\ude00\"}")).toDF("id", "js")
    val got = kernel3(df).select($"k").as[Option[String]].collect()
    got(0) shouldBe None
    got(1) shouldBe Some(new String(Character.toChars(0x1f600)))
  }
}
