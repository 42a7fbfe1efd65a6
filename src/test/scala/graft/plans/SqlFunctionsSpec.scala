package graft.plans

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SQL registration of the native expressions
  * ([[GraftPlanExtensions]]): pure-SQL calls must reach the same kernels
  * as the Column API — parity checked value-for-value.
  */
class SqlFunctionsSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private lazy val docs = {
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text").createOrReplaceTempView("sqlfn_docs")
    spark.table("sqlfn_docs")
  }

  test("text kernels via spark.sql equal the Column API") {
    docs // force view registration
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    val api = docs.select($"doc_id",
      shingle_array($"text", 3).as("sh"),
      shingle_hash31_array($"text", 3).as("hs"),
      simhash16($"text").as("sim"),
      rolling_hash($"text").as("rh")).collect()
    val sql = spark.sql(
      """SELECT doc_id, graft_shingles(text, 3) AS sh,
        | graft_shingle_hash31(text, 3) AS hs,
        | graft_simhash16(text) AS sim, graft_rolling_hash(text) AS rh
        |FROM sqlfn_docs""".stripMargin).collect()
    sql.map(_.toSeq) shouldBe api.map(_.toSeq)
  }

  test("term counting via SQL equals the Column API") {
    docs
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    val api = docs.select($"doc_id", term_count_array($"text").as("tc")).collect()
    val sql = spark.sql(
      "SELECT doc_id, graft_term_counts(text) AS tc FROM sqlfn_docs").collect()
    sql.map(_.toSeq) shouldBe api.map(_.toSeq)
  }

  test("minhash signature and bounded levenshtein via SQL") {
    docs
    val sig = spark.sql(
      """SELECT graft_minhash_sig(graft_shingle_hash31(text, 3), 4) AS sig
        |FROM sqlfn_docs WHERE doc_id = 1""".stripMargin)
      .collect()(0).getSeq[Long](0)
    sig.length shouldBe 4
    val lev = spark.sql(
      "SELECT graft_bounded_levenshtein('kitten', 'sitting', 5) AS d")
      .collect()(0).getLong(0)
    lev shouldBe 3L
  }

  test("vector kernels via SQL: dot, cosine, norm") {
    val r = spark.sql(
      """SELECT graft_vec_dot(a, b) AS d, graft_vec_cosine(a, b) AS c,
        | graft_vec_norm(a) AS n
        |FROM VALUES (array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS t(a, b)""".stripMargin)
      .collect()(0)
    r.getDouble(0) shouldBe 0.0
    r.getDouble(1) shouldBe 0.0
    r.getDouble(2) shouldBe 1.0
  }

  test("r12 kernels via SQL: repetition stats and json top-scalar extraction") {
    docs
    import graft.functions.TextFunctions._
    val api = docs.select($"doc_id",
      repetition_stats($"text", 2).as("r"),
      json_top_scalars(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("{\"a\": \""),
          $"doc_id".cast("string"),
          org.apache.spark.sql.functions.lit("\", \"b\": 7}")),
        Seq("a", "b")).as("j")).collect()
    val sql = spark.sql(
      """SELECT doc_id, graft_repetition_stats(text, 2) AS r,
        | graft_json_top_scalars(
        |   concat('{"a": "', CAST(doc_id AS STRING), '", "b": 7}'),
        |   'a,b') AS j
        |FROM sqlfn_docs""".stripMargin).collect()
    sql.map(_.toSeq) shouldBe api.map(_.toSeq)
  }

  test("json_top_scalars keysCsv trims segments and rejects empty keys (r12 ADVICE)") {
    // 'a, b' must request the key "b" — the untrimmed ' b' would silently
    // never match any document key
    val r = spark.sql(
      """SELECT graft_json_top_scalars('{"a": 1, "b": "x"}', 'a, b') AS j""")
      .collect()(0).getSeq[String](0)
    r shouldBe Seq("1", "x")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_json_top_scalars('{}', 'a,,b')").collect()
    }
    e.getMessage should include("empty key")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_json_top_scalars('{}', '')").collect()
    }
    e2.getMessage should include("empty key")
  }

  test("r14 kernel via SQL: media_header_meta equals the Column-API decode profile") {
    docs
    val sql = spark.sql(
      """SELECT doc_id,
        | graft_media_header_meta(CAST(text AS BINARY), 'image',
        |   md5(CAST(text AS BINARY))) AS m
        |FROM sqlfn_docs""".stripMargin)
      .select($"doc_id", $"m.width", $"m.height", $"m.channels",
        $"m.est_duration_ms").collect()
    val api = graft.operators.Multimodal
      .decodeMetaColumns(docs, "doc_id", "text", "image")
      .select($"asset_id".as("doc_id"), $"width", $"height", $"channels",
        $"est_duration_ms").collect()
    sql.map(_.toSeq) shouldBe api.map(_.toSeq)
  }

  test("non-literal scalar parameter fails with a clear message") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, doc_id) FROM sqlfn_docs").collect()
    }
    e.getMessage should include("integer literal")
  }
}
