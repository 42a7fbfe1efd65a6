package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PrefixJoinSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("strategy is present by default in a GraftSession (injected, not manually registered)") {
    // nothing in the fixture registers the strategy via experimental —
    // it arrives through GraftPlanExtensions, so any GraftSession has it
    spark.experimental.extraStrategies shouldBe empty
    val left = Seq((1L, "abc")).toDF("id", "text")
    val dict = Seq("a").toDF("p")
    val plan = left.join(dict, $"text".startsWith($"p"), "inner")
      .queryExecution.executedPlan.toString
    plan should include("PrefixJoin")
  }

  test("PrefixJoinExec replaces BroadcastNestedLoopJoin and matches its results") {
    val docs = graft.Tables.documents(spark, sf0001)
    val w = split($"text", " ")
    val sample = docs.filter($"doc_id" % 20 === 0)
    val dict = sample.select(concat_ws(" ", slice(w, 1, 2)).as("p"))
      .union(sample.filter(F.size(w) >= 3).select(concat_ws(" ", slice(w, 1, 3)).as("p")))
      .distinct()

    // same semantics spelled so the strategy's StartsWith pattern cannot
    // fire (substring equality) — planner falls back to BNLJ; dict strings
    // are valid UTF-8 so char-prefix equality == byte-prefix startsWith
    def baselineQuery() = docs.join(dict,
        expr("substring(text, 1, length(p)) = p"), "left")
      .groupBy($"doc_id")
      .agg(max_by($"p", F.length($"p")).as("opening"),
        max(F.length($"p")).cast("long").as("opening_len"))

    def query() = docs.join(dict, $"text".startsWith($"p"), "left")
      .groupBy($"doc_id")
      .agg(max_by($"p", F.length($"p")).as("opening"),
        max(F.length($"p")).cast("long").as("opening_len"))

    val baseline = baselineQuery().orderBy("doc_id").collect()
    val df = query()
    val plan = df.queryExecution.executedPlan.toString
    val fast = df.orderBy("doc_id").collect()
    plan should include("PrefixJoin")
    plan should not include "BroadcastNestedLoopJoin"
    fast shouldBe baseline
  }

  test("inner prefix join and left rows with no match") {
    val left = Seq((1L, "abc def"), (2L, "xyz"), (3L, "")).toDF("id", "text")
    val dict = Seq("a", "abc", "abc d", "zzz").toDF("p")
    val outer = left.join(dict, $"text".startsWith($"p"), "left")
      .select($"id", $"p").orderBy($"id", $"p").collect()
    outer.map(r => (r.getLong(0), Option(r.getString(1)))) shouldBe Array(
      (1L, Some("a")), (1L, Some("abc")), (1L, Some("abc d")),
      (2L, None), (3L, None))
    val inner = left.join(dict, $"text".startsWith($"p"), "inner")
      .select($"id", $"p").orderBy($"id", $"p").collect()
    inner.map(r => (r.getLong(0), r.getString(1))) shouldBe Array(
      (1L, "a"), (1L, "abc"), (1L, "abc d"))
  }

  test("empty-string prefix matches every left row, exactly like startsWith") {
    // startsWith(x, "") is true for all non-null x (including x = ""), so a
    // dict containing "" must join to every left row — the byte-length probe
    // loop alone would never look the empty key up
    val left = Seq((1L, "abc"), (2L, "")).toDF("id", "text")
    val dict = Seq("", "ab", "zzz").toDF("p")
    def rows(joinType: String) = left.join(dict, $"text".startsWith($"p"), joinType)
      .select($"id", $"p").orderBy($"id", $"p").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val (fastInner, fastOuter) = (rows("inner"), rows("left"))
    fastInner shouldBe Seq((1L, Some("")), (1L, Some("ab")), (2L, Some("")))
    fastOuter shouldBe Seq((1L, Some("")), (1L, Some("ab")), (2L, Some("")))
  }

  test("multi-byte characters join on whole-char boundaries only") {
    val left = Seq((1L, "héllo world")).toDF("id", "text")
    val dict = Seq("h", "hé", "hél", "no").toDF("p")
    val out = left.join(dict, $"text".startsWith($"p"), "inner")
      .select($"p").orderBy($"p").collect().map(_.getString(0))
    out shouldBe Array("h", "hé", "hél")
  }
}
