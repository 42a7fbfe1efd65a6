package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The weighted GK quantile sketch ([[WeightedPercentileApprox]]):
  * semantics pinned against `percentile_approx` over the expanded multiset,
  * the rank-error contract verified on data large enough to force head
  * flushes, compression, and cross-partition merges.
  */
class SketchAggregatesSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._
  import SketchFunctions.wpercentile_approx

  test("equals percentile_approx over the expanded rows while summaries stay exact") {
    // small enough that neither side compresses: both summaries are exact,
    // so the answers must be IDENTICAL, not merely within rank error
    val pairs = Seq((1.0, 3L), (2.0, 1L), (5.0, 4L), (9.0, 2L))
    val expanded = pairs.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      val weighted = pairs.toDF("v", "w")
        .agg(wpercentile_approx($"v", $"w", p, 1000)).head.getDouble(0)
      val raw = expanded.toDF("v")
        .agg(percentile_approx($"v", lit(p), lit(1000))).head.getDouble(0)
      weighted shouldBe raw
    }
  }

  test("weight 1 over distinct values degenerates to percentile_approx") {
    // distinct values: equal-value collapsing can't change any g, so both
    // summaries hold identical unit samples and the answers are identical
    val prices = graft.Tables.lineitem(spark, sf0001)
      .select($"l_extendedprice".as("v")).distinct().limit(5000)
    val weighted = prices.withColumn("w", lit(1L))
      .agg(wpercentile_approx($"v", $"w", 0.5, 1000)).head.getDouble(0)
    val plain = prices
      .agg(percentile_approx($"v", lit(0.5), lit(1000))).head.getDouble(0)
    weighted shouldBe plain
  }

  test("rank-error contract holds through flushes, compression and partition merges") {
    // 60k distinct-ish pairs (> the 50k head) with skewed weights, spread
    // over 8 partitions so partial serialize/deserialize/merge all run
    val n = 60000
    val pairs = (0 until n).map { i =>
      (((i * 2654435761L) % 100003L).toDouble, (i % 1000L) + 1L)
    }
    val totalW = pairs.map(_._2).sum
    val accuracy = 100
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val got = pairs.toDF("v", "w").repartition(8)
        .agg(wpercentile_approx($"v", $"w", p, accuracy)).head.getDouble(0)
      // exact weighted rank of the returned value
      val below = pairs.filter(_._1 < got).map(_._2).sum
      val atOrBelow = pairs.filter(_._1 <= got).map(_._2).sum
      val target = p * totalW
      val eps = 2.0 / accuracy // merge of eps-summaries: allow 2*eps
      assert(below - 1 <= target + eps * totalW &&
        atOrBelow >= target - eps * totalW,
        s"p=$p got=$got rank=[$below,$atOrBelow] target=$target W=$totalW")
    }
  }

  test("a dominant weight owns the median") {
    val pairs = Seq((1.0, 5L), (42.0, 1000000000L), (99.0, 5L))
    pairs.toDF("v", "w")
      .agg(wpercentile_approx($"v", $"w", 0.5, 100)).head.getDouble(0) shouldBe 42.0
  }

  test("null values, null weights and zero weights are skipped; empty input is NULL") {
    val rows = Seq[(Option[Double], Option[Long])](
      (Some(10.0), Some(0L)), (None, Some(7L)), (Some(3.0), None), (Some(5.0), Some(2L)))
    rows.toDF("v", "w")
      .agg(wpercentile_approx($"v", $"w", 0.5, 1000)).head.getDouble(0) shouldBe 5.0
    rows.toDF("v", "w").where($"v" > 100)
      .agg(wpercentile_approx($"v", $"w", 0.5, 1000)).head.isNullAt(0) shouldBe true
  }

  test("negative weight raises a named error") {
    val e = intercept[Exception] {
      Seq((1.0, -2L)).toDF("v", "w")
        .agg(wpercentile_approx($"v", $"w", 0.5, 1000)).head
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("negative weight")))
  }

  test("negative weight raises even when the value is NULL (r14 ADVICE)") {
    val e = intercept[Exception] {
      Seq((Option.empty[Double], -5L)).toDF("v", "w")
        .agg(wpercentile_approx($"v", $"w", 0.5, 1000)).head
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("negative weight")))
  }

  test("fractional weight types are rejected at analysis time, never truncated (r14 ADVICE)") {
    // pre-fix, cast(LongType) turned weight 0.9 into 0 and silently
    // DROPPED the row on both the Column API and the SQL surface
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val colApi = intercept[Exception] {
      Seq((1.0, 0.9)).toDF("v", "w")
        .agg(wpercentile_approx($"v", $"w", 0.5, 1000)).head
    }
    assert(messages(colApi).exists(_.contains("integral")))
    Seq((1.0, 0.9)).toDF("v", "w").createOrReplaceTempView("wfrac_spec")
    val sqlApi = intercept[Exception] {
      spark.sql(
        "SELECT graft_wpercentile_approx(v, w, 0.5, 1000) FROM wfrac_spec").head
    }
    assert(messages(sqlApi).exists(_.contains("integral")))
    // an EXPLICIT integral cast keeps working (documented escape hatch)
    Seq((1.0, 2.0)).toDF("v", "w")
      .agg(wpercentile_approx($"v", $"w".cast("long"), 0.5, 1000))
      .head.getDouble(0) shouldBe 1.0
  }

  test("SQL surface: graft_wpercentile_approx over a value-count pre-aggregate") {
    graft.Tables.lineitem(spark, sf0001).createOrReplaceTempView("li_sketch_spec")
    val row = spark.sql(
      """SELECT graft_wpercentile_approx(l_extendedprice, cnt, 0.5, 1000) AS am
        |FROM (SELECT l_extendedprice, count(*) AS cnt
        |      FROM li_sketch_spec GROUP BY l_extendedprice)""".stripMargin).head
    val bounds = graft.Tables.lineitem(spark, sf0001).agg(
      expr("percentile(l_extendedprice, 0.45)"),
      expr("percentile(l_extendedprice, 0.55)")).head
    row.getDouble(0) should be >= bounds.getDouble(0)
    row.getDouble(0) should be <= bounds.getDouble(1)
  }
}
