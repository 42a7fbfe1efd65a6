package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class IntervalJoinSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 150L), (5L, 199L), (6L, 200L),
    (7L, 350L), (8L, -50L)).toDF("pid", "p")
  private lazy val intervals = Seq(
    (10L, 100L, 200L),   // [100, 200)
    (11L, 150L, 160L),   // nested short
    (12L, -100L, 1L),    // negative start
    (13L, 300L, 300L),   // empty: end == start
    (14L, 400L, 350L)    // inverted: dropped
  ).toDF("iid", "s", "e")

  private def viaCross = points.crossJoin(intervals)
    .filter($"p" >= $"s" && $"p" < $"e")
    .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed join equals the nested-loop definition, half-open bounds") {
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"bucketWidth=$w: ") { got shouldBe viaCross }
    }
  }

  test("each qualifying pair appears exactly once (no bucket double-count)") {
    val got = IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.length shouldBe got.toSet.size
  }

  test("intervalOverlap equals the nested-loop overlap definition, exactly once") {
    val rights = Seq(
      (20L, 90L, 210L), (21L, 155L, 156L), (22L, -80L, -40L), (23L, 500L, 400L)
    ).toDF("rid", "rs", "re")
    for (w <- Seq(1L, 9L, 50L, 777L)) {
      val got = IntervalJoin.intervalOverlap(intervals, "s", "e", rights, "rs", "re", w)
        .select($"iid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val exp = (for {
        (iid, s, e) <- Seq((10L, 100L, 200L), (11L, 150L, 160L), (12L, -100L, 1L),
          (13L, 300L, 300L), (14L, 400L, 350L))
        (rid, rs, re) <- Seq((20L, 90L, 210L), (21L, 155L, 156L), (22L, -80L, -40L),
          (23L, 500L, 400L))
        if e > s && re > rs && s < re && rs < e
      } yield (iid, rid))
      withClue(s"w=$w: ") {
        got.sorted shouldBe exp.sorted // set equality AND no duplicates
      }
    }
  }

  test("plan is an equi-join on bucket ids, not a nested loop") {
    val plan = IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    // while the naive formulation is one
    val naive = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
      .queryExecution.executedPlan.toString
    naive should include("BroadcastNestedLoopJoin")
  }
}
