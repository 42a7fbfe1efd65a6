package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class HistorySpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val obs = Seq(
    // user 1: A, A (no change), B, A again — 3 versions
    (1L, "A", ts("2024-01-01 00:00:00"), 1L),
    (1L, "A", ts("2024-01-01 01:00:00"), 2L),
    (1L, "B", ts("2024-01-01 02:00:00"), 3L),
    (1L, "A", ts("2024-01-01 03:00:00"), 4L),
    // user 2: single observation — one open version
    (2L, "X", ts("2024-01-01 00:30:00"), 5L),
    // user 3: same-ts collision, order decided by the tie-break id
    (3L, "P", ts("2024-01-01 00:00:00"), 6L),
    (3L, "Q", ts("2024-01-01 00:00:00"), 7L)
  ).toDF("user_id", "event_type", "ts", "event_id")

  test("scd2 collapses runs into versions with lead() valid_to") {
    val got = History.scd2(obs, "user_id", "event_type", "ts", "event_id")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().sortBy(r => (r._1, r._3.getTime))
    got shouldBe Array(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00"))),
      (1L, "B", ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 03:00:00"))),
      (1L, "A", ts("2024-01-01 03:00:00"), None),
      (2L, "X", ts("2024-01-01 00:30:00"), None),
      (3L, "P", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 00:00:00"))),
      (3L, "Q", ts("2024-01-01 00:00:00"), None))
  }

  test("scd2 treats null attribute as a distinct version value") {
    val withNull = Seq(
      (1L, Some("A"), ts("2024-01-01 00:00:00"), 1L),
      (1L, None, ts("2024-01-01 01:00:00"), 2L),
      (1L, None, ts("2024-01-01 02:00:00"), 3L), // no change
      (1L, Some("A"), ts("2024-01-01 03:00:00"), 4L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    History.scd2(withNull, "user_id", "event_type", "ts", "event_id")
      .count() shouldBe 3L
  }

  test("asOfVersion returns exactly the interval covering the instant") {
    val hist = History.scd2(obs, "user_id", "event_type", "ts", "event_id")
    val at = History.asOfVersion(hist, lit(ts("2024-01-01 02:30:00")))
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> r._2).toMap
    at shouldBe Map(1L -> "B", 2L -> "X", 3L -> "Q")
  }

  test("scd2 plans one exchange (both windows and the filter share it)") {
    val plan = History.scd2(obs, "user_id", "event_type", "ts", "event_id")
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).length shouldBe 1
  }

  test("snapshotDiff classifies all four statuses") {
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "p1", "p2")
    val nw = Seq((2L, "b", "y"), (3L, "c", "CHANGED"), (4L, "d", "w"))
      .toDF("id", "p1", "p2")
    val got = History.snapshotDiff(old, nw, "id", Seq("p1", "p2"))
      .as[(Long, String)].collect().toMap
    got shouldBe Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added")
  }

  test("snapshotDiff separates shifted payload boundaries (unit separator)") {
    // ("ab","c") vs ("a","bc") must NOT fingerprint equal
    val old = Seq((1L, "ab", "c")).toDF("id", "p1", "p2")
    val nw = Seq((1L, "a", "bc")).toDF("id", "p1", "p2")
    History.snapshotDiff(old, nw, "id", Seq("p1", "p2"))
      .as[(Long, String)].head()._2 shouldBe "changed"
  }

  test("snapshotDiffSameBase agrees with the generic join spelling and plans no join/exchange") {
    // the exact shape of the snapshot_diff query: old = base minus the
    // %11 slice, new = base minus the %13 slice with the %17 slice
    // rewritten — all four statuses exercised on the sf0.001 corpus
    val docs = graft.Tables.documents(spark, sf0001)
    val id = col("doc_id")
    val h = History.fingerprint(Seq(col("text")))
    val fused = History.snapshotDiffSameBase(docs, "doc_id",
      oldKeep = id % 11 =!= 0, oldHash = h,
      newKeep = id % 13 =!= 0,
      newHash = when(id % 17 === 0,
        History.fingerprint(Seq(upper(col("text"))))).otherwise(h))
    val generic = History.snapshotDiff(
      docs.filter(col("doc_id") % 11 =!= 0),
      docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 17 === 0,
          upper(col("text"))).otherwise(col("text"))),
      "doc_id", Seq("text"))
    fused.exceptAll(generic).count() shouldBe 0L
    generic.exceptAll(fused).count() shouldBe 0L
    // and all four statuses actually appear at this sf
    fused.select(countDistinct(col("status"))).head.getLong(0) shouldBe 4L
    // the fused plan is one scan: no join, no shuffle exchange
    val plan = fused.queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Exchange hashpartitioning"
  }
}
