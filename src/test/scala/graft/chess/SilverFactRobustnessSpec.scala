package graft.chess

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Robustness of the silver transform on malformed input: games with
  * missing PGN headers (no Date/StartTime) must produce null columns, not
  * throw under ANSI mode.
  */
class SilverFactRobustnessSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("missing PGN headers yield nulls, not ANSI cast errors") {
    val malformed = Seq(
      ("""https://x/1""", """[Event "Live Chess"]
1. e4 {[%clk 0:09:58]} 1... e5 {[%clk 0:09:57]}"""), // no Date/StartTime/EndDate
      ("""https://x/2""", "")                          // empty pgn
    ).toDF("url", "pgn")
      .selectExpr("url", "pgn", "'600' AS time_control", "true AS rated",
        "'rapid' AS time_class", "'chess' AS rules",
        "named_struct('rating', 500L, 'result', 'win', '@id', '', 'username', 'a', 'uuid', '') AS white",
        "named_struct('rating', 400L, 'result', 'resigned', '@id', '', 'username', 'b', 'uuid', '') AS black")
    val out = SilverFact.transform(malformed).collect()
    out.length shouldBe 2
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("game_date")))
      assert(r.isNullAt(r.fieldIndex("start_time")))
    }
  }
}
