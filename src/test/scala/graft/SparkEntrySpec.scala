package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract-level checks of the driver surface: every query runs at
  * sf0.001, the flagship entry returns rows, and every oracle key refers to
  * an implemented query.
  */
class SparkEntrySpec extends AnyFunSuite with Matchers with SparkFixture {

  test("entry returns rows (driver smoke contract)") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      noException should be thrownBy fn(spark, sf0001).count()
    }
  }
}
