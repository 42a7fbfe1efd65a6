package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SamplingSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private lazy val orders = graft.Tables.orders(spark, sf0001)

  test("stratified respects the per-stratum quota and samples only input rows") {
    val out = Sampling.stratified(orders, "o_orderstatus", "o_orderkey", 10)
    val perStratum = out.groupBy("o_orderstatus").count().collect()
    perStratum.foreach(_.getLong(1) should be <= 10L)
    // every stratum with >= 10 source rows is filled to exactly the quota
    val sourceCounts = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { r =>
      val expected = math.min(10L, sourceCounts(r.getString(0)))
      r.getLong(1) shouldBe expected
    }
    out.count() shouldBe perStratum.map(_.getLong(1)).sum
  }

  test("stratified is deterministic: same sample on re-execution") {
    def ids = Sampling.stratified(orders, "o_orderstatus", "o_orderkey", 25)
      .select($"o_orderkey").as[Long].collect().toSet
    ids shouldBe ids
    val once = ids
    once shouldBe ids // independently re-planned job, identical rows
  }
}
