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

  test("two-phase equals the single-phase window definition exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(md5($"o_orderkey".cast("string")), $"o_orderkey")
    val single = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 40).drop("rn")
      .select($"o_orderkey").as[Long].collect().sorted
    val two = Sampling.stratified(orders, "o_orderstatus", "o_orderkey", 40)
      .select($"o_orderkey").as[Long].collect().sorted
    two shouldBe single
  }

  test("underfill fallback: a starving threshold still yields the exact sample") {
    // oversample 0.01 drives the md5 threshold far below the quota, so
    // every stratum takes the full-row fallback path — output must STILL
    // equal the single-phase definition (exactness is unconditional)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(md5($"o_orderkey".cast("string")), $"o_orderkey")
    val single = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10).drop("rn")
      .select($"o_orderkey").as[Long].collect().sorted
    val starved = Sampling.stratified(orders, "o_orderstatus", "o_orderkey", 10,
      oversample = 0.01)
      .select($"o_orderkey").as[Long].collect().sorted
    starved shouldBe single
  }
}
