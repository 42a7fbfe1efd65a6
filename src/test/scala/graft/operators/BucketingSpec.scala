package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Co-located join via bucketing: writing lineitem and orders bucketed by
  * the join key removes the shuffle exchange from the join plan entirely,
  * and the bucketed join returns identical results.
  */
class BucketingSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val ord = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 4)

    // force the shuffle-join path (at bench scale both sides are fact-size;
    // locally AQE would broadcast these small tables and hide the exchange)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plainJoin = li.join(ord, $"l_orderkey" === $"o_orderkey")
      val bucketedJoin = Bucketing.table(spark, "li_bucketed")
        .join(Bucketing.table(spark, "ord_bucketed"), $"l_orderkey" === $"o_orderkey")

      // sanity: the unbucketed plan shuffles, the bucketed one must not
      Bucketing.hasShuffle(plainJoin) shouldBe true
      Bucketing.hasShuffle(bucketedJoin) shouldBe false

      bucketedJoin.count() shouldBe plainJoin.count()
      val a = bucketedJoin.agg(sum($"l_extendedprice" * $"o_totalprice")).head.getDouble(0)
      val b = plainJoin.agg(sum($"l_extendedprice" * $"o_totalprice")).head.getDouble(0)
      a shouldBe b +- math.abs(b) * 1e-12 // accumulation order differs
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key is also exchange-free") {
    val agg = Bucketing.table(spark, "li_bucketed")
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
    Bucketing.hasShuffle(agg) shouldBe false
    agg.count() should be > 0L
  }
}
