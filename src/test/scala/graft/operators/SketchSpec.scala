package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Sketch aggregates bounded against exact answers (the oracle can't
  * hash-compare engine-specific sketch estimates, so the accuracy contract
  * lives here): HLL++ within its rsd, quantile sketch within rank error.
  */
class SketchSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("approx_count_distinct(rsd=2%) within 3-sigma of exact on both key columns") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val row = li.agg(
      countDistinct($"l_partkey").as("exact_p"),
      approx_count_distinct($"l_partkey", 0.02).as("approx_p"),
      countDistinct($"l_orderkey").as("exact_o"),
      approx_count_distinct($"l_orderkey", 0.02).as("approx_o")).head
    math.abs(row.getLong(1) - row.getLong(0)).toDouble / row.getLong(0) should be < 0.06
    math.abs(row.getLong(3) - row.getLong(2)).toDouble / row.getLong(2) should be < 0.06
  }

  test("percentile_approx median lands between the exact 45th and 55th percentiles") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val approx = li.agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000)))
      .head.getDouble(0)
    val bounds = li.agg(
      expr("percentile(l_extendedprice, 0.45)"),
      expr("percentile(l_extendedprice, 0.55)")).head
    approx should be >= bounds.getDouble(0)
    approx should be <= bounds.getDouble(1)
  }
}
