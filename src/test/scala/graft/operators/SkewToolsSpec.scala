package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkewToolsSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_suppkey", $"l_quantity")
    val supp = graft.Tables.supplier(spark, sf0001)
      .select($"s_suppkey".as("l_suppkey"), $"s_name")
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = SkewTools.saltedJoin(li, supp, "l_suppkey", salt = 8)
    salted.count() shouldBe plain.count()
    salted.select(plain.columns.map(col): _*)
      .except(plain).count() shouldBe 0L
    plain.except(salted.select(plain.columns.map(col): _*)).count() shouldBe 0L
  }

  test("saltedSumCount equals the direct aggregation") {
    val ev = graft.Tables.events(spark, sf0001)
    val direct = ev.groupBy($"user_id")
      .agg(sum($"value").as("sum_value"), count(lit(1)).as("n"))
    val salted = SkewTools.saltedSumCount(ev, "user_id", "value", salt = 8)
    salted.count() shouldBe direct.count()
    // compare after rounding (double sum order differs across salt buckets)
    val d = direct.select($"user_id", round($"sum_value", 6).as("s"), $"n")
    val s = salted.select($"user_id", round($"sum_value", 6).as("s"), $"n")
    d.except(s).count() shouldBe 0L
  }

  test("salt assignment is content-deterministic: stable under repartitioning and rerun") {
    val ev = graft.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"value")
    def salts(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(8)))
        .select($"event_id", $"__salt").as[(Long, Int)].collect().toMap
    val a = salts(ev)
    val b = salts(ev.repartition(7, $"value")) // different layout, same rows
    a shouldBe b
    // and the salt actually scatters a hot key across buckets
    val hot = ev.withColumn("user_id", lit(1L))
    val perKey = hot.withColumn("__salt", pmod(hash(hot.columns.map(col): _*), lit(8)))
      .select($"__salt").distinct().count()
    perKey should be > 1L
  }

  test("keyHistogram surfaces the heaviest keys first") {
    val h = SkewTools.keyHistogram(graft.Tables.events(spark, sf0001), "event_type", 3)
      .collect()
    h.length shouldBe 3
    h.map(_.getLong(1)).toSeq shouldBe h.map(_.getLong(1)).toSeq.sorted.reverse
  }
}
