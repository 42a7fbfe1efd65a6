package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LayoutSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int = 16): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zorderKey2($"x", $"y", bits)).head.getLong(0)

  test("zorderKey2: hand-computed interleavings") {
    z(0, 0) shouldBe 0L
    z(1, 0) shouldBe 1L // x bits land even
    z(0, 1) shouldBe 2L // y bits land odd
    z(1, 1) shouldBe 3L
    z(2, 3) shouldBe 14L  // x=10, y=11 → 1110
    z(5, 0) shouldBe 17L  // x=101 → 10001
    z(65535, 65535) shouldBe 4294967295L // full 16-bit range → 2^32 - 1
  }

  test("zorderKey2 is a bijection on the 4-bit × 4-bit grid") {
    val keys = spark.range(256)
      .select((col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
      .select(Layout.zorderKey2(col("x"), col("y"), bits = 4).as("z"))
      .as[Long].collect()
    keys.distinct.length shouldBe 256
    keys.min shouldBe 0L
    keys.max shouldBe 255L
  }

  test("clusterByZorder: partition z-ranges are disjoint and rows are kept") {
    val df = spark.range(1000)
      .select((col("id") % 37).as("x"), (col("id") % 53).as("y"), col("id"))
    val out = Layout.clusterByZorder(df, col("x"), col("y"), bits = 6,
      numPartitions = 8)
    out.count() shouldBe 1000L
    out.columns.toSeq shouldBe Seq("x", "y", "id") // working column dropped
    val ranges = out
      .select(Layout.zorderKey2(col("x"), col("y"), 6).as("z"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array(a, b) => a._3 should be <= b._2 // hi(p) ≤ lo(next)
      case _           =>
    }
  }
}
