package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorAggregatorsSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("vec_mean computes the element-wise centroid per group") {
    val df = Seq(
      (1, Array(1f, 2f)), (1, Array(3f, 4f)),
      (2, Array(10f, 20f))
    ).toDF("g", "v")
    val out = df.groupBy($"g").agg(VectorAggregators.vecMean($"v").as("c"))
      .orderBy("g").collect()
    out(0).getSeq[Float](1) shouldBe Seq(2f, 3f)
    out(1).getSeq[Float](1) shouldBe Seq(10f, 20f)
  }

  test("vec_mean merges partial buffers across partitions correctly") {
    val emb = graft.Tables.embeddings(spark, sf0001).repartition(7)
    val viaAgg = emb.agg(VectorAggregators.vecMean($"embedding")).head.getSeq[Float](0)
    // reference: per-dimension avg computed columnwise
    val dim = viaAgg.length
    val viaCols = emb.select((0 until dim).map(i =>
      avg(element_at($"embedding", i + 1)).as(s"d$i")): _*).head
    (0 until dim).foreach { i =>
      viaAgg(i).toDouble shouldBe viaCols.getDouble(i) +- 1e-4
    }
  }
}
