package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ClusterSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("duplicateClusters labels every vertex with its component minimum") {
    // two components: {1,2,3,4} chained, {10,11}; singleton 99 has no edges
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
  }

  test("long chain converges within iteration budget (diameter > 2)") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(chain).collect()
    out.length shouldBe 20
    out.map(_.getLong(1)).distinct shouldBe Array(1L)
  }

  test("driver union-find small path agrees with the distributed loop") {
    val pairs = Dedup.jaccardPairs(graft.Tables.documents(spark, sf0001),
      k = 5, threshold = 0.5).cache()
    val dist = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val star = Dedup.duplicateClustersStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val drv = Dedup.duplicateClustersDriver(pairs, maxEdges = 1000000)
    drv.isDefined shouldBe true
    drv.get.schema.map(f => (f.name, f.dataType)) shouldBe
      Seq(("doc_id", org.apache.spark.sql.types.LongType),
        ("component", org.apache.spark.sql.types.LongType))
    val local = drv.get.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    local shouldBe dist
    local shouldBe star
  }

  test("driver union-find degrades to None past the edge bound and on non-long keys") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    Dedup.duplicateClustersDriver(pairs, maxEdges = 1) shouldBe None
    val intPairs = Seq((1, 2)).toDF("doc_a", "doc_b")
    Dedup.duplicateClustersDriver(intPairs, maxEdges = 10) shouldBe None
  }

  test("clusters over real near-dup pairs partition the pair graph") {
    val pairs = Dedup.jaccardPairs(graft.Tables.documents(spark, sf0001),
      k = 5, threshold = 0.5).cache()
    val comp = Dedup.duplicateClusters(pairs)
    // every doc appearing in a pair is labeled
    val inPairs = pairs.select($"doc_a".as("d")).union(pairs.select($"doc_b")).distinct()
    comp.count() shouldBe inPairs.count()
    // both endpoints of every pair share a component
    val byDoc = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.select($"doc_a", $"doc_b").collect().foreach { r =>
      byDoc(r.getLong(0)) shouldBe byDoc(r.getLong(1))
    }
  }
}
