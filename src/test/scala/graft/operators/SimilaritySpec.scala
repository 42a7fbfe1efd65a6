package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SimilaritySpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("bruteForceTopK ranks by cosine, excludes self, respects k") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 1L)
    val out = Similarity.bruteForceTopK(corpus, queries, k = 2).collect()
    out.length shouldBe 2
    out.map(_.getLong(1)).toSeq shouldBe Seq(2L, 3L) // by cosine desc
    out.map(_.getLong(3)).toSeq shouldBe Seq(1L, 2L)
  }

  private lazy val emb = graft.Tables.embeddings(spark, sf0001)
  private lazy val queries = emb.filter($"vec_id" % 100 === 0)
  private lazy val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
    .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet

  test("bruteForceTopK kernel is row-identical to the declarative plan") {
    // pins the mapPartitions kernel (partition-local top-k, lazy half-up
    // rounding, decomposed norm accumulation) to the nested-loop-join +
    // window spelling on real embeddings — full rows including cos_r, so
    // any drift in accumulation order or rounding fails loudly
    val kernel = Similarity.bruteForceTopK(emb, queries, k = 10)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val plan = Similarity.bruteForceTopKPlan(emb, queries, k = 10)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    kernel should have length plan.length.toLong
    kernel shouldBe plan
  }

  test("bruteForceTopK enforces the maxQueries broadcast contract") {
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, emb, k = 3, maxQueries = 5)
    }
    e.getMessage should include("maxQueries")
  }

  test("lshTopK kernel is row-identical to the declarative plan") {
    // pins the probe-map mapPartitions kernel (bucket-filtered scoring,
    // partition-local top-k, lazy half-up rounding) to the broadcast-join +
    // dedup-agg + window spelling on real embeddings — any drift in bucket
    // assignment, probe masks, accumulation order or rounding fails loudly
    val kernel = Similarity.lshTopK(emb, queries, k = 10)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
    val plan = Similarity.lshTopKPlan(emb, queries, k = 10)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
    kernel should have length plan.length.toLong
    kernel shouldBe plan
  }

  test("lshTopK enforces the maxQueries broadcast contract") {
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopK(emb, emb, k = 3, maxQueries = 5)
    }
    e.getMessage should include("maxQueries")
  }

  test("lshTopK multi-probe recall vs brute force on real embeddings") {
    val approx = Similarity.lshTopK(emb, queries, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    info(s"lsh recall@10 = $recall")
    // quasi-random 64-dim synthetic embeddings are LSH's worst case: top-10
    // neighbors sit near cos~0.4, where P(<=2 of 8 plane-bit flips) ~ 0.25
    recall should be >= 0.2
  }

  test("ivfTopK kernel is row-identical to the declarative plan (both refine depths)") {
    // pins the probe-map mapPartitions kernel (r15: cell-filtered scoring,
    // partition-local top-k, lazy half-up rounding, driver-side probe
    // ranking through the SAME IvfKernel.topCells as the in-plan
    // expression) to the broadcast-probe-join + window spelling on real
    // embeddings — any drift in centroid seeding, cell assignment, probe
    // ranking, accumulation order or rounding fails loudly. Both refine
    // depths: refineSteps = 0 is ann_ivf's shape, 1 is ann_ivf_refined's.
    for (steps <- Seq(0, 1)) {
      val kernel = Similarity.ivfTopK(emb, queries, k = 10, refineSteps = steps)
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
      val plan = Similarity.ivfTopKPlan(emb, queries, k = 10, refineSteps = steps)
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
      withClue(s"refineSteps=$steps: ") {
        kernel should have length plan.length.toLong
        kernel shouldBe plan
      }
    }
  }

  test("ivfTopK enforces the maxQueries broadcast contract") {
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, emb, k = 3, maxQueries = 5)
    }
    e.getMessage should include("maxQueries")
  }

  test("ivfTopK recall vs brute force on real embeddings") {
    val approx = Similarity.ivfTopK(emb, queries, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    info(s"ivf recall@10 = $recall")
    recall should be >= 0.5 // nprobe/nlist = 1/4 of cells scanned
  }

  test("planted clusters: lshTopK recall >= 0.6 and ivfTopK recall >= 0.7") {
    // the quasi-random synthetic corpus above is ANN's worst case (every
    // neighbor near the decision boundary); real embedding corpora are
    // clustered, which is the regime these operators are built for — plant
    // 20 tight clusters and require the recall the theory predicts there
    val rnd = new scala.util.Random(42)
    val dim = 64
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for { c <- centers.indices; m <- 0 until 25 } yield {
      val v = Array.tabulate(dim)(i => centers(c)(i) + 0.15f * rnd.nextGaussian().toFloat)
      ((c * 1000 + m).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" % 1000 === 0) // one query per cluster
    val b = Similarity.bruteForceTopK(corpus, qs, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, qs, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, qs, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lshRecall = (b intersect lsh).size.toDouble / b.size
    val ivfRecall = (b intersect ivf).size.toDouble / b.size
    info(s"planted-cluster recall@10: lsh = $lshRecall, ivf = $ivfRecall")
    lshRecall should be >= 0.6
    ivfRecall should be >= 0.7
  }

  test("suggestNlist follows the corpus, floors at 32, fails past the flat ceiling") {
    Similarity.suggestNlist(0L) shouldBe 32
    Similarity.suggestNlist(10000L) shouldBe 32          // tiny corpus: floor
    Similarity.suggestNlist(1024L * 1024L) shouldBe 1024 // 1M rows -> 1k cells
    Similarity.suggestNlist(1024L * 1024L, targetCellRows = 2048L) shouldBe 512
    // 100 TB-ish row counts want a coarse first level, not a flat scan
    val e = intercept[IllegalArgumentException] {
      Similarity.suggestNlist(100L * 1000L * 1000L * 1000L)
    }
    e.getMessage should include("coarse first-level index")
  }
}
