package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the r15 IVF seeding fix (VERDICT r14 #4): on a corpus whose
  * vec_ids CORRELATE with cluster membership (the common ingest-order
  * reality), the old first-nlist-by-id seed put every centroid inside one
  * true cluster; the hash-ordered sample + Lloyd refinement must instead
  * produce cells whose sizes stay within a small factor of the mean, so
  * `semanticDedup`'s quadratic per-cell kernel and `ivfTopK`'s probe cost
  * stay bounded.
  */
class CellBalanceSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private val dim = 8
  private val clusters = 8
  private val per = 512

  // 8 tight clusters on orthogonal axes; ids 0..511 are ALL cluster 0,
  // 512..1023 cluster 1, … — adversarial for any id-prefix seed
  private lazy val emb = {
    val rnd = new scala.util.Random(42)
    val rows = for (c <- 0 until clusters; i <- 0 until per) yield {
      val v = Array.tabulate(dim)(j =>
        (if (j == c) 10f else 0f) + (rnd.nextFloat() - 0.5f) * 0.2f)
      ((c * per + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("hash-ordered seed samples across id-correlated clusters (id-prefix seed could not)") {
    val seeds = Similarity.ivfCentroids(emb, nlist = 16, refineSteps = 0)
    seeds.length shouldBe 16
    // seed ids spread over the id space → they touch most true clusters;
    // the first-16-by-id seed would have covered exactly ONE (ids 0..15)
    val coveredClusters = seeds.map(_._1 / per).distinct.length
    coveredClusters should be >= 6
  }

  test("refined centroids keep max/mean cell size bounded on the clustered corpus") {
    val cents = Similarity.ivfCentroids(emb, nlist = 16, refineSteps = 2)
    cents.length should be >= clusters // at least one centroid per basin survives
    val sizes = emb.select(graft.functions.VectorFunctions.ivf_argmax_cell(
        $"embedding", cents.map(_._1), cents.map(_._2)).as("cell"))
      .groupBy("cell").count().collect().map(_.getLong(1))
    sizes.sum shouldBe (clusters * per).toLong
    val mean = sizes.sum.toDouble / sizes.length
    // the operational property the guards downstream rely on: no cell
    // concentrates the corpus. A fully degenerate seed yields one cell of
    // ~everything (max/mean → nlist); balanced cells sit at a small factor
    withClue(s"cell sizes: ${sizes.sorted.mkString(",")}") {
      sizes.max.toDouble should be <= 3.0 * mean
    }
  }
}
