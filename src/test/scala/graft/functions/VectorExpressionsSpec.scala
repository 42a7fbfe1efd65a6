package graft.functions

import graft.SparkFixture
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorExpressionsSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private val df = Seq(
    (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (Array(0f, 0f), Array(1f, 1f))
  ).toDF("a", "b")

  test("vec_dot accumulates in double") {
    df.select(vec_dot($"a", $"b")).collect().map(_.getDouble(0)) shouldBe Array(32.0, 0.0)
  }

  test("vec_norm") {
    df.select(vec_norm($"a")).head.getDouble(0) shouldBe math.sqrt(14.0)
  }

  test("vec_cosine; zero vector yields 0.0") {
    val out = df.select(vec_cosine($"a", $"b")).collect().map(_.getDouble(0))
    out(0) shouldBe 32.0 / (math.sqrt(14.0) * math.sqrt(77.0)) +- 1e-15
    out(1) shouldBe 0.0
  }

  test("null inputs propagate null") {
    val withNull = Seq((Some(Array(1f)), Option.empty[Array[Float]])).toDF("a", "b")
    withNull.select(vec_dot($"a", $"b")).head.isNullAt(0) shouldBe true
  }

  test("interpreted path (eval) matches codegen") {
    // wholestage off forces the interpreted/eval path through the same plan
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      df.select(vec_cosine($"a", $"b")).head.getDouble(0) shouldBe
        32.0 / (math.sqrt(14.0) * math.sqrt(77.0)) +- 1e-15
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("type check rejects non-float arrays") {
    val bad = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    an[Exception] should be thrownBy bad.select(vec_dot($"a", $"b")).collect()
  }

  test("cos6AtLeast ≡ eager cos6 >= t — including rounding-band and mixed-dim inputs") {
    // the lazy threshold test (r16, semanticKeep's hot loop) must decide
    // identically to the eager kernel for every pair — exercised across
    // random vectors, NEAR-BAND thresholds derived from the pair's own
    // cosine (t = cos ± {0, 1e-7, 5e-7, 1e-6}), and a mixed-length pair
    // (truncated-norm fallback)
    val rnd = new scala.util.Random(7)
    def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 2f - 1f)
    val pairs = Seq.fill(200)((vec(16), vec(16))) :+ ((vec(16), vec(12)))
    for ((a, b) <- pairs) {
      val eager = IvfKernel.cos6(a, b)
      val base = Seq(0.0, 0.3, eager)
      val deltas = Seq(-1e-6, -5e-7, -1e-7, 0.0, 1e-7, 5e-7, 1e-6)
      for (t0 <- base; dl <- deltas) {
        val t = t0 + dl
        IvfKernel.cos6AtLeast(a, IvfKernel.norm(a), b, IvfKernel.norm(b), t) shouldBe
          (eager >= t)
      }
    }
  }
}
