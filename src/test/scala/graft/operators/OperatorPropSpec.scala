package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for the round-5 operators: each is checked against its
  * brute-force semantic definition on randomized inputs — not goldens —
  * with the randomized cases evaluated through full Spark plans.
  */
class OperatorPropSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("property: interval join equals nested loop for random intervals/points/widths") {
    val g = for {
      pts <- Gen.listOfN(40, Gen.choose(-500L, 500L))
      ivs <- Gen.listOfN(25, Gen.zip(Gen.choose(-500L, 500L), Gen.choose(-50L, 120L)))
      w <- Gen.oneOf(1L, 3L, 17L, 100L, 1000L)
    } yield (pts, ivs.map { case (s, len) => (s, s + len) }, w)
    for (i <- 1 to 5) {
      val (pts, ivs, w) = g.sample.getOrElse(fail(s"gen failed at $i"))
      val points = pts.zipWithIndex.map { case (p, id) => (id.toLong, p) }.toDF("pid", "p")
      val intervals = ivs.zipWithIndex.map { case ((s, e), id) => (id.toLong, s, e) }
        .toDF("iid", "s", "e")
      val got = IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      val exp = (for {
        (p, pid) <- pts.zipWithIndex
        ((s, e), iid) <- ivs.zipWithIndex
        if p >= s && p < e
      } yield (pid.toLong, iid.toLong)).toSet
      withClue(s"case $i (w=$w): ") { got shouldBe exp }
    }
  }

  test("property: packSequences tiles [0, total) regardless of id gaps and order") {
    val g = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 100000L), Gen.choose(1L, 40L)))
    for (i <- 1 to 4) {
      val raw = g.sample.getOrElse(fail("gen failed"))
        .groupBy(_._1).map { case (id, vs) => (id, vs.head._2) }.toSeq // unique ids
      val df = raw.toDF("doc_id", "n_tokens")
      val out = Packing.packSequences(df, "doc_id", "n_tokens", capacity = 64L,
          buckets = 7)
        .orderBy("doc_id").collect()
      // start offsets are the exclusive prefix sums of token counts in id order
      var cum = 0L
      raw.sortBy(_._1).zip(out).foreach { case ((id, n), row) =>
        row.getLong(0) shouldBe id
        row.getLong(2) shouldBe cum
        row.getLong(3) shouldBe cum / 64L
        row.getLong(4) shouldBe cum % 64L
        cum += n
      }
    }
  }

  test("property: bm25 equals a reference implementation on random corpora") {
    val word = Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox")
    val g = Gen.listOfN(12, Gen.nonEmptyListOf(word).map(_.mkString(" ")))
    for (_ <- 1 to 3) {
      val texts = g.sample.getOrElse(fail("gen failed"))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("cat", "fox")
      val got = Retrieval.bm25(docs, terms).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // reference: direct double arithmetic over the same tokenization
      val toks = texts.map(_.split(" ", -1).toSeq)
      val n = toks.size.toDouble
      val avgdl = toks.map(_.size).sum.toDouble / n
      val exp = toks.zipWithIndex.flatMap { case (ws, i) =>
        val score = terms.map { t =>
          val df = toks.count(_.contains(t)).toDouble
          val tf = ws.count(_ == t).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ws.size / avgdl))
        }.sum
        val r = BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (r > 0) Some(i.toLong -> r) else None
      }.toMap
      got.keySet shouldBe exp.keySet
      got.foreach { case (k, v) => v shouldBe exp(k) +- 1e-6 }
    }
  }

  test("property: probe_term_stats equals the composed split formulation on random text") {
    // tokens drawn from a pool that includes the probe terms, near-misses
    // (prefixes/suffixes), empties (consecutive spaces), and multi-byte
    // UTF-8 — joined with single spaces so consecutive picks of "" create
    // space runs and leading/trailing empties
    val terms = Seq("cat", "\u00e9t\u00e9", "x")
    val pool = Gen.oneOf("cat", "cats", "ca", "\u00e9t\u00e9", "\u00e9t", "x", "xx", "", "dog",
      "\ud83d\ude00", "\u00e9t\u00e9e")
    val g = Gen.listOfN(30, pool).map(_.mkString(" "))
    val texts = (1 to 60).flatMap(i => g.sample) :+ "" :+ " " :+ "cat"
    val df = texts.toDF("text")
    val composedCols: Seq[org.apache.spark.sql.Column] =
      org.apache.spark.sql.functions.size(split($"text", " ")).cast("long") +:
        terms.map(t => org.apache.spark.sql.functions.size(
          filter(split($"text", " "),
            (w: org.apache.spark.sql.Column) => w === lit(t))).cast("long"))
    df.select(
        graft.functions.TextFunctions.probe_term_stats($"text", terms).as("native"),
        array(composedCols: _*).as("composed"))
      .filter($"native" =!= $"composed").count() shouldBe 0L
  }
}
