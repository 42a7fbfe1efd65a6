package graft.chess

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden validation of the longest-prefix opening matcher against the
  * reference notebook's hand-picked PGNs (test.ipynb cells 27-28) over the
  * same 3,514-line openings book. Expectations derived independently
  * (python longest-prefix over the CSV).
  */
class OpeningMatcherSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private val openingsCsv = "/root/reference/dev_files/Data/openings.csv"

  private val cases = Seq(
    // notebook cell 27 sample: the full Gent Gambit line is in the book
    ("1. Nh3 d5 2. g3 e5 3. f4 Bxh3 4. Bxh3 exf4 5. O-O fxg3 6. hxg3",
      "Amar Opening: Paris Gambit, Gent Gambit", "A00"),
    // cell 28 test_pgn
    ("1. e4 e6 2. Nf3 d5 3. exd5 exd5 4. Nc3 c6 5. g3 Bd6 6. Bg2 Ne7 7. O-O O-O 8. d3 Bg4 9. Bg5 f6 10. Bh4 Nd7",
      "French Defense: Knight Variation", "C00"),
    // cell 28 test_pgn_2
    ("1. e4 d5 2. exd5 Qxd5 3. Nc3 Qd8 4. d4 Nf6 5. Bf4 e6 6. Bd3 Nc6 7. Nf3 Bb4 8. O-O b6 9. Re1 Bxc3 10. bxc3 Bb7",
      "Scandinavian Defense: Valencian Variation", "B01"),
    // cell 28 test_pgn_3
    ("1. e4 e6 2. Nf3 d5 3. exd5 exd5 4. d4 Bd6 5. Nc3 Nf6 6. Bg5 c6 7. Ne5 O-O 8. Be2 Re8 9. Nf3 h6",
      "French Defense: Knight Variation", "C00"),
    // cell 28 test_pgn_4
    ("1. e4 b6 2. Nf3 Bb7 3. Nc3 g6 4. d4 Bg7 5. Bd3 Na6 6. O-O Nb4 7. e5 Nxd3 8. Qxd3 e6 9. Re1 Qe7 10. Bg5 f6",
      "Owen Defense", "B00"))

  test("dim_openings enrichment: csv colon-form names split family/variation; slug fallback") {
    assume(new java.io.File(openingsCsv).exists())
    val book = OpeningMatcher.readBook(spark, openingsCsv)
    // silver stand-in: cell-28 games under slug URLs, plus one URL whose
    // movetext matches nothing in the book (slug-only fallback path)
    val silver = (cases.zipWithIndex.map { case ((pgn, _, _), i) =>
      (s"https://www.chess.com/openings/Case-$i", "X00", pgn)
    } :+ (("https://www.chess.com/openings/Unknown-Line", "Z99", "1. z9 z9 2. z9 z9")))
      .toDF("pgn_eco_url", "pgn_eco", "pgn_trans")
    val dim = Dims.openingsFromSilverEnriched(silver, book)
      .orderBy("pgn_eco_url").collect()

    // case 1 (index 0): colon-form book name → meaningful split
    val c0 = dim(0)
    c0.getAs[String]("opening_name") shouldBe "Amar Opening: Paris Gambit, Gent Gambit"
    c0.getAs[String]("opening_family") shouldBe "Amar Opening"
    c0.getAs[String]("opening_variation") shouldBe " Paris Gambit, Gent Gambit"
    // last notebook case (index 4): book name without colon → family ==
    // name (reference UD3/UD4 semantics)
    dim(4).getAs[String]("opening_name") shouldBe "Owen Defense"
    dim(4).getAs[String]("opening_family") shouldBe "Owen Defense"
    // unmatched URL: slug-derived fallback, documented deviation
    val fb = dim(5)
    fb.getAs[String]("opening_name") shouldBe "Unknown Line"
    fb.getAs[String]("opening_family") shouldBe "Unknown Line"
    fb.getAs[String]("eco_code") shouldBe "Z99"
  }

  test("matcher reproduces the notebook's prototype cases (longest prefix)") {
    assume(new java.io.File(openingsCsv).exists())
    val book = OpeningMatcher.readBook(spark, openingsCsv)
    val games = cases.zipWithIndex
      .map { case ((pgn, _, _), i) => (i.toLong, pgn) }.toDF("id", "pgn_trans")
    val out = OpeningMatcher.matchOpenings(games, book)
      .orderBy("id").collect()
    out.zip(cases).foreach { case (r, (_, name, eco)) =>
      r.getAs[String]("opening_name") shouldBe name
      r.getAs[String]("opening_eco") shouldBe eco
    }
  }
}
