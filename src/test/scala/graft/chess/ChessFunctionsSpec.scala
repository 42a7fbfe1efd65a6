package graft.chess

import graft.SparkFixture
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden tests for the Column-expression ports of the reference's six
  * scalar UDFs (`airflow/dags/utils/udfs.py`), including the documented
  * quirks (SURVEY.md §2.11), plus the PGN header/move extractors validated
  * against the real 514-game Chess.com sample when present.
  */
class ChessFunctionsSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  // ---- UD1 add_move_numbers (udfs.py:53-75) ----------------------------

  test("addMoveNumbers pairs plies; full final pair ends without trailing space") {
    val out = Seq(Seq("e4", "e5", "Nf3", "Nc6")).toDF("m")
      .select(ChessFunctions.addMoveNumbers($"m")).head.getString(0)
    out shouldBe "1. e4 e5 2. Nf3 Nc6" // reference ' '.join: no trailing space
  }

  test("addMoveNumbers odd ply count: trailing white move keeps its space (quirk 4)") {
    // the reference f-string's space before the empty black survives
    val out = Seq(Seq("e4", "e5", "Nf3")).toDF("m")
      .select(ChessFunctions.addMoveNumbers($"m")).head.getString(0)
    out shouldBe "1. e4 e5 2. Nf3 "
  }

  test("addMoveNumbers empty array -> empty string") {
    val out = Seq(Seq.empty[String]).toDF("m")
      .select(ChessFunctions.addMoveNumbers($"m")).head.getString(0)
    out shouldBe ""
  }

  // ---- UD3/UD4 family/variation split (udfs.py:78-120) -----------------

  test("openingFamily/Variation split on first colon; passthrough without colon") {
    val df = Seq("Sicilian Defense: Najdorf Variation", "King's Pawn").toDF("n")
      .select(ChessFunctions.openingFamily($"n").as("f"),
        ChessFunctions.openingVariation($"n").as("v"))
    val rows = df.collect()
    rows(0).getString(0) shouldBe "Sicilian Defense"
    rows(0).getString(1) shouldBe " Najdorf Variation" // leading space preserved
    rows(1).getString(0) shouldBe "King's Pawn"
    rows(1).getString(1) shouldBe "King's Pawn"
  }

  test("openingNameFromUrl parses the ECO-URL slug (UD2 replacement)") {
    val out = Seq("https://www.chess.com/openings/Englund-Gambit-Hartlaub-Charlick-Gambit")
      .toDF("u").select(ChessFunctions.openingNameFromUrl($"u")).head.getString(0)
    out shouldBe "Englund Gambit Hartlaub Charlick Gambit"
  }

  // ---- UD5 get_pgn_depth (udfs.py:123-136) ------------------------------

  test("pgnDepth counts full-move numbers") {
    val out = Seq("1. e4 e5 2. Nf3 Nc6 3. Bb5").toDF("p")
      .select(ChessFunctions.pgnDepth($"p")).head.getInt(0)
    out shouldBe 3
  }

  // ---- UD6 format_time_control (udfs.py:153-171) ------------------------

  test("formatTimeControl: base+inc -> min|inc, floor division (quirk 5)") {
    val df = Seq("120+1", "600", "90", "300+5").toDF("tc")
      .select(ChessFunctions.formatTimeControl($"tc"))
    df.collect().map(_.getString(0)) shouldBe Array("2|1", "10", "1", "5|5")
  }

  test("formatTimeControl: daily '1/86400' controls pass through instead of failing the batch") {
    // the reference UDF raises on moves-per-period strings; under Spark ANSI
    // a plain cast would abort the whole job — documented deviation: bad
    // values survive unformatted
    val df = Seq("1/86400", "600", "abc").toDF("tc")
      .select(ChessFunctions.formatTimeControl($"tc"))
    df.collect().map(_.getString(0)) shouldBe Array("1/86400", "10", "abc")
  }

  // ---- F1/F2 PGN extraction against the real sample ---------------------

  private val samplePath = "/root/reference/dev_files/Data/2024-01/games.json"

  test("pgnHeader + pgnMoves on the real 514-game Chess.com sample") {
    assume(new java.io.File(samplePath).exists())
    val games = spark.read.option("multiLine", true).json(samplePath)
    games.count() shouldBe 514L

    val parsed = games.select(
      ChessFunctions.pgnHeader($"pgn", "Event").as("event"),
      ChessFunctions.pgnHeader($"pgn", "Date").as("date"),
      ChessFunctions.pgnHeader($"pgn", "White").as("white"),
      ChessFunctions.pgnMoves($"pgn").as("moves"))
    val first = parsed.head
    first.getString(0) shouldBe "Live Chess"
    first.getString(1) shouldBe "2024.01.01"
    first.getString(2) shouldBe "restlessbuddha"
    first.getSeq[String](3).take(2) shouldBe Seq("d4", "e5")

    // every game has the mandatory headers
    parsed.filter($"event" === "" || $"date" === "").count() shouldBe 0L
    // movetext parses to a non-empty ply list for every game
    parsed.filter(F.size($"moves") === 0).count() shouldBe 0L
  }

  test("addMoveNumbers(pgnMoves) round-trips depth on the real sample") {
    assume(new java.io.File(samplePath).exists())
    val games = spark.read.option("multiLine", true).json(samplePath)
    val df = games.select(
      ChessFunctions.pgnMoves($"pgn").as("moves"))
      .select(F.size($"moves").as("plies"),
        ChessFunctions.pgnDepth(ChessFunctions.addMoveNumbers($"moves")).as("depth"))
    // depth = ceil(plies / 2) for every game
    df.filter($"depth" =!= ceil($"plies" / 2.0).cast("int")).count() shouldBe 0L
  }
}
