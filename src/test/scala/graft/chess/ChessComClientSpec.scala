package graft.chess

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ChessComClientSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val samplePath = "/root/reference/dev_files/Data/2024-01/games.json"

  test("monthlyGamesUrl formats the public API path") {
    new ChessComClient().monthlyGamesUrl("someuser", 2024, 3) shouldBe
      "https://api.chess.com/pub/player/someuser/games/2024/03"
  }

  test("extractGamesArray unwraps {games: [...]} with nested brackets/strings") {
    val body = """{"games": [{"pgn": "[Event \"x]\"] {[%clk 1]}", "a": [1,2]}]}"""
    ChessComClient.extractGamesArray(body) shouldBe
      """[{"pgn": "[Event \"x]\"] {[%clk 1]}", "a": [1,2]}]"""
    // bare arrays pass through
    ChessComClient.extractGamesArray("""[{"x": 1}]""") shouldBe """[{"x": 1}]"""
  }

  test("ingestMonth with a fake transport writes bronze the pipeline can read") {
    assume(new java.io.File(samplePath).exists())
    val sample = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(samplePath)), "UTF-8")
    var requested: String = null
    val client = new ChessComClient(transport = { url =>
      requested = url
      s"""{"games": $sample}"""
    })
    val root = java.nio.file.Files.createTempDirectory("ingest").toString
    val written = client.ingestMonth(root, "rhythmbear1", 2024, 1)
    requested shouldBe "https://api.chess.com/pub/player/rhythmbear1/games/2024/01"
    written should endWith("bronze/2024-01-games.json")
    val pipe = new ChessPipeline(spark, root, "Rhythmbear1")
    pipe.readBronze(2024, 1).count() shouldBe 514L
  }
}
