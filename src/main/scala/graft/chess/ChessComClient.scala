package graft.chess

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Duration

/** S1: driver-side ingest of a player's monthly games from the Chess.com
  * public API (`python_scripts.py:41-61`) into the bronze layer. Like the
  * reference, ingest stays OUTSIDE the engine: it produces the bronze JSON
  * file that [[ChessPipeline.readBronze]] consumes; no per-row network I/O
  * ever appears inside a query plan (the reference's UD2 anti-pattern).
  *
  * `transport` is injectable so the pipeline is testable offline and the
  * client is rate-limit-friendly (the caller owns retry/backoff policy).
  */
class ChessComClient(transport: String => String = ChessComClient.httpGet) {

  def monthlyGamesUrl(username: String, year: Int, month: Int): String =
    f"https://api.chess.com/pub/player/$username/games/$year/$month%02d"

  /** Returns the raw JSON text of the month's `games` array. The API wraps
    * the array in `{"games": [...]}`; bronze stores just the array (the
    * reference extracts `response.json()["games"]`).
    */
  def fetchMonth(username: String, year: Int, month: Int): String = {
    val body = transport(monthlyGamesUrl(username, year, month))
    ChessComClient.extractGamesArray(body)
  }

  /** S8: bronze JSON sink — writes the payload where the engine reads it. */
  def writeBronze(root: String, year: Int, month: Int, gamesJson: String): String = {
    val dir = Paths.get(root, "bronze")
    Files.createDirectories(dir)
    val target = dir.resolve(f"$year-$month%02d-games.json")
    Files.write(target, gamesJson.getBytes(StandardCharsets.UTF_8))
    target.toString
  }

  def ingestMonth(root: String, username: String, year: Int, month: Int): String =
    writeBronze(root, year, month, fetchMonth(username, year, month))
}

object ChessComClient {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  def httpGet(url: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(30))
      .header("User-Agent", "graft-chess-etl")
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"GET $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** Extract the `games` array from `{"games": [...]}` without a JSON
    * library dependency: find the top-level key and slice the balanced
    * bracket range (string-escape aware). Passes arrays through unchanged.
    */
  def extractGamesArray(body: String): String = {
    val trimmed = body.trim
    if (trimmed.startsWith("[")) return trimmed
    val keyIdx = trimmed.indexOf("\"games\"")
    require(keyIdx >= 0, "response has no \"games\" key")
    val start = trimmed.indexOf('[', keyIdx)
    require(start >= 0, "\"games\" key has no array value")
    var depth = 0
    var i = start
    var inString = false
    var escaped = false
    while (i < trimmed.length) {
      val c = trimmed.charAt(i)
      if (inString) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) return trimmed.substring(start, i + 1)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced games array")
  }
}
