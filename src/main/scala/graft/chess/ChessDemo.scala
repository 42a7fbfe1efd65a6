package graft.chess

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the chess engine — what a user of the
  * reference runs today, on this library:
  * ingest (offline: the bundled 514-game sample; online: the real
  * Chess.com API via [[ChessComClient]]) → bronze → silver → gold star
  * schema → opening matching → dashboard queries, printed.
  *
  * Usage: sbt "runMain graft.chess.ChessDemo [workDir]"
  */
object ChessDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("chess-demo").toString)
    val sample = "/root/reference/dev_files/Data/2024-01/games.json"
    val openingsCsv = "/root/reference/dev_files/Data/openings.csv"

    val spark = graft.GraftSession.create(_
      .master("local[8]")
      .appName("chess-demo")
      .config("spark.sql.shuffle.partitions", 8))

    // ingest: offline transport replays the bundled sample (swap for
    // ChessComClient.httpGet in a connected environment)
    val client = new ChessComClient(transport = _ =>
      s"""{"games": ${new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sample)), "UTF-8")}}""")
    client.ingestMonth(root, "rhythmbear1", 2024, 1)

    val pipe = new ChessPipeline(spark, root, "Rhythmbear1",
      openingsBook = Some(openingsCsv).filter(p => new java.io.File(p).exists()))
    pipe.runMonth(2024, 1, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    ChessAnalytics.registerViews(pipe)

    println(s"\n=== gold fact: ${pipe.fact.count()} games ===")
    println("\n=== win rate by opening family (top 10) ===")
    spark.sql("SELECT * FROM win_rate_by_family LIMIT 10").show(truncate = false)
    println("=== win rate by color and time class ===")
    spark.sql("SELECT * FROM win_rate_by_color_class ORDER BY my_color, time_class")
      .show(truncate = false)
    println("=== rating by day (first 10) ===")
    spark.sql("SELECT * FROM rating_by_day LIMIT 10").show(truncate = false)

    if (new java.io.File(openingsCsv).exists()) {
      println("=== book openings matched (longest-prefix, top 10 by games) ===")
      val book = OpeningMatcher.readBook(spark, openingsCsv)
      OpeningMatcher.matchOpenings(pipe.fact, book, "game_pgn")
        .groupBy("opening_name").count()
        .orderBy(org.apache.spark.sql.functions.desc("count")).limit(10)
        .show(truncate = false)
    }
    spark.stop()
  }
}
