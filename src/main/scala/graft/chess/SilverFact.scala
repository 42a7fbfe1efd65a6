package graft.chess

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze → silver monthly transform: the reference's 23-column fact
  * projection (python_scripts.py:169-205) as one declarative `select` —
  * struct field access, 13 PGN header extractions, date parsing, and the
  * numbered-movetext rebuild, all codegen-friendly Column expressions.
  *
  * The reference parses StartTime/EndTime to a TIME type and recombines
  * with the date in pandas; Spark has no TIME type, so we build the full
  * timestamps directly (`to_timestamp(concat(date, ' ', time))`) — same
  * result, one engine pass (SURVEY.md §1.3, F4).
  */
object SilverFact {

  def transform(bronze: DataFrame): DataFrame = {
    val h = ChessFunctions.pgnHeader(col("pgn"), _: String)
    // try_* variants: a malformed or absent header yields null instead of
    // an ANSI parse error — one bad game must not fail a 100 TB batch
    val pgnDate = try_to_date(regexp_replace(h("Date"), "\\.", "/"), "yyyy/MM/dd")
    val endDate = try_to_date(regexp_replace(h("EndDate"), "\\.", "/"), "yyyy/MM/dd")
    val plies = ChessFunctions.pgnMoves(col("pgn"))
    bronze.select(
      col("url").as("game_url"),
      col("time_control"),
      col("rated"),
      col("time_class"),
      col("rules"),
      col("white.rating").as("white_rating"),
      col("white.result").as("white_result"),
      col("black.rating").as("black_rating"),
      col("black.result").as("black_result"),
      h("Event").as("pgn_event"),
      h("Site").as("pgn_site"),
      pgnDate.as("game_date"),
      h("White").as("pgn_white_user"),
      h("Black").as("pgn_black_user"),
      h("Result").as("pgn_result"),
      h("CurrentPosition").as("pgn_current_position"),
      h("Timezone").as("pgn_timezone"),
      h("ECO").as("pgn_eco"),
      h("ECOUrl").as("pgn_eco_url"),
      try_to_timestamp(concat_ws(" ", pgnDate.cast("string"), h("StartTime")),
        lit("yyyy-MM-dd HH:mm:ss")).as("start_time"),
      try_to_timestamp(concat_ws(" ", endDate.cast("string"), h("EndTime")),
        lit("yyyy-MM-dd HH:mm:ss")).as("end_time"),
      endDate.as("end_game_date"),
      array_join(plies, " ").as("pgn_raw"),
      ChessFunctions.addMoveNumbers(plies).as("pgn_trans"))
  }
}
