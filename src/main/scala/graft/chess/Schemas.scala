package graft.chess

import org.apache.spark.sql.types._

/** Explicit schemas for the chess pipeline.
  *
  * The bronze schema is declared rather than inferred (reference infers via
  * DuckDB `read_json_auto`, python_scripts.py:194) because the `accuracies`
  * struct is present in only ~7% of games — inference over a month with zero
  * analyzed games would silently drop the column and break downstream
  * projections. Declaring it also lets Spark's JSON reader prune unused
  * fields at parse time.
  */
object Schemas {

  private val player = StructType(Seq(
    StructField("rating", LongType),
    StructField("result", StringType),
    StructField("@id", StringType),
    StructField("username", StringType),
    StructField("uuid", StringType)))

  /** One record per game, as served by the Chess.com monthly-games API
    * (observed: reference dev_files/Data/2024-01/games.json; SURVEY.md §1.2).
    */
  val bronze: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("pgn", StringType),
    StructField("time_control", StringType),
    StructField("end_time", LongType),
    StructField("rated", BooleanType),
    StructField("tcn", StringType),
    StructField("uuid", StringType),
    StructField("initial_setup", StringType),
    StructField("fen", StringType),
    StructField("time_class", StringType),
    StructField("rules", StringType),
    StructField("white", player),
    StructField("black", player),
    StructField("accuracies", StructType(Seq(
      StructField("white", DoubleType),
      StructField("black", DoubleType))))))
}
