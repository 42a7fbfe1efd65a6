package graft.chess

import java.sql.{Connection, DriverManager}

/** EP3 step 1: warehouse DDL (sql/create_datawarehouse.sql) — the star
  * schema created ahead of the loads, with primary keys on the natural
  * keys. The DDL is portable ANSI (VARCHAR lengths added because Derby —
  * the embedded stand-in for Postgres here — requires them; Postgres
  * accepts them unchanged). As in the reference, the actual loads are
  * full-replace writes and the DDL drifts from the loaded frames for two
  * aspirational columns (`dim_date.date_id`/`is_weekend`,
  * `dim_users` never populated) — reproduced for schema parity.
  *
  * KNOWN ENVIRONMENT CONSTRAINT: the reference attaches a live PostgreSQL
  * server (test.ipynb cells 21-23, python_scripts.py:639-645); this sandbox
  * has none, so every JDBC spec runs against embedded Derby. The engine
  * code is dialect-agnostic (`DataFrameWriter.jdbc` + this ANSI DDL —
  * switching is a URL/driver change), but Postgres-specific behavior
  * (type mapping, `if_exists="replace"` table rewrites under concurrent
  * readers) is deliberately NOT simulated. When a PG container becomes
  * available, add a round-trip spec against it rather than trusting Derby
  * parity.
  */
object Warehouse {

  private val V = "VARCHAR(1024)"

  def ddlStatements(schema: String = "chess_dw"): Seq[String] = Seq(
    s"CREATE SCHEMA $schema",
    s"""CREATE TABLE $schema.fact_games (
       | game_url $V PRIMARY KEY,
       | game_date TIMESTAMP, start_time TIMESTAMP, end_time TIMESTAMP,
       | game_duration_secs INTEGER, time_control $V, my_color $V,
       | my_rating INTEGER, opponent_rating INTEGER,
       | my_result $V, opponent_result $V, game_fen $V, opening_url $V,
       | game_pgn ${"VARCHAR(32000)"}, moves INTEGER, last_updated TIMESTAMP)""".stripMargin,
    s"""CREATE TABLE $schema.dim_date (
       | date_id INTEGER PRIMARY KEY, game_date DATE, "year" INTEGER,
       | "month" INTEGER, month_name $V, "day" INTEGER, day_of_the_week $V,
       | quarter INTEGER, is_weekend BOOLEAN)""".stripMargin,
    s"""CREATE TABLE $schema.dim_openings (
       | pgn_eco_url $V PRIMARY KEY, opening_name $V, opening_family $V,
       | opening_variation $V, eco_code $V)""".stripMargin,
    s"""CREATE TABLE $schema.dim_users (
       | user_id $V PRIMARY KEY, full_name $V, nationality $V)""".stripMargin,
    s"""CREATE TABLE $schema.dim_time_control (
       | time_control $V PRIMARY KEY, time_class $V)""".stripMargin,
    s"""CREATE TABLE $schema.dim_results (
       | result_code $V PRIMARY KEY, "result" $V, description $V)""".stripMargin)

  /** Execute the DDL, ignoring already-exists errors (idempotent re-run —
    * the reference relies on IF NOT EXISTS).
    */
  def createSchema(jdbcUrl: String, schema: String = "chess_dw"): Unit = {
    val conn: Connection = DriverManager.getConnection(jdbcUrl)
    try {
      val st = conn.createStatement()
      ddlStatements(schema).foreach { sql =>
        try st.executeUpdate(sql)
        catch {
          case e: java.sql.SQLException
              if Option(e.getSQLState).exists(s => s.startsWith("X0Y") ||
                s == "42710" || s == "42P06" || s == "42P07") =>
          // already-exists states across dialects: Derby X0Y32/X0Y68,
          // standard 42710, PostgreSQL 42P06 (schema) / 42P07 (table) —
          // idempotent rerun
        }
      }
      st.close()
    } finally conn.close()
  }
}
