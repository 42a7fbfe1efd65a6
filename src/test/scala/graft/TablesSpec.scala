package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `Tables.events` ts-type dispatch across both testdata
  * generations, so a driver-side parquet regeneration (int64-nanos ->
  * timestamp[us], which broke 17 queries in round 6) can't silently break
  * the reader again. Both generations must surface one stable column type
  * (TimestampType) with identical wall-clock values under the UTC session.
  */
class TablesSpec extends AnyFunSuite with SparkFixture {

  private def writeFixture(sql: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("tables-spec").toString
    spark.sql(sql).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events dispatch: timestamp[us] (TIMESTAMP_NTZ) generation reads as TimestampType") {
    // Spark writes TIMESTAMP_NTZ as parquet timestamp[us] isAdjustedToUTC=false,
    // exactly what the refreshed driver testdata ships.
    val dir = writeFixture(
      """SELECT CAST('2024-03-01T12:34:56.789' AS TIMESTAMP_NTZ) AS ts,
        |       1L AS user_id, 'click' AS kind""".stripMargin)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")).head.getString(0)
    assert(got === "2024-03-01 12:34:56.789")
    Tables.invalidate(Some(dir))
  }

  test("events dispatch: legacy int64-nanos generation still truncates to micros") {
    // With nanosAsLong, parquet TIMESTAMP(NANOS) loads as LongType; a plain
    // BIGINT fixture exercises the same LongType branch of the dispatch.
    val dir = writeFixture(
      """SELECT CAST(1709296496789123456 AS BIGINT) AS ts,
        |       1L AS user_id, 'click' AS kind""".stripMargin)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got === 1709296496789123L) // nanos truncated, not rounded
    Tables.invalidate(Some(dir))
  }

  test("events dispatch: already-TimestampType generation passes through") {
    val dir = writeFixture(
      """SELECT CAST('2024-03-01T12:34:56.789Z' AS TIMESTAMP) AS ts,
        |       1L AS user_id, 'click' AS kind""".stripMargin)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    Tables.invalidate(Some(dir))
  }

  test("real testdata events reads with TimestampType ts") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1)
  }
}
