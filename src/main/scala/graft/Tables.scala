package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir` (one of
  * /root/testdata/sf{0.001,0.01,0.1}). Reads are plain parquet scans so
  * Catalyst's predicate pushdown and column pruning apply to everything
  * built on top; at cluster scale the same call works on a partitioned
  * directory unchanged.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")

  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark refuses
    * by default. Read the nanos as a long and truncate to microsecond
    * precision (identical to how DuckDB/the oracle coerces ns -> us).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
