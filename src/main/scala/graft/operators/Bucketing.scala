package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support for co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of a fact-fact join (e.g. lineitem⋈orders)
  * is the shuffle of both sides. Persisting the tables bucketed by the join
  * key removes that exchange for *every* subsequent join/aggregation on
  * the key — the classic write-once-shuffle, read-many-joins trade.
  * `BucketedJoinSpec` asserts the physical plan is exchange-free.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
