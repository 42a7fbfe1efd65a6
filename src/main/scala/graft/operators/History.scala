package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — the warehouse-ETL op that
  * turns an event/snapshot stream into SCD Type-2 validity intervals
  * (Kimball's dimension-history pattern; the reference's warehouse keeps
  * only latest-wins Type-1 state, `python_scripts.py:563-598`, so this is
  * the natural next dimension-management capability a user would reach
  * for).
  *
  * Semantics: per key, order observations by `(tsCol, tieCol)` and
  * collapse CONSECUTIVE runs of an unchanged attribute into one version
  * row: `valid_from` = first observation timestamp of the run,
  * `valid_to` = start of the next run (null for the current version).
  * The tie-break column makes the order total when timestamps collide —
  * without it, two same-timestamp observations of different values would
  * give engine-dependent histories.
  *
  * Scale shape: ONE hash exchange on the key; both windows (the
  * lag-change flag and the lead valid_to) and the in-between filter share
  * that partitioning, so Spark plans a single Exchange followed by two
  * in-partition sorts — no re-shuffle, no driver state, any number of
  * keys. Skewed keys (one entity with millions of observations) sort
  * within one task — the same bound as any per-key window; mitigate
  * upstream by splitting dead history from live deltas, not here.
  */
object History {

  def scd2(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
           tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = df
      .withColumn("__graft_prev", lag(col(attrCol), 1).over(w))
      // null-safe inequality: a null→value or value→null transition IS a
      // change; lag's null on the first row also (correctly) flags it
      .filter(!(col(attrCol) <=> col("__graft_prev")))
      .drop("__graft_prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"))
  }

  /** Point-in-time lookup against an SCD2 table: the version row of each
    * key valid AT `asOf` — `valid_from <= asOf < valid_to` (open current
    * versions have null `valid_to`). A narrow filter; at scale this is the
    * predicate a partition-pruned dimension read pushes into the scan.
    */
  def asOfVersion(scd2Table: DataFrame, asOf: Column): DataFrame =
    scd2Table.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
}
