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

  /** Corpus snapshot diff — the incremental-pipeline primitive: classify
    * every key across two snapshot versions as `added` / `removed` /
    * `changed` / `unchanged` by comparing a content fingerprint of the
    * payload columns, so a 100 TB re-crawl reprocesses only the delta
    * instead of the corpus. Keys must be unique within each snapshot
    * (duplicate keys multiply through the outer join); payload columns are
    * compared as their null-skipping `concat_ws` string image (a null and
    * an absent value collapse — pre-coalesce upstream if that distinction
    * matters).
    *
    * Scale shape: each side reduces to `(key, 16-byte md5)` inside its
    * scan stage — the full-outer join exchanges fingerprint rows, never
    * payloads, and is the pipeline's only shuffle per side.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "snapshotDiff: need at least one payload column")
    def fp(df: DataFrame, name: String) = df.select(col(idCol),
      md5(concat_ws("", payloadCols.map(c => col(c).cast("string")): _*)).as(name))
    fp(oldSnap, "__h_old").join(fp(newSnap, "__h_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
