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
      fingerprint(payloadCols.map(col)).as(name))
    fp(oldSnap, "__h_old").join(fp(newSnap, "__h_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The fingerprint expression [[snapshotDiff]] compares: md5 over the
    * payload columns' null-skipping `concat_ws` string image, joined on
    * the UNIT SEPARATOR control char so shifted column boundaries
    * ("ab","c" vs "a","bc") never fingerprint equal (HistorySpec pins
    * it). One definition for both diff spellings — the same-base path
    * must hash EXACTLY what the generic join path hashes.
    */
  def fingerprint(payloadCols: Seq[Column]): Column = {
    require(payloadCols.nonEmpty, "fingerprint: need at least one payload column")
    md5(concat_ws("\u001f", payloadCols.map(_.cast("string")): _*))
  }

  /** [[snapshotDiff]] for the common CDC case where BOTH snapshots derive
    * from ONE current table (a re-crawl diffed against the same corpus
    * minus a tombstone slice, a candidate batch vs the live set): the
    * full-outer join of two projections of the same base is just a single
    * projection with both fingerprint columns, so the whole diff is ONE
    * scan with ZERO exchanges — the generic spelling scans (and hashes)
    * the payload twice and shuffles both fingerprint sides. At corpus
    * scale the payload scan IS the cost; halving it and dropping the
    * exchange is the difference between a map-only pass and a join
    * (x1000: the joined spelling measured 2.19 s vs DuckDB 0.99 s; the
    * fused re-pair is the `snapshot_diff` row in BENCH_SCALE_X1000.json).
    *
    * `oldKeep` / `newKeep` are the snapshots' membership predicates over
    * the base row (a null predicate counts as absent); `oldHash` /
    * `newHash` are fingerprint expressions ([[fingerprint]]), evaluated
    * only where the row is a member. The rows-absent-from-both filter
    * runs on the CHEAP predicates (pushable into the scan), never on the
    * hashes. Because both hash expressions sit in one projection,
    * whole-stage codegen's subexpression elimination computes shared
    * subtrees once per row — spell the unchanged-payload case as the
    * SAME expression tree in both arguments to get that reuse. Ids must
    * be non-null: a null id makes both membership predicates null
    * ("absent from both") where the generic join would emit unmatched
    * added/removed singletons for it.
    */
  def snapshotDiffSameBase(current: DataFrame, idCol: String,
                           oldKeep: Column, oldHash: Column,
                           newKeep: Column, newHash: Column): DataFrame =
    current
      .filter(coalesce(oldKeep, lit(false)) || coalesce(newKeep, lit(false)))
      .select(col(idCol),
        when(oldKeep, oldHash).as("__h_old"),
        when(newKeep, newHash).as("__h_new"))
      .select(col(idCol),
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
}
