package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with `right.ts <= left.ts` within the same key — the standard
  * time-series enrichment operator (trades⋈quotes, events⋈state).
  *
  * Spark has no native as-of join; the composition here is the
  * union-and-carry pattern: tag both sides, union, sort within key by
  * (ts, side) and carry the last right value forward with a running
  * `last(ignoreNulls)` window, then keep left rows. One shuffle on the key
  * — same cost class as a co-partitioned join; no per-row range probing,
  * no broadcast requirement, skew behaves like any keyed window.
  */
object AsofJoin {

  /** Left as-of join. Output: all columns of `left` plus `valueCols` from
    * `right` (null when no right row precedes the left row's timestamp).
    *
    * @param left      probe side; must have `key` and `ts` columns
    * @param right     reference side; must have `key` and `ts` columns
    * @param key       equi-join key column name
    * @param ts        event-time column name (same name both sides)
    * @param valueCols right-side columns to carry
    */
  def leftAsof(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // side ordering: right rows sort before left rows at equal ts, so a
    // simultaneous right row IS visible to the left row (asof <=)
    val l = left.withColumn("__side", lit(1))
    val lPadded = valueCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right.select(
      (col(key) +: col(ts) +: valueCols.map(c => col(c).as(s"__r_$c"))): _*)
      .withColumn("__side", lit(0))
      .select(lPadded.columns.map(c =>
        if (leftCols.contains(c) && c != key && c != ts) lit(null).cast(left.schema(c).dataType).as(c)
        else col(c)): _*)
    // deterministic tie-break among right rows sharing (key, ts): without
    // it, `last(ignoreNulls)` picks whichever duplicate the sort happened
    // to place last — retry/partitioning dependent. The winner is the row
    // with the greatest xxhash64 of its carried values: arbitrary as a
    // rule, but stable for any input and cheap for any carried type. Left
    // rows sort after every right row at equal ts regardless (asof <=).
    val tb = (df: DataFrame) =>
      df.withColumn("__tb", when(col("__side") === 0,
        xxhash64(valueCols.map(c => col(s"__r_$c")): _*)).otherwise(lit(0L)))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the carried values travel as ONE struct: per-column `last(__r_c,
    // ignoreNulls)` would treat a NULL inside the winning row as "look
    // further back for THIS column" and stitch together columns from
    // DIFFERENT tied rows — a row that never existed. The struct is
    // non-null exactly for right rows, so one `last(ignoreNulls)` carries
    // the winning row as a unit, NULLs and all.
    val structed = tb(lPadded.unionByName(r)).withColumn("__rrow",
      when(col("__side") === 0,
        struct(valueCols.map(c => col(s"__r_$c").as(c)): _*)))
    val carried = structed.withColumn("__c",
      last(col("__rrow"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"__c.$c").as(c))): _*)
  }
}
