package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations.
  *
  * AQE's runtime skew-join split handles most cases
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); these utilities
  * cover the plans AQE cannot rewrite — e.g. a hot key so large that even
  * split partitions overwhelm one task's build side, or pre-aggregation of
  * a hot grouping key — and make the technique explicit and testable.
  */
object SkewTools {

  /** Equi-join `large ⋈ small` on `key`, salted: each large row gets a
    * content-derived salt in [0, salt); the small side is replicated `salt`
    * times, so a hot key's rows scatter across `salt` reduce tasks instead
    * of one. Produces exactly the columns of `large.join(small, key)` and
    * identical rows (inner join).
    *
    * The salt is `pmod(hash(saltCols), salt)` — deterministic per row
    * content, so a task retry or input re-split recomputes the identical
    * salt (unlike `rand`, whose value depends on row position within a
    * partition). `saltCols` defaults to every large-side column; pass the
    * columns that actually vary within a hot key (e.g. an event id) to
    * avoid hashing wide payloads per row. Hashing the key alone would be
    * useless — all rows of the hot key would land in one bucket.
    *
    * Cost model: small side shuffles ×salt — use for dim-ish right sides
    * that are too big to broadcast but far smaller than the fact side.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int,
                 saltCols: Seq[String] = Nil): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val disc = if (saltCols.nonEmpty) saltCols else large.columns.toSeq
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(disc.map(col): _*), lit(salt)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation of a skewed grouping key: partial aggregate on
    * (key, salt), then final combine on key. `aggs` must be algebraic
    * (sum/count/min/max — the partial and final functions coincide after
    * the first phase). Spark's hash aggregate already does map-side partial
    * combine; explicit salting additionally splits a hot key across
    * *reduce* tasks when one key dominates a partition's output.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, salt: Int,
                     saltCols: Seq[String] = Nil): DataFrame = {
    val disc = if (saltCols.nonEmpty) saltCols else df.columns.toSeq
    df.withColumn("__salt", pmod(hash(disc.map(col): _*), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Top-k most frequent values of `key` with counts — the diagnostic used
    * to decide whether a key needs salting at all.
    */
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(col(key)).count().orderBy(desc("count"), col(key)).limit(k)
}
