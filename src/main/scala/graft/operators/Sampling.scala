package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Hash-ranked rather than RNG-based: the sample is a pure function of the
  * data, so it is reproducible across runs, engines, retries and cluster
  * sizes (a `rand()`-based sample silently changes under task retry, which
  * poisons dataset lineage at scale). The whole-corpus variant
  * (`sample_hash` in SparkEntry: filter on an md5 prefix) keeps a fixed
  * *fraction*; [[stratified]] keeps a fixed *quota per stratum*, the
  * balance-the-domains operation of corpus curation — a skewed stratum
  * cannot crowd out rare ones.
  *
  * Scale shape: one hash per row, one shuffle on the stratum key, per-group
  * top-k via row_number (no global sort). A stratum larger than a single
  * executor's window buffer spills; quotas are usually ≪ that.
  */
object Sampling {

  /** Up to `quota` rows per distinct value of `stratum`, chosen by md5 rank
    * of `key` (ties impossible: the key itself is the final tie-break).
    */
  def stratified(df: DataFrame, stratum: String, key: String, quota: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(col(key).cast("string")), col(key))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .drop("rn")
  }
}
