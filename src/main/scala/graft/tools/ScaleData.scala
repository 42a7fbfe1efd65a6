package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Scale-up generator for the perf-at-scale measurement (VERDICT r7 #1/#7).
  *
  * Reads the driver-generated tables under `srcDir` and writes a
  * `factor`-times-larger copy to `outDir`, as MULTI-FILE parquet (the
  * driver's sf0.1 files are single-row-group, which serializes every scan
  * into one task — the exact floor the scale claim is about). This is a
  * measurement fixture, not test data: correctness stays gated on the
  * driver's own parquet; this exists so the "Spark's per-job floor
  * amortizes with data size" argument can be a paired measurement
  * (tools/bench_scale.py) instead of an assertion.
  *
  * Replication scheme — replica `r` in [0, factor):
  *   - every key column shifts by `r * 1e9` (custkey, suppkey, partkey,
  *     orderkey, doc_id, vec_id, event_id, user_id), so foreign keys stay
  *     consistent WITHIN a replica and joins/groupings scale like real
  *     data (10x groups, same rows-per-group) rather than inflating one
  *     group 10x;
  *   - `region`/`nation` stay unreplicated (fixed dims, like TPC-H);
  *   - `documents.text` gets a per-replica suffix on every whitespace
  *     token for r > 0: token counts, lengths and within-replica
  *     similarity structure are preserved, but shingles differ ACROSS
  *     replicas — without this, every doc acquires 9 exact twins and the
  *     dedup family measures a pathological 10-clique corpus, not a
  *     10x-bigger one (`n_chars` is recomputed to keep its contract);
  *   - `embeddings.embedding` components get deterministic hash-derived
  *     noise in [-0.05, 0.05) for r > 0, for the same reason: ANN and
  *     semantic-dedup cost on 10 exact copies of each vector is not the
  *     cost of 10x more vectors;
  *   - timestamps/dates/measures are left as-is: 10x rows per day/session
  *     is exactly how these tables grow.
  */
object ScaleData {
  private val Span = 1000000000L

  /** Key columns to shift, per table. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"))

  def replicate(df: DataFrame, table: String, factor: Int): DataFrame = {
    val spark = df.sparkSession
    val reps = spark.range(factor.toLong).select(col("id").as("__r"))
    var out = df.crossJoin(broadcast(reps))
    for (k <- keyCols.getOrElse(table, Nil))
      out = out.withColumn(k, col(k) + col("__r") * lit(Span))
    table match {
      case "documents" =>
        out = out
          .withColumn("text", when(col("__r") === 0L, col("text")).otherwise(
            array_join(transform(split(col("text"), " "),
              w => concat(w, lit("-"), col("__r"))), " ")))
          .withColumn("n_chars", length(col("text")))
      case "embeddings" =>
        out = out.withColumn("embedding",
          when(col("__r") === 0L, col("embedding")).otherwise(
            transform(col("embedding"), (x: Column, i: Column) =>
              // division promotes to double in Spark SQL — cast back so
              // the copy keeps the table's array<float> physical type
              (x + (pmod(hash(col("vec_id"), i, col("__r")), lit(1000))
                .cast("float") / lit(10000.0f) - lit(0.05f))).cast("float"))))
      case _ => ()
    }
    out.drop("__r")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft-scale")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val files = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = GraftSession.create(_
      // write instants, not NTZ, so Spark reads the copy back as
      // TimestampType and DuckDB (UTC container) sees identical wall times
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"))

    // optional 5th arg: comma-separated table subset (a single-query A/B
    // needs one table, not the full multi-GB fixture). Validated against
    // the known table list: a typo ('lineitems') or an empty arg must
    // fail LOUDLY, not exit successfully having written nothing — the
    // A/B would then silently read stale prior-run files from outDir.
    val allTables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings", "events")
    val only = args.lift(4).map { raw =>
      val names = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
      require(names.nonEmpty,
        s"table-subset arg is empty; expected names from ${allTables.toSeq.sorted.mkString(",")}")
      val unknown = names -- allTables
      require(unknown.isEmpty,
        s"unknown table(s) ${unknown.toSeq.sorted.mkString(",")}; " +
          s"expected names from ${allTables.toSeq.sorted.mkString(",")}")
      names
    }
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    def write(name: String, df: DataFrame, nFiles: Int): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] $name x$factor -> $outDir/$name.parquet " +
        s"(${df.rdd.getNumPartitions} partitions)")
    }
    // fixed dims: copied once, single file, no shift
    if (wanted("region")) write("region", Tables.region(spark, srcDir).repartition(1), 1)
    if (wanted("nation")) write("nation", Tables.nation(spark, srcDir).repartition(1), 1)
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "documents", "embeddings", "events").filter(wanted)) {
      // events goes through Tables.events so both physical ts generations
      // normalize to TimestampType before the copy
      val src = if (t == "events") Tables.events(spark, srcDir)
                else Tables.read(spark, srcDir, t)
      val n = if (t == "supplier") math.min(files, 4) else files
      // repartition the SOURCE rows (MBs), then explode per-partition and
      // write straight out: each task owns all `factor` replicas of its
      // input slice, so the job never shuffles the factor-times output —
      // at x1000 the old output-side repartition spilled ~50 GB of
      // exploded lineitem rows through the block manager and exhausted
      // the disk before the write could finish
      write(t, replicate(src.repartition(n), t, factor), n)
    }
    spark.stop()
  }
}
