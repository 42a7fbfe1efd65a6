package graft.tools

import graft.{Bench, GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev lab: order-controlled A/B of `a2_count_distinct` SMALL-path
  * spellings at sf0.1 (r11 board: 0.87 s, 11x DuckDB — the packed-long
  * r12 attempt bought nothing; re-audit mandated by VERDICT r11 "What's
  * missing" shave list). Run in BOTH orders before believing a ratio.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.A2Lab [variant ...]"
  */
object A2Lab {
  def variants(s: SparkSession, d: String): Map[String, () => DataFrame] = {
    def li = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
    def packed = {
      val pk = when(col("l_suppkey") >= 0 && col("l_suppkey") < 2048 &&
          col("l_partkey") >= 0,
          shiftleft(col("l_partkey").cast("long"), 11)
            .bitwiseOR(col("l_suppkey").cast("long")))
        .otherwise(raise_error(lit("a2 packed domain")))
      li.select(pk.as("__pk"))
    }
    Map(
      // current small path (r12 packed long, Expand x3)
      "vA_packed" -> (() => packed.agg(
        countDistinct(shiftright(col("__pk"), 11)).as("n_parts"),
        countDistinct(col("__pk").bitwiseAND(lit(2047L))).as("n_supps"),
        countDistinct(col("__pk")).as("n_pairs"))),
      // pre-r12 plain spelling
      "vB_plain" -> (() => li.agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_pairs"))),
      // bitmap aggregates over the packed domain: exact distincts as
      // set-bit counts — fixed-width byte-array buffers, no Expand, the
      // shuffle carries (gid, bucket) -> 4KB bitmap blobs after map-side OR
      "vC_bitmap" -> (() => {
        val kv = packed.select(explode(array(
            struct(lit(0).as("g"), shiftright(col("__pk"), 11).as("v")),
            struct(lit(1).as("g"), col("__pk").bitwiseAND(lit(2047L)).as("v")),
            struct(lit(2).as("g"), col("__pk").as("v")))).as("kv"))
          .select(col("kv.g").as("g"), col("kv.v").as("v"))
        kv.groupBy(col("g"), expr("bitmap_bucket_number(v)").as("b"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(v))").as("bm"))
          .groupBy(col("g")).agg(sum(expr("bitmap_count(bm)")).as("n"))
          .agg(
            max(when(col("g") === 0, col("n"))).as("n_parts"),
            max(when(col("g") === 1, col("n"))).as("n_supps"),
            max(when(col("g") === 2, col("n"))).as("n_pairs"))
      }),
      // dedup the pair once (codegen'd distinct), derive all three from it
      "vD_dedup_derive" -> (() => {
        val pairs = packed.distinct()
        pairs.agg(
          countDistinct(shiftright(col("__pk"), 11)).as("n_parts"),
          countDistinct(col("__pk").bitwiseAND(lit(2047L))).as("n_supps"),
          count(lit(1)).as("n_pairs"))
      }),
      // bitmap over ONLY the pair (the 591k-distinct giant); parts/supps
      // ride a tiny plain countDistinct pair in a second branch
      "vE_bitmap_pair" -> (() => {
        val pr = packed
          .groupBy(expr("bitmap_bucket_number(__pk)").as("b"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(__pk))").as("bm"))
          .agg(sum(expr("bitmap_count(bm)")).as("n_pairs"))
        val ps = li.agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        ps.crossJoin(pr)
      }))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val vs = variants(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else vs.keys.toSeq.sorted
    Bench.evaluate(vs(names.head)())
    for (n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluate(vs(n)())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"A2LAB $n%-18s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
      vs(n)().show(1, false)
    }
    spark.stop()
  }
}
