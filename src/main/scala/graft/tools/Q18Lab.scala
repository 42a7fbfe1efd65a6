package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Bench, GraftSession, SparkEntry, Tables}
import graft.operators.Bucketing

/** Order-controlled A/B for r12 VERDICT #7: does the write-once bucketed
  * layout also pay off for `q18_large_orders`, the other fact-exchange
  * heavy? The shipped q18 pays ONE fact-scale exchange (the gated
  * lineitem 2-col repartition feeding the per-order sum; the HAVING
  * survivor set is tiny, so AQE already broadcast-joins it into the
  * orders scan). A lineitem layout bucketed by orderkey would satisfy the
  * groupBy's clustering requirement from disk — zero exchanges anywhere.
  *
  * The existing j4 layout (`li_ok`: l_orderkey, l_suppkey) does NOT carry
  * l_quantity, so q18 needs its own projection (`li_oq`) — a second
  * write-once cost this lab measures the return on.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Q18Lab [write|ab]"
  *
  * `write` only builds/registers the layout (the amortized one-time
  * shuffle, excluded from the A/B); `ab` (default) measures BOTH orders:
  * in-session warmth favors whoever runs second by 15-30% (memory:
  * measurement conventions), so the adopt bar is winning from the
  * DISADVANTAGED position too.
  */
object Q18Lab {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val slug = SparkEntry.layoutSlug(d, "lineitem.parquet")
    val root = s"/tmp/graft-bucketed/$slug"

    def liOq(): DataFrame = Bucketing.ensureBucketed(
      spark, s"graft_li_oq_$slug", s"$root/li_oq", "l_orderkey", buckets)(
      Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_quantity")))

    if (args.headOption.contains("write")) {
      val t0 = System.nanoTime()
      liOq().count()
      println(f"Q18LAB write li_oq ($buckets buckets) ${(System.nanoTime() - t0) / 1e9}%.1f s at $root/li_oq")
      val ordSlug = SparkEntry.layoutSlug(d, "orders.parquet")
      val t1 = System.nanoTime()
      Bucketing.ensureBucketed(
        spark, s"graft_ord_oq_$ordSlug",
        s"/tmp/graft-bucketed/$ordSlug/ord_oq", "o_orderkey", buckets)(
        Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))).count()
      println(f"Q18LAB write ord_oq ($buckets buckets) ${(System.nanoTime() - t1) / 1e9}%.1f s")
      spark.stop(); return
    }

    def q18Of(li: DataFrame): DataFrame = {
      val big = li
        .groupBy(col("l_orderkey").as("bk"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.orders(spark, d).join(big, col("o_orderkey") === col("bk"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          col("total_qty"))
    }
    // q18_cur pins the gated EXCHANGE plan (the shipped query now probes
    // the layouts itself — r13 adopt — so the default would route and the
    // A/B would compare the layout against itself); q18_bucketed is the
    // shipped routed path forced on (li_oq agg + ord_oq Sort-free SMJ,
    // zero exchanges); q18_li_only is the r13a intermediate (lineitem
    // layout, orders still exchanging) kept for decomposition
    val variants: Map[String, () => DataFrame] = Map(
      "q18_cur" -> (() => SparkEntry.q18LargeOrders(spark, d, layout = Some(false))),
      "q18_bucketed" -> (() => SparkEntry.q18LargeOrders(spark, d, layout = Some(true))),
      "q18_li_only" -> (() => q18Of(liOq())))

    def time(name: String): Double = {
      val mk = variants(name)
      Bench.evaluate(mk()) // warm
      spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluate(mk())
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q18LAB $name%-14s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
      ts.min
    }
    // rows must match before any timing means anything — count + order-
    // independent row-hash sum (collect() would pull a millions-row
    // result to the driver at x1000)
    def digest(df: DataFrame) = df
      .agg(count(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("h"))
      .collect()(0)
    val a = digest(variants("q18_cur")())
    val b = digest(variants("q18_bucketed")())
    require(a == b, s"q18 bucketed variant diverges: $a vs $b")
    println(s"Q18LAB digests match ($a)")
    println("Q18LAB order 1: cur first (bucketed advantaged)")
    time("q18_cur"); time("q18_bucketed")
    println("Q18LAB order 2: bucketed first (cur advantaged)")
    time("q18_bucketed"); time("q18_cur")
    spark.stop()
  }
}
