package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev harness (test tree): time AD-HOC plan variants under the TimeOne
  * convention (warm pass, then min-of-N full evaluations through the
  * noop sink, cache cleared between passes) so re-plan candidates can be
  * measured at x-scale dirs before one line of product code changes.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft-x1000 SPARK_GRAFT_CPUS=32 \
  *     sbt "Test/runMain graft.X1000Lab j4_prejoined q13_r8"
  */
object X1000Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val d = sfDir

    def variants: Map[String, () => DataFrame] = Map(
      // j4 candidate: both dimension probes fold into the fact sides
      // BEFORE the orderkey exchange — customer resolves on 150M orders
      // rows (not 600M joined rows), supplier on the lineitem scan side;
      // the post-join stage is agg-only. Exchange count and row widths
      // otherwise identical to the shipped plan.
      "j4_prejoined" -> (() => {
        val nat = Tables.nation(spark, d)
        val liN = Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(broadcast(Tables.supplier(spark, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("s_nationkey"))
        val ordN = Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(broadcast(Tables.customer(spark, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey"))
        SparkEntry.hashJoined(liN, ordN, "l_orderkey", "o_orderkey")
          .groupBy(col("c_nationkey"), col("s_nationkey"))
          .agg(count(lit(1)).as("n"))
          .join(broadcast(nat.as("cn")), col("c_nationkey") === col("cn.n_nationkey"))
          .join(broadcast(nat.as("sn")), col("s_nationkey") === col("sn.n_nationkey"))
          .select(col("cn.n_name").as("cust_nation"),
            col("sn.n_name").as("supp_nation"), col("n"))
      }),
      // the r8 q13 shape: n_ordering counted off the oc subtree (depends
      // on AQE exchange reuse to avoid a second orders scan)
      "q13_r8" -> (() => {
        val oc = SparkEntry.preShuffled(
            Tables.orders(spark, d).select(col("o_custkey")), "o_custkey")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
        val nonzero = oc.groupBy(col("cnt")).agg(count(lit(1)).as("custdist"))
          .select(col("cnt").as("c_count"), col("custdist"))
        val zeroRow = Tables.customer(spark, d).agg(count(lit(1)).as("n_cust"))
          .crossJoin(oc.agg(count(lit(1)).as("n_ordering")))
          .select(lit(0L).as("c_count"),
            (col("n_cust") - col("n_ordering")).as("custdist"))
          .filter(col("custdist") > 0)
        nonzero.unionByName(zeroRow)
      }),
      // the r8 j1_a1 large path: name joins + string-key rollup over the
      // full per-suppkey aggregate (no intermediate int-key agg level)
      "j1a1_r8" -> (() => {
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        Tables.lineitem(spark, d).select(col("l_suppkey"), rev.as("__rev"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("__rev")).as("__rev"), count(lit(1)).as("__n"))
          .join(broadcast(Tables.supplier(spark, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(spark, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(spark, d)),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("__rev")), 2).as("revenue"),
            sum(col("__n")).as("n_items"))
      }),
      // ---- f14 candidates (r12): DuckDB evaluates the json over the
      // parquet DICTIONARY (~100 distinct props → ~100 parses per row
      // group) where Spark parses all 100M rows. Candidates trade parse
      // count against join/shuffle work.
      "f14_cur" -> (() => SparkEntry.queries("f14_json_ops")(spark, d)),
      // decomposition floors: the bare 2-col scan, and scan + one parse
      "f14_scanfloor" -> (() =>
        Tables.events(spark, d).select(col("event_id"), col("props"))),
      "f14_parseonly" -> (() =>
        Tables.events(spark, d).select(col("event_id"),
          try_variant_get(parse_json(col("props")), "$.k", "long").as("k"))),
      "f14_from_json" -> (() => {
        val sch = "k LONG, tag STRING, missing STRING"
        Tables.events(spark, d)
          .select(col("event_id"), from_json(col("props"), sch, Map.empty[String, String]).as("j"))
          .select(col("event_id"), col("j.k").as("k"), col("j.tag").as("tag"),
            col("j.missing").as("missing"))
      }),
      "f14_get3" -> (() =>
        Tables.events(spark, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          get_json_object(col("props"), "$.tag").as("tag"),
          get_json_object(col("props"), "$.missing").as("missing"))),
      // native one-byte-walk kernel (TextOps.jsonTopScalars)
      "f14_kernel" -> (() => {
        val v = graft.functions.TextFunctions.json_top_scalars(
          col("props"), Seq("k", "tag", "missing"))
        Tables.events(spark, d)
          .select(col("event_id"), v.as("__j"))
          .select(col("event_id"),
            expr("try_cast(element_at(__j, 1) AS BIGINT)").as("k"),
            element_at(col("__j"), 2).as("tag"),
            element_at(col("__j"), 3).as("missing"))
      }),
      // dictionary-factored: parse once per DISTINCT props value, hash
      // partial agg collapses the dup mass map-side, broadcast back
      "f14_dict" -> (() => {
        val dict = Tables.events(spark, d).select(col("props"))
          .groupBy(col("props")).agg(count(lit(1)).as("__c"))
          .select(col("props").as("__p"),
            parse_json(col("props")).as("__v"))
          .select(col("__p"),
            try_variant_get(col("__v"), "$.k", "long").as("k"),
            try_variant_get(col("__v"), "$.tag", "string").as("tag"),
            try_variant_get(col("__v"), "$.missing", "string").as("missing"))
        Tables.events(spark, d).select(col("event_id"), col("props"))
          .join(broadcast(dict), col("props") === col("__p"))
          .select(col("event_id"), col("k"), col("tag"), col("missing"))
      }),
      // ---- r15: two-table as-of (VERDICT r14 #2) — old union-and-carry
      // vs the tape-dispatch leftAsof, both WITHOUT a layout
      "asof2_old" -> (() => {
        val ev = Tables.events(spark, d)
        val probes = ev.filter(col("event_id") % 10 =!= 0)
          .select(col("event_id"), col("user_id"), col("ts"))
        val refs = ev.filter(col("event_id") % 10 === 0)
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("ref_value"),
            max(col("event_id")).as("ref_event"))
        graft.operators.AsofJoin.leftAsofUnionCarry(
          probes, refs, "user_id", "ts", Seq("ref_value", "ref_event"))
      }),
      "asof2_new" -> (() => SparkEntry.j5bAsofTwoTable(spark, d, Some(false))))

    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    for (name <- args) {
      val fn = variants(name)
      Bench.evaluate(fn()) // warm
      spark.catalog.clearCache()
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluate(fn())
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"LAB $name%-28s ${ts.min}%.3f s (min-of-$passes%d)")
    }
    spark.stop()
  }
}
