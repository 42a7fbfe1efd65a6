package graft.tools

import graft.{Bench, GraftSession, Tables}
import graft.operators.{AdaptiveGate, Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev lab: `dedup_span_cut` stage decomposition at sf0.1 (r12 shave list:
  * 1.63 s paired, 3.7x DuckDB's 0.44 s). Which stage owns the time —
  * the md5-per-occurrence scan, the stats/join exchanges, or the rebuild?
  */
object SpanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val l = 5
    val base = Tables.documents(spark, sfDir).filter(col("doc_id").isNotNull)
    def occRaw = base
      .select(col("doc_id"),
        posexplode(TextAnalysis.shinglesAll(col("text"), l)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        Dedup.shingleHash31(col("s")).as("h"))
    def occ = occRaw.repartition(AdaptiveGate.postingPartitions(occRaw), col("h"))
    def stats = occ.groupBy("h")
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col("doc_id"), col("pos"))).as("__canon"))
      .filter(col("__cnt") > 1)
    def dup = AdaptiveGate.hashHinted(occ)
      .join(AdaptiveGate.hashHinted(stats.select(col("h"), col("__canon"))), Seq("h"))
      .filter(col("doc_id") =!= col("__canon").getField("doc_id") ||
        col("pos") =!= col("__canon").getField("pos"))
    def covered = dup
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(l - 1))).as("p"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("__cov"))
    // r12 small-path candidate: ONE groupBy(h) owns count+canon+the
    // occurrence list, so the dup set explodes out of the aggregate —
    // no second occ branch, no join, 2 exchanges end-to-end
    def coveredList = occRaw
      .groupBy(col("h"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col("doc_id"), col("pos"))).as("__canon"),
        collect_list(struct(col("doc_id"), col("pos"))).as("__occs"))
      .filter(col("__cnt") > 1)
      .select(col("__canon"), explode(col("__occs")).as("o"))
      .filter(col("o") =!= col("__canon"))
      .select(col("o.doc_id").as("doc_id"),
        explode(sequence(col("o.pos"), col("o.pos") + lit(l - 1))).as("p"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("__cov"))
    def fullList = {
      val words = split(col("text"), " ", -1)
      val nw = when(col("text").isNotNull, size(words)).otherwise(0).cast("long")
      val keptArr = when(col("text").isNull, array().cast("array<string>"))
        .when(col("__cov").isNull, words)
        .otherwise(transform(
          array_except(sequence(lit(0L), nw - lit(1L)), col("__cov")),
          p => element_at(words, (p + lit(1L)).cast("int"))))
      base.select(col("doc_id"), col("text"))
        .join(coveredList, Seq("doc_id"), "left")
        .select(col("doc_id"),
          array_join(keptArr, " ").as("text_clean"),
          (nw - size(keptArr)).as("n_cut"))
    }
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "scan_occraw" -> (() => occRaw),
      "occ_exchanged" -> (() => occ),
      "stats" -> (() => stats),
      "dup_join" -> (() => dup),
      "covered" -> (() => covered),
      "full" -> (() => Dedup.spanCut(Tables.documents(spark, sfDir), l)),
      "covered_list" -> (() => coveredList),
      "full_list" -> (() => fullList),
      // r12b: the md5-per-occurrence pass runs inside documents.parquet's
      // 1-file scan stage; fanning the docs first parallelizes it at the
      // cost of one tiny (5k-row) exchange
      "full_fanned" -> (() => Dedup.spanCut(
        Tables.documents(spark, sfDir)
          .repartition(spark.sessionState.conf.numShufflePartitions), l)),
      // r14 candidate: dup set via a WINDOW over the one h-exchange
      // (count + min-struct as two frameless functions in ONE WindowExec)
      // instead of the collect_list aggregate — trades per-group list
      // buffers for one 8-byte-key sort
      "full_window" -> (() => {
        import org.apache.spark.sql.expressions.Window
        // the r13 kernel occ (same as the shipped spanCut), not the
        // composed shingle spelling the decomposition probes use
        val occKernel = base
          .select(col("doc_id"),
            posexplode(graft.functions.TextFunctions
              .shingle_hash31_all_array(col("text"), l)).as(Seq("pos", "h")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("h"))
        val occE = occKernel.repartition(
          spark.sessionState.conf.numShufflePartitions, col("h"))
        val w = Window.partitionBy(col("h"))
        val me = struct(col("doc_id"), col("pos"))
        val dupW = occE
          .withColumn("__cnt", count(lit(1)).over(w))
          .withColumn("__canon", min(me).over(w))
          .filter(col("__cnt") > 1 && !(me === col("__canon")))
          .select(col("doc_id"), col("pos"))
        val coveredW = dupW
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + lit(l - 1))).as("p"))
          .groupBy(col("doc_id"))
          .agg(collect_set(col("p")).as("__cov"))
        val words = split(col("text"), " ", -1)
        val nw = when(col("text").isNotNull, size(words)).otherwise(0).cast("long")
        val keptArr = when(col("text").isNull, array().cast("array<string>"))
          .when(col("__cov").isNull, words)
          .otherwise(transform(
            array_except(sequence(lit(0L), nw - lit(1L)), col("__cov")),
            p => element_at(words, (p + lit(1L)).cast("int"))))
        base.select(col("doc_id"), col("text"))
          .join(coveredW, Seq("doc_id"), "left")
          .select(col("doc_id"),
            array_join(keptArr, " ").as("text_clean"),
            (nw - size(keptArr)).as("n_cut"))
      }))
    val names = if (args.nonEmpty) args.toSeq else probes.map(_._1)
    val m = probes.toMap
    Bench.evaluate(m(names.head)())
    for (n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluate(m(n)())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SPANLAB $n%-14s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
