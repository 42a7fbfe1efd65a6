package graft.tools

import graft.{Bench, GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev lab: order-controlled A/B of the w2/w3/w4 window-stack spellings at
  * sf0.1 (r13 VERDICT #7: floor_frac 0.33-0.42, ~0.3-0.5 s real work each;
  * all three are Spark WINS at x1000, so this is governing-ratio polish
  * only). All three queries are already single-exchange — the candidates
  * below attack the post-shuffle stage's width (AQE's 1m advisory
  * coalesces the 100k-row exchange to 1-3 tasks, serializing the
  * WindowExec / sessions-merge work: Scratch r14 measured w2's window
  * stage at 2 tasks x ~580 ms) and the operator choice (w2's gap rule is
  * expressible through native session_window with an 1801 s gap — the
  * strict ">" boundary — plus a row_number ordinal over the aggregated
  * sessions).
  *
  * Run variants in BOTH orders before believing a ratio (GATES.md
  * in-session order-bias note):
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.WindowLab [variant ...]"
  *
  * VERDICT (r14, min-of-3 both orders, quiet host): a WASH — rejected.
  * Every candidate's apparent win inverts with run order (w2 vA/vD read
  * 0.387/0.326 forward and 0.213/0.311 reversed; w3 vA/vB 0.245/0.227 vs
  * 0.208/0.348; in each order the LATER-positioned variant of a pair
  * wins, i.e. pure in-session warmth). The only non-noise signal is
  * negative: w4_vB_pinned LOSES outright in both orders (0.948/0.447 vs
  * vA 0.354/0.394 — the user repartition does not satisfy the session
  * aggregate's required distribution, so pinning ADDS an exchange). The
  * w2/w3/w4 stack stays as shipped: already single-exchange, residual
  * cost is the per-stage floor plus ~0.1-0.2 s of WindowExec work that
  * no spelling at this sf moves outside measurement noise.
  */
object WindowLab {
  def variants(s: SparkSession, d: String): Map[String, () => DataFrame] = {
    val nPart = s.sessionState.conf.numShufflePartitions
    def events = Tables.events(s, d)

    def w2Composed(src: DataFrame): DataFrame = {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      src
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
    }

    Map(
      // ---- w2_lag_sessions -------------------------------------------
      "w2_vA_current" -> (() => SparkEntry.queries("w2_lag_sessions")(s, d)),
      // narrow the window input explicitly (is pruning already doing it?)
      "w2_vB_narrow" -> (() =>
        w2Composed(events.select(col("user_id"), col("ts"), col("event_id")))),
      // pin the exchange at session width: a user repartition is not
      // AQE-coalescible, so the two WindowExec passes + agg run wide
      "w2_vC_pinned" -> (() =>
        w2Composed(events.select(col("user_id"), col("ts"), col("event_id"))
          .repartition(nPart, col("user_id")))),
      // native session_window with the strict-">" boundary (gap 1801 s)
      // + row_number ordinal over the aggregated sessions (same output)
      "w2_vD_native" -> (() => {
        val sessions = events
          .groupBy(col("user_id"), session_window(col("ts"), "1801 seconds").as("sw"))
          .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"))
        sessions.select(col("user_id"),
            row_number().over(Window.partitionBy(col("user_id"))
              .orderBy(col("session_start"))).cast("long").as("session_id"),
            col("session_start"), col("session_end"), col("n_events"))
      }),

      // ---- w3_frames_ranks -------------------------------------------
      "w3_vA_current" -> (() => SparkEntry.queries("w3_frames_ranks")(s, d)),
      "w3_vB_pinned" -> (() => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .repartition(nPart, col("user_id"))
          .select(
            col("user_id"), col("event_id"),
            round(avg(col("value")).over(w.rowsBetween(-2, 0)), 6).as("mov_avg3"),
            lead(col("event_id"), 1).over(w).as("next_event"),
            first(col("event_id")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_event"),
            rank().over(w).cast("long").as("rnk"),
            percent_rank().over(w).as("pct_rank"),
            ntile(4).over(w).cast("long").as("quartile"))
      }),

      // ---- w4_session_window -----------------------------------------
      "w4_vA_current" -> (() => SparkEntry.queries("w4_session_window")(s, d)),
      "w4_vB_pinned" -> (() =>
        events.select(col("user_id"), col("ts"), col("value"))
          .repartition(nPart, col("user_id"))
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("total_value"))
          .select(col("user_id"), col("sw.start").as("session_start"),
            col("sw.end").as("session_end"), col("n_events"), col("total_value"))),
      // the composed-lag equivalent, for the record (w4 exists to exercise
      // the NATIVE operator; this measures what that choice costs)
      "w4_vC_composed" -> (() => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        events.select(col("user_id"), col("ts"), col("value"))
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") >= 1800, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("session_start"),
            (max(col("ts")) + expr("INTERVAL 30 MINUTES")).as("session_end"),
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("total_value"))
          .drop("sid")
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"), col("total_value"))
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
    Bench.evaluate(vs(names.head)()) // warm the scan + JIT
    for (n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluate(vs(n)())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"WLAB $n%-18s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
