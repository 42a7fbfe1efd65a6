package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming facade over the event stream.
  *
  * The reference's only incremental semantics are orchestrated monthly
  * micro-batches (SURVEY.md §2.10); this module provides the real streaming
  * counterpart so the same aggregations run continuously: file-source
  * ingestion, watermarked tumbling/sliding windows, within-watermark
  * dedup, and custom session state via `flatMapGroupsWithState`.
  *
  * Every transform takes and returns DataFrames, so each works identically
  * on a batch frame (tests assert batch/stream parity) — Spark's unified
  * Dataset API is the point: the 100 TB batch plan and the streaming plan
  * are the same declarative plan.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet event files; with
    * `Trigger.AvailableNow` this is the scalable backfill path (process
    * everything present, then stop — the reference's `catchup=True`).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked tumbling-window aggregate: events later than `lateness`
    * behind the max seen ts are dropped; state for closed windows is purged.
    */
  def tumblingAgg(events: DataFrame, window: String = "1 hour",
                  lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window per-user activity. */
  def slidingUserActivity(events: DataFrame, window: String = "1 hour",
                          slide: String = "30 minutes",
                          lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("user_id"), col("n_events"))

  /** Exactly-once event-id dedup within the watermark horizon (the
    * streaming counterpart of the batch W1 latest-wins merge).
    */
  def dedupStream(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Deterministic stream sampling: keep `fraction` of events decided by
    * the 32-bit md5 prefix of `key` — a stateless narrow filter, so it
    * composes with any downstream streaming operator. The content-derived
    * decision is what makes it STREAM-SAFE: a `rand()`-based sample breaks
    * exactly-once on micro-batch replay (a retried batch re-draws and
    * emits a different subset), while this filter admits the identical
    * rows however many times a batch is re-executed. Same convention as
    * the batch `Sampling.weightedBernoulli` (a constant weight).
    */
  def sampleStream(events: DataFrame, key: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    // delegate to the batch operator: ONE definition of the hash-uniform
    // convention, so batch/stream keep-set parity can never drift
    graft.operators.Sampling.weightedBernoulli(events, key, lit(fraction))
  }

  /** Stream-static enrichment: the static side is broadcast and re-resolved
    * per micro-batch (a dim refresh is picked up without restarting).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: pair each left event with right events of
    * the same key arriving within `windowSeconds` AFTER it. Both sides
    * watermarked so join state is bounded and purged.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   windowSeconds: Long, lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", lateness).as("l")
    val r = right.withWatermark("ts", lateness).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
  }

  /** Stream → warehouse bridge: per-micro-batch JDBC append via
    * `foreachBatch` (JDBC has no native streaming sink). The batchId is
    * recorded so a retried micro-batch can be made idempotent downstream
    * (delete-then-insert or merge keyed on batch_id).
    */
  def jdbcSink(events: DataFrame, jdbcUrl: String, table: String,
               props: java.util.Properties): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write.mode("append").jdbc(jdbcUrl, table, props)
    }

  /** Streaming near-dup quarantine — the ingestion-time composition of the
    * dedup family: every micro-batch of documents (`doc_id`, `text`)
    * probes a PERSISTENT LSH index of the accepted corpus
    * ([[graft.operators.Dedup.lshIndex]], built once and held cached by
    * the caller), and the batch splits into `acceptedDir` /
    * `quarantineDir` parquet appends. Per-batch cost is
    * O(|batch| + collisions) — the corpus is never re-hashed — and the
    * batch id rides along so a retried micro-batch stays idempotent
    * downstream (dedup on (batch_id, doc_id)). Index lifecycle stays with
    * the caller: fold accepted batches in by rebuilding the index at a
    * cadence (cheap: the hash-array table is one compact row per doc),
    * exactly like a search system's segment merge.
    */
  def nearDupQuarantine(docs: DataFrame, arrIdx: DataFrame, bandIdx: DataFrame,
                        k: Int, numPerm: Int, bands: Int, threshold: Double,
                        acceptedDir: String, quarantineDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val dups = graft.operators.Dedup
        .nearDupsAgainstIndex(batch, arrIdx, bandIdx, k, numPerm, bands, threshold)
        .select(col("doc_b").as("doc_id")).distinct()
      batch.join(dups, Seq("doc_id"), "left_semi")
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(quarantineDir)
      batch.join(dups, Seq("doc_id"), "left_anti")
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(acceptedDir)
    }
  }

  /** Stateless streaming decontamination guard: marks each document of a
    * (streaming or batch) frame with how many of its k-shingles hit the
    * eval-set bloom filter
    * ([[graft.operators.TextAnalysis.evalShingleBloom]]). Zero hits is
    * PROVABLY clean (a bloom never misses a member) and can flow straight
    * to the training sink; positive hits quarantine for exact offline
    * verification (≈fpp share of clean docs flagged spuriously). The
    * probe is a scalar expression over a broadcast-literal filter — no
    * state store, no watermark, no shuffle — so it composes with any
    * downstream streaming operator.
    */
  def contaminationGuard(docs: DataFrame, bloom: Array[Byte], k: Int): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, filter, lit, size, xxhash64}
    val hits =
      if (bloom == null) lit(0L) // empty eval set: everything is clean
      else size(filter(graft.operators.TextAnalysis.shingles(col("text"), k),
        s => org.apache.spark.sql.GraftShims.bloomMightContain(lit(bloom), xxhash64(s))))
        .cast("long")
    // coalesce: shingles(NULL) is NULL and size(NULL) is NULL, which would
    // route a null-text doc to NEITHER the zero-hit training sink NOR the
    // positive-hit quarantine — a no-shingle doc is provably clean, so 0
    docs.withColumn("n_flagged_shingles", coalesce(hits, lit(0L)))
  }

  // ---- custom state: sessionization ------------------------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long,
                         total_value: Double)

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes after `gapMs` of user inactivity (enforced by event-time
    * timeout against the watermark). Emits one row per closed session.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 lateness: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n, s.total))
          } else {
            var closed = List.empty[UserSession]
            var cur = state.getOption
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= UserSession(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
