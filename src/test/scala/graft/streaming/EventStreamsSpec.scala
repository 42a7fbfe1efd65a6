package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EventStreamsSpec extends AnyFunSuite with Matchers with SparkFixture {
  import EventStreams.Event
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click",
                 v: Double = 1.0) = Event(id, ts(t), user, typ, v, "{}")

  private def runStream[T](input: MemoryStream[Event], out: org.apache.spark.sql.DataFrame,
                           name: String, mode: String = "append") = {
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q
  }

  test("tumblingAgg over a file-source stream matches the batch plan (AvailableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("evt-stream").toString
    graft.Tables.events(spark, sf0001).write.mode("overwrite").parquet(dir)
    val stream = EventStreams.tumblingAgg(EventStreams.readEventStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("tumbling_file")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode only emits windows sealed by the watermark; compare those
    // against the identical batch aggregation
    val got = spark.table("tumbling_file")
    val batch = EventStreams.tumblingAgg(graft.Tables.events(spark, sf0001))
    val maxTs = graft.Tables.events(spark, sf0001).agg(max("ts")).head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)
    val expect = batch.filter(col("window_start") < date_trunc("hour", lit(horizon)))
    got.count() shouldBe expect.count()
    got.except(expect).count() shouldBe 0L
  }

  test("shipped stream_tumbling_agg rows reproduce from a REAL stream (file source, AvailableNow)") {
    // the driver's oracle checks the BATCH analog; this pins that a
    // genuine Structured Streaming execution of the same transform over
    // the same fixture emits the same rows (VERDICT r14 #8) — modulo the
    // append-mode contract: only watermark-sealed windows are emitted
    val dir = java.nio.file.Files.createTempDirectory("evt-e2e").toString
    graft.Tables.events(spark, sf0001).write.mode("overwrite").parquet(dir)
    val q = EventStreams.tumblingAgg(EventStreams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("sq_tumbling_e2e")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // project the streaming output onto the shipped query's shape
    val got = spark.table("sq_tumbling_e2e").select(
      col("window_start").cast("long").as("window_epoch"), col("event_type"),
      col("n"), round(col("total_value"), 2).as("total_value"))
    val shipped = graft.SparkEntry.queries("stream_tumbling_agg")(spark, sf0001)
    val maxTs = graft.Tables.events(spark, sf0001).agg(max("ts")).head.getTimestamp(0)
    val sealedBefore = (maxTs.getTime / 1000 - 3600) / 3600 * 3600
    val expect = shipped.filter(col("window_epoch") < sealedBefore)
    got.count() shouldBe expect.count()
    got.count() should be > 0L
    got.except(expect).count() shouldBe 0L
    expect.except(got).count() shouldBe 0L
  }

  test("shipped stream_quarantine routing reproduces from a REAL stream (file source, AvailableNow)") {
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, sf0001).select($"doc_id", $"text")
    // index = the shipped query's corpus side (doc_id % 10 != 0), same
    // shingle/banding parameters (k=5, numPerm=16, bands=4, thr=0.5)
    val arrIdx = Dedup.docShingleHashes(docs, k = 5).filter($"doc_id" % 10 =!= 0)
    val bandIdx = Dedup.bandIndexFromArr(arrIdx, numPerm = 16, bands = 4)
    val probeDir = java.nio.file.Files.createTempDirectory("sq-probe").toString
    val accDir = java.nio.file.Files.createTempDirectory("sq-acc").toString
    val quarDir = java.nio.file.Files.createTempDirectory("sq-quar").toString
    docs.filter($"doc_id" % 10 === 0).write.mode("overwrite").parquet(probeDir)
    val streamDocs = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(probeDir)
    val q = EventStreams.nearDupQuarantine(streamDocs, arrIdx, bandIdx,
        k = 5, numPerm = 16, bands = 4, threshold = 0.5, accDir, quarDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val shipped = graft.SparkEntry.queries("stream_quarantine")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val gotQuar = spark.read.parquet(quarDir).select($"doc_id").as[Long].collect().toSet
    val gotAcc = spark.read.parquet(accDir).select($"doc_id").as[Long].collect().toSet
    gotQuar shouldBe shipped.filter(_._2).keySet
    gotAcc shouldBe shipped.filterNot(_._2).keySet
    (gotQuar ++ gotAcc) should have size shipped.size.toLong
  }

  test("sampleStream keeps the identical subset as the batch filter (replay-safe)") {
    val input = MemoryStream[Event]
    val evs = (1L to 200L).map(i => ev(i, f"2024-01-01 00:${i % 60}%02d:00"))
    input.addData(evs: _*)
    val q = runStream(input,
      EventStreams.sampleStream(input.toDF(), "event_id", 0.3), "sampled")
    try {
      val streamed = spark.table("sampled").select($"event_id").as[Long].collect().toSet
      // batch reference over the same rows: identical keep-set
      val batch = EventStreams.sampleStream(evs.toDF(), "event_id", 0.3)
        .select($"event_id").as[Long].collect().toSet
      streamed shouldBe batch
      streamed.size.toDouble / 200 should (be > 0.2 and be < 0.4)
      // fraction bounds enforced
      intercept[IllegalArgumentException] {
        EventStreams.sampleStream(evs.toDF(), "event_id", 1.5)
      }
    } finally q.stop()
  }

  test("watermark drops late events in a MemoryStream") {
    val input = MemoryStream[Event]
    val agg = EventStreams.tumblingAgg(input.toDF(), window = "1 hour", lateness = "1 hour")
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    input.addData(ev(1, "2024-01-01 10:10:00"), ev(2, "2024-01-01 10:20:00"))
    q.processAllAvailable()
    // advance watermark far past the 10:00 window (max ts 14:00 - 1h = 13:00)
    input.addData(ev(3, "2024-01-01 14:00:00"))
    q.processAllAvailable()
    // this event is older than the watermark -> dropped
    input.addData(ev(4, "2024-01-01 10:30:00"))
    q.processAllAvailable()
    input.addData(ev(5, "2024-01-01 16:00:00")) // seal nothing new below 13:00
    q.processAllAvailable()
    val rows = spark.table("late_test").collect()
    val w10 = rows.filter(_.getTimestamp(0) == ts("2024-01-01 10:00:00"))
    w10.length shouldBe 1
    w10.head.getLong(2) shouldBe 2L // event 4 was late and excluded
    q.stop()
  }

  test("dedupStream removes within-watermark duplicate event_ids") {
    val input = MemoryStream[Event]
    val dedup = EventStreams.dedupStream(input.toDF())
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    input.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
      ev(2, "2024-01-01 10:01:00"))
    q.processAllAvailable()
    spark.table("dedup_test").count() shouldBe 2L
    q.stop()
  }

  test("enrich: stream-static broadcast join per micro-batch") {
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrich(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_test").outputMode("append").start()
    input.addData(ev(1, "2024-01-01 10:00:00", user = 1L),
      ev(2, "2024-01-01 10:01:00", user = 3L))
    q.processAllAvailable()
    val rows = spark.table("enrich_test").orderBy("event_id").collect()
    rows.map(r => Option(r.getAs[String]("tier"))) shouldBe Array(Some("gold"), None)
    q.stop()
  }

  test("intervalJoin pairs events within the window, drops outside it") {
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = EventStreams.intervalJoin(
      clicks.toDF().select($"user_id", $"ts", $"event_id".as("click_id")),
      buys.toDF().select($"user_id", $"ts", $"event_id".as("buy_id")),
      "user_id", windowSeconds = 600)
      .select($"click_id", $"buy_id")
    val q = joined.writeStream.format("memory").queryName("ij_test")
      .outputMode("append").start()
    clicks.addData(ev(1, "2024-01-01 10:00:00"))
    buys.addData(ev(100, "2024-01-01 10:05:00"), // within 10 min -> pairs
      ev(101, "2024-01-01 11:00:00"))            // outside -> dropped
    q.processAllAvailable()
    val rows = spark.table("ij_test").collect()
    rows.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 100L))
    q.stop()
  }

  test("checkpointed file-sink stream resumes exactly-once across restarts") {
    val srcDir = java.nio.file.Files.createTempDirectory("ckpt-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("ckpt-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-meta").toString
    val events = graft.Tables.events(spark, sf0001)

    def runOnce(): Unit = {
      val q = EventStreams.readEventStream(spark, srcDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    events.filter($"event_id" % 2 === 0).write.mode("append").parquet(srcDir)
    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    afterFirst shouldBe events.filter($"event_id" % 2 === 0).count()

    // restart with more input: only the new file is processed (no dupes)
    events.filter($"event_id" % 2 === 1).write.mode("append").parquet(srcDir)
    runOnce()
    spark.read.parquet(outDir).count() shouldBe events.count()
    spark.read.parquet(outDir).select("event_id").distinct().count() shouldBe events.count()
  }

  test("jdbcSink lands micro-batches in the warehouse with batch ids") {
    val input = MemoryStream[Event]
    val url = "jdbc:derby:memory:streamdw;create=true"
    val props = new java.util.Properties()
    val q = EventStreams.jdbcSink(input.toDF(), url, "stream_events", props).start()
    input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
    q.processAllAvailable()
    input.addData(ev(3, "2024-01-01 10:02:00"))
    q.processAllAvailable()
    val landed = spark.read.jdbc(url, "stream_events", props)
    landed.count() shouldBe 3L
    landed.select("batch_id").distinct().count() shouldBe 2L // two micro-batches
    q.stop()
  }

  test("nearDupQuarantine routes stream batches against the persistent LSH index") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different corpus content with no overlap at all here"))
      .toDF("doc_id", "text")
    val (arrIdx, bandIdx) = Dedup.lshIndex(corpus, k = 3, numPerm = 16, bands = 8)
    val accepted = java.nio.file.Files.createTempDirectory("ndq-acc").toString
    val quarantine = java.nio.file.Files.createTempDirectory("ndq-quar").toString
    try {
      val in = MemoryStream[(Long, String)]
      def stream = in.toDF().toDF("doc_id", "text")
      // 10: near-dup of corpus doc 1 (one word changed); 11: novel
      in.addData((10L, "the quick brown fox jumps over the sleepy dog today"),
        (11L, "entirely novel material nothing like anything indexed before now"))
      val q = EventStreams.nearDupQuarantine(stream, arrIdx, bandIdx,
          k = 3, numPerm = 16, bands = 8, threshold = 0.4,
          accepted, quarantine)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val quar = spark.read.parquet(quarantine)
      val acc = spark.read.parquet(accepted)
      quar.select($"doc_id").as[Long].collect().toSet shouldBe Set(10L)
      acc.select($"doc_id").as[Long].collect().toSet shouldBe Set(11L)
      // batch id rides along for downstream idempotence
      quar.columns should contain("batch_id")
      // a second micro-batch probes the SAME cached index (no corpus re-hash)
      in.addData((12L, "the quick brown fox jumps over the lazy dog today"))
      val q2 = EventStreams.nearDupQuarantine(stream, arrIdx, bandIdx,
          k = 3, numPerm = 16, bands = 8, threshold = 0.4,
          accepted, quarantine)
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(120000)
      spark.read.parquet(quarantine).select($"doc_id").as[Long].collect().toSet shouldBe
        Set(10L, 12L)
    } finally {
      arrIdx.unpersist(blocking = true)
      bandIdx.unpersist(blocking = true)
    }
  }

  test("contaminationGuard flags eval-overlapping stream docs, passes provably-clean ones") {
    import graft.operators.TextAnalysis
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bloom = TextAnalysis.evalShingleBloom(eval, k = 5)
    bloom should not be null
    val in = MemoryStream[(Long, String)]
    // 20 shares eval 5-shingles; 21 is disjoint and must pass untouched
    in.addData((20L, "alpha beta gamma delta epsilon zeta eta"),
      (21L, "one two three four five six seven"))
    val out = EventStreams.contaminationGuard(
      in.toDF().toDF("doc_id", "text"), bloom, k = 5)
    val sink = s"guard_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table(sink).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got(20L) should be >= 2L // both eval shingles of doc 20 hit the bloom
    got(21L) shouldBe 0L     // zero hits: provably clean, no exact pass needed
    // the guard agrees with the exact batch check on the clean doc (a bloom
    // has no false negatives — only the flagged side ever needs verification)
    val exact = TextAnalysis.contamination(
      Seq((20L, "alpha beta gamma delta epsilon zeta eta"),
        (21L, "one two three four five six seven")).toDF("doc_id", "text"),
      eval, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact(21L) shouldBe 0L
    exact(20L) should be >= 2L
    // null bloom (empty eval) marks everything clean
    EventStreams.contaminationGuard(
      Seq((30L, "anything")).toDF("doc_id", "text"), null, k = 5)
      .select($"n_flagged_shingles").as[Long].head() shouldBe 0L
    // a null-text doc is provably clean (no shingles), NOT null-flagged:
    // a NULL count would route it to neither the clean sink nor quarantine
    EventStreams.contaminationGuard(
      Seq((31L, null: String)).toDF("doc_id", "text"), bloom, k = 5)
      .select($"n_flagged_shingles").as[Long].head() shouldBe 0L
  }

  test("sessionize closes sessions on gap and on timeout") {
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 30 * 60 * 1000L)
    val q = sessions.toDF().writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    // user 1: two events 10 min apart (one session), then a 2h gap
    input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"))
    q.processAllAvailable()
    input.addData(ev(3, "2024-01-01 12:30:00")) // gap -> closes first session
    q.processAllAvailable()
    // push watermark far ahead so the second session times out too
    input.addData(ev(4, "2024-01-01 20:00:00", user = 2L))
    q.processAllAvailable()
    input.addData(ev(5, "2024-01-01 23:00:00", user = 2L))
    q.processAllAvailable()
    val rows = spark.table("sess_test").orderBy("session_start").collect()
    rows.length should be >= 2
    val s1 = rows.head
    s1.getLong(0) shouldBe 1L
    s1.getTimestamp(1) shouldBe ts("2024-01-01 10:00:00")
    s1.getTimestamp(2) shouldBe ts("2024-01-01 10:10:00")
    s1.getLong(3) shouldBe 2L
    q.stop()
  }
}
