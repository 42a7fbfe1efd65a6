package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract-level checks of the driver surface: every query runs at
  * sf0.001, the flagship entry returns rows, and every oracle key refers to
  * an implemented query.
  */
class SparkEntrySpec extends AnyFunSuite with Matchers with SparkFixture {

  test("entry returns rows (driver smoke contract)") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      noException should be thrownBy fn(spark, sf0001).count()
    }
  }

  test("j3PrefixMatch: length-banded equi-join (forced) agrees with the startsWith nested loop") {
    // smallBytes = 0 pins the banded large path, MaxValue the BNLJ small
    // path, on the same fixture — the equivalence the scale plan rests on
    // (text.startsWith(p) <=> substring(text, 1, length(p)) = p) checked
    // row-for-row, including null-opening docs and mid-token matches
    val docs = Tables.documents(spark, sf0001)
    val banded = SparkEntry.j3PrefixMatch(docs, smallBytes = 0L)
    val bnlj = SparkEntry.j3PrefixMatch(docs, smallBytes = Long.MaxValue)
    banded.count() shouldBe bnlj.count()
    banded.exceptAll(bnlj).count() shouldBe 0L
    bnlj.exceptAll(banded).count() shouldBe 0L
  }

  test("f17GapFill: one-exchange gap-fill (forced) agrees with the naive join spelling") {
    val ev = Tables.events(spark, sf0001)
    val oneExchange = SparkEntry.f17GapFill(ev, smallBytes = 0L)
    val naive = SparkEntry.f17GapFill(ev, smallBytes = Long.MaxValue)
    oneExchange.count() shouldBe naive.count()
    oneExchange.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(oneExchange).count() shouldBe 0L
  }

  test("f17GapFill large path: zero-gap generation — no join touches generated rows") {
    val plan = SparkEntry.f17GapFill(Tables.events(spark, sf0001), smallBytes = 0L)
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should include ("Generate")
    plan should include ("Window")
  }

  test("j1A1Rollup: both scale paths (forced) agree with the broadcast-star path") {
    // smallBytes = 0 pins a scale plan; probeBytes then picks which one:
    // MaxValue → broadcast-probe straight to s_nationkey slots, 0 → the
    // suppkey pre-aggregate. All three must agree row-for-row.
    val probe = SparkEntry.j1A1Rollup(spark, sf0001, smallBytes = 0L,
      probeBytes = Long.MaxValue)
    val pre = SparkEntry.j1A1Rollup(spark, sf0001, smallBytes = 0L,
      probeBytes = 0L)
    val star = SparkEntry.j1A1Rollup(spark, sf0001, smallBytes = Long.MaxValue)
    for (p <- Seq(probe, pre))
      p.schema.map(f => (f.name, f.dataType)) shouldBe
        star.schema.map(f => (f.name, f.dataType))
    probe.exceptAll(star).count() shouldBe 0L
    star.exceptAll(probe).count() shouldBe 0L
    pre.exceptAll(star).count() shouldBe 0L
    star.exceptAll(pre).count() shouldBe 0L
  }

  test("a2CountDistinct: persisted pair-dedup path (forced) agrees with the one-pass aggregate") {
    val dedup = SparkEntry.a2CountDistinct(spark, sf0001, smallBytes = 0L)
    val onePass = SparkEntry.a2CountDistinct(spark, sf0001, smallBytes = Long.MaxValue)
    dedup.exceptAll(onePass).count() shouldBe 0L
    onePass.exceptAll(dedup).count() shouldBe 0L
  }

  test("a11Percentiles: collect-sort small path (forced) agrees with the percentile aggregate") {
    // bit-identical doubles required (the oracle hashes values): same
    // sorted order, same IEEE interpolation arithmetic on both paths
    val collectSort = SparkEntry.a11Percentiles(spark, sf0001, smallBytes = Long.MaxValue)
    val percentileAgg = SparkEntry.a11Percentiles(spark, sf0001, smallBytes = 0L)
    collectSort.exceptAll(percentileAgg).count() shouldBe 0L
    percentileAgg.exceptAll(collectSort).count() shouldBe 0L
  }

  test("a6SketchAgg: large decomposition (forced) agrees with the small path") {
    // exact columns and tolerance bools must agree; the sketch VALUES (ap,
    // ao, am) are internal and partitioning-sensitive, which is exactly why
    // the query exports only their within-tolerance flags
    val split = SparkEntry.a6SketchAgg(spark, sf0001, smallBytes = 0L)
    val onePass = SparkEntry.a6SketchAgg(spark, sf0001, smallBytes = Long.MaxValue)
    split.exceptAll(onePass).count() shouldBe 0L
    onePass.exceptAll(split).count() shouldBe 0L
  }

  test("j4Roleplay: packed-exchange path (forced) agrees with the plain-join path") {
    // layout = Some(false) pins the EXCHANGE plans: with a bucketed
    // layout on disk (another test may have written one) packedBytes = 0
    // would otherwise route to the layout instead of the packed plan
    val packed = SparkEntry.j4Roleplay(spark, sf0001,
      packedBytes = 0L, layout = Some(false))
    val plain = SparkEntry.j4Roleplay(spark, sf0001,
      packedBytes = Long.MaxValue, layout = Some(false))
    packed.collect().map(_.toString).sorted shouldBe
      plain.collect().map(_.toString).sorted
  }

  test("j4Roleplay: bucketed-layout routing (forced both ways) changes the plan, never the answer") {
    // Some(true) builds/registers the layout and routes through it;
    // Some(false) pins the exchange plans — identical rows either way
    val viaLayout = SparkEntry.j4Roleplay(spark, sf0001, layout = Some(true))
    val exchange = SparkEntry.j4Roleplay(spark, sf0001,
      packedBytes = 0L, layout = Some(false))
    viaLayout.collect().map(_.toString).sorted shouldBe
      exchange.collect().map(_.toString).sorted
    // the routed plan really consumes the on-disk layout
    viaLayout.queryExecution.executedPlan.toString should include("graft-bucketed")
    // and the DEFAULT probe takes it once the layout exists and the
    // stats sit past the gate (packedBytes = 0 ⇒ never "small")
    SparkEntry.probeBucketedLayout(sf0001) should not be empty
    val routed = SparkEntry.j4Roleplay(spark, sf0001, packedBytes = 0L)
    routed.queryExecution.executedPlan.toString should include("graft-bucketed")
    // while under the gate (everything is "small" at MaxValue) the probe
    // stands down and the small exchange plan keeps the query
    val small = SparkEntry.j4Roleplay(spark, sf0001, packedBytes = Long.MaxValue)
    small.queryExecution.executedPlan.toString should not include "graft-bucketed"
  }

  test("layout_bucketed_join: layout changes the plan, never the answer; join is exchange-free") {
    val bucketed = SparkEntry.queries("layout_bucketed_join")(spark, sf0001)
    val shipped = SparkEntry.queries("j4_roleplay_join")(spark, sf0001)
    bucketed.collect().map(_.toString).sorted shouldBe
      shipped.collect().map(_.toString).sorted
    // the fact-fact join consumes the bucket distribution: at most ONE
    // hash exchange survives in the final plan (the 625-group agg)
    val df = SparkEntry.queries("layout_bucketed_join")(spark, sf0001)
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "Exchange hashpartitioning".r.findAllIn(planStr).size should be <= 1
  }

  test("q18LargeOrders: bucketed-layout routing (forced both ways) changes the plan, never the answer") {
    val viaLayout = SparkEntry.q18LargeOrders(spark, sf0001, layout = Some(true))
    val exchange = SparkEntry.q18LargeOrders(spark, sf0001, layout = Some(false))
    viaLayout.collect().map(_.toString).sorted shouldBe
      exchange.collect().map(_.toString).sorted
    // the routed per-order sum consumes the bucket distribution: the
    // layout scan is there and no hash exchange precedes the aggregate
    val p = viaLayout.queryExecution.executedPlan.toString
    p should include("graft-bucketed")
    p should not include "Exchange hashpartitioning"
    // the layout now exists, so the default probe takes it
    SparkEntry.probeLiOqLayout(sf0001) should not be empty
    SparkEntry.q18LargeOrders(spark, sf0001).queryExecution
      .executedPlan.toString should include("graft-bucketed")
  }

  test("layout probes: incomplete or foreign layouts are never routed to") {
    // a probe must answer None — never write, never throw — for every
    // not-actually-usable state: no directory, no _SUCCESS, wrong key
    val dir = java.nio.file.Files.createTempDirectory("probe-neg").toString
    val s = spark
    import s.implicits._
    Seq((1L, 1L, 300.0)).toDF("l_orderkey", "l_suppkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L, java.sql.Date.valueOf("2024-01-01"), 10.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    // nothing on disk
    SparkEntry.probeBucketedLayout(dir) shouldBe empty
    SparkEntry.probeLiOqLayout(dir) shouldBe empty
    SparkEntry.probeOrdOqLayout(dir) shouldBe empty
    // a sidecar WITHOUT _SUCCESS (interrupted write) is not a layout
    val liOq = s"/tmp/graft-bucketed/${SparkEntry.layoutSlug(dir, "lineitem.parquet")}/li_oq"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(liOq))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(liOq, operators.Bucketing.MetaFile),
      """{"buckets":8,"key":"l_orderkey"}""")
    SparkEntry.probeLiOqLayout(dir) shouldBe empty
    // _SUCCESS present but the sidecar names a FOREIGN key → not usable
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(liOq, "_SUCCESS"), "")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(liOq, operators.Bucketing.MetaFile),
      """{"buckets":8,"key":"l_partkey"}""")
    SparkEntry.probeLiOqLayout(dir) shouldBe empty
    // right key + _SUCCESS → the count surfaces; q18's default probe
    // still stands down because ord_oq is missing (never pays its write)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(liOq, operators.Bucketing.MetaFile),
      """{"buckets":8,"key":"l_orderkey"}""")
    SparkEntry.probeLiOqLayout(dir) shouldBe Some(8)
    SparkEntry.probeOrdOqLayout(dir) shouldBe empty
    val p = SparkEntry.q18LargeOrders(spark, dir)
      .queryExecution.executedPlan.toString
    p should not include "graft-bucketed"
  }

  test("r14 layout probes (ev_uts, gold_wr): incomplete or foreign layouts never route") {
    val dir = java.nio.file.Files.createTempDirectory("probe-neg-r14").toString
    val s = spark
    import s.implicits._
    Seq((1L, 7L, new java.sql.Timestamp(1700000000000L), 1.5))
      .toDF("event_id", "user_id", "ts", "value")
      .write.parquet(s"$dir/events.parquet")
    Seq((1L, 1L, java.sql.Date.valueOf("2024-01-01"), 10.0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // nothing on disk → both default plans stay direct
    SparkEntry.probeEvUtsLayout(dir) shouldBe empty
    SparkEntry.chessScaleWinrate(spark, dir)
      .queryExecution.executedPlan.toString should not include "graft-bucketed"
    // ev_uts: sidecar without _SUCCESS (interrupted write) is not a layout
    val evUts = s"/tmp/graft-bucketed/${SparkEntry.layoutSlug(dir, "events.parquet")}/ev_uts"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evUts))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(evUts, operators.Bucketing.MetaFile),
      """{"buckets":8,"key":"user_id","sort":["user_id","ts"]}""")
    SparkEntry.probeEvUtsLayout(dir) shouldBe empty
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(evUts, "_SUCCESS"), "")
    // _SUCCESS + wrong KEY → not usable
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(evUts, operators.Bucketing.MetaFile),
      """{"buckets":8,"key":"event_id","sort":["event_id","ts"]}""")
    SparkEntry.probeEvUtsLayout(dir) shouldBe empty
    // right key but key-only SORT (a pre-r14 sidecar) → the tape plan
    // needs the (user_id, ts) order; a key-only layout must not route
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(evUts, operators.Bucketing.MetaFile),
      """{"buckets":8,"key":"user_id"}""")
    SparkEntry.probeEvUtsLayout(dir) shouldBe empty
    // corrupt sidecar degrades to the direct plan, never throws
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(evUts, operators.Bucketing.MetaFile),
      """{"buckets": garbage""")
    SparkEntry.probeEvUtsLayout(dir) shouldBe empty
    noException should be thrownBy
      SparkEntry.j5AsofJoin(spark, dir).queryExecution.executedPlan
    // the full correct sidecar finally routes
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(evUts, operators.Bucketing.MetaFile),
      """{"buckets":8,"key":"user_id","sort":["user_id","ts"]}""")
    SparkEntry.probeEvUtsLayout(dir) shouldBe Some(8)
  }

  test("a6SketchAgg: an EMPTY relation yields one row, no error, on both forced paths (r12 ADVICE)") {
    // pre-fix the small path's positional median read raised
    // "SQL array indices start at 1" (lo = floor(-0.5) = -1 on zero rows)
    val dir = java.nio.file.Files.createTempDirectory("a6-empty").toString
    val s = spark
    import s.implicits._
    Seq.empty[(Long, Long, Double)]
      .toDF("l_partkey", "l_orderkey", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val small = SparkEntry.a6SketchAgg(spark, dir, smallBytes = Long.MaxValue).collect()
    val large = SparkEntry.a6SketchAgg(spark, dir, smallBytes = 0L).collect()
    small.map(_.toString) shouldBe large.map(_.toString)
    small.length shouldBe 1
    small.head.getLong(0) shouldBe 0L // exact_parts: 0, not NULL
    small.head.isNullAt(2) shouldBe true // exact_median_price: NULL like percentile()
  }

  test("j4Roleplay: packed path fails loudly on a nationkey outside the 5-bit domain") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("j4-guard").toString
    val s = spark
    import s.implicits._
    Seq((1L, 7L)).toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    // supplier nationkey 40: does not fit orderkey<<5 | nationkey
    Seq((7L, 40L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((3L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "A"), (40L, "Z")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    val e = intercept[Exception] {
      SparkEntry.j4Roleplay(spark, dir, packedBytes = 0L).collect()
    }
    e.getMessage should include regex "(?s)nationkey outside"
  }

  test("q13Custdist: persisted sum-over-nonzero path (forced) agrees with the parallel-branch plan") {
    val large = SparkEntry.q13Custdist(spark, sf0001, smallBytes = 0L)
    val small = SparkEntry.q13Custdist(spark, sf0001, smallBytes = Long.MaxValue)
    large.exceptAll(small).count() shouldBe 0L
    small.exceptAll(large).count() shouldBe 0L
  }

  test("j1_star_join: eliminated plan agrees with the physical-join plan (rule off)") {
    val eliminated = SparkEntry.queries("j1_star_join")(spark, sf0001)
    val joined = try {
      spark.conf.set("spark.graft.eliminateUniqueKeyJoins", "false")
      val df = SparkEntry.queries("j1_star_join")(spark, sf0001)
      df.queryExecution.executedPlan.toString should include("Join")
      df.collect()
    } finally spark.conf.unset("spark.graft.eliminateUniqueKeyJoins")
    eliminated.collect().sortBy(_.toString).map(_.toString) shouldBe
      joined.sortBy(_.toString).map(_.toString)
  }

  test("text_pii_redact leaves no detectable PII behind") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("text_pii_redact")(spark, sf0001)
    out.filter(col("redacted").rlike("[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+") ||
        col("redacted").rlike("https?://[^ <]+") ||
        col("redacted").rlike("[0-9]{6,}"))
      .count() shouldBe 0L
  }

  test("chess_scale_winrate: forced gold layout agrees with the direct projection") {
    // Some(true) builds the write-once gold_wr layout (the only path that
    // writes — the default probe never does), Some(false) pins the direct
    // orders projection; GATES layout-probe convention
    val viaLayout = SparkEntry.chessScaleWinrate(spark, sf0001, layout = Some(true))
    val direct = SparkEntry.chessScaleWinrate(spark, sf0001, layout = Some(false))
    viaLayout.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(viaLayout).count() shouldBe 0L
    // the routed plan consumes the layout dir, not the orders table
    viaLayout.queryExecution.executedPlan.toString should include("gold_wr")
  }

  test("j5_asof_join: forced tape layout agrees with the direct plan and drops exchange AND sort") {
    val viaLayout = SparkEntry.j5AsofJoin(spark, sf0001, layout = Some(true))
    val direct = SparkEntry.j5AsofJoin(spark, sf0001, layout = Some(false))
    viaLayout.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(viaLayout).count() shouldBe 0L
    // the routed plan consumes the sorted bucketed tape: zero shuffle
    // exchanges and zero sorts — a pure streaming window pass
    val p = viaLayout.queryExecution.executedPlan.toString
    p should include("ev_uts")
    p should not include "Exchange hashpartitioning"
    "\\+- Sort ".r.findAllIn(p).length shouldBe 0
  }

  test("j5b_asof_two_table: forced tape layout agrees with the direct two-table plan, exchange- and sort-free") {
    val viaLayout = SparkEntry.j5bAsofTwoTable(spark, sf0001, layout = Some(true))
    val direct = SparkEntry.j5bAsofTwoTable(spark, sf0001, layout = Some(false))
    viaLayout.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(viaLayout).count() shouldBe 0L
    // and both agree with j5 (identical semantics, different engine path)
    val j5 = SparkEntry.j5AsofJoin(spark, sf0001, layout = Some(false))
    direct.exceptAll(j5).count() shouldBe 0L
    j5.exceptAll(direct).count() shouldBe 0L
    val p = viaLayout.queryExecution.executedPlan.toString
    p should include("ev_tape2")
    p should not include "Exchange hashpartitioning"
    "\\+- Sort ".r.findAllIn(p).length shouldBe 0
  }

  test("chess_scale_winrate: engine dim and oracle VALUES both derive from Dims.resultSeed") {
    val seed = graft.chess.Dims.resultSeed
    // ASCII-lowercase-alphanumeric code contract: JVM UTF-16 ordering and
    // DuckDB's default collation agree on ASCII, so the sorted-code index
    // both sides derive is identical. A non-ASCII code would break that
    // silently — fail here instead.
    all(seed.map(_._1)) should fullyMatch regex "[a-z0-9]+"
    // the oracle's VALUES literal is generated from the constant — every
    // (code, result) pair must appear verbatim, and no extras
    val sql = SparkEntry.oracleSql("chess_scale_winrate")
    for ((c, r, _) <- seed) sql should include(s"('$c','$r')")
    "\\('([a-z0-9]+)','".r.findAllMatchIn(sql).map(_.group(1)).toSet shouldBe
      seed.map(_._1).toSet
    // and Dims.results serves exactly the constant
    val rows = graft.chess.Dims.results(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    rows should contain theSameElementsAs seed
  }

  test("dedup_split_by_cluster: no cluster straddles the train/val boundary") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("dedup_split_by_cluster")(spark, sf0001)
    out.groupBy(col("component"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count() shouldBe 0L
    // and both splits are populated at this sf (0.9/0.1 expected shares)
    out.select(countDistinct(col("split"))).head.getLong(0) shouldBe 2L
  }
}
