package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Co-located join via bucketing: writing lineitem and orders bucketed by
  * the join key removes the shuffle exchange from the join plan entirely,
  * and the bucketed join returns identical results.
  */
class BucketingSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val ord = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 4)

    // force the shuffle-join path (at bench scale both sides are fact-size;
    // locally AQE would broadcast these small tables and hide the exchange)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plainJoin = li.join(ord, $"l_orderkey" === $"o_orderkey")
      val bucketedJoin = Bucketing.table(spark, "li_bucketed")
        .join(Bucketing.table(spark, "ord_bucketed"), $"l_orderkey" === $"o_orderkey")

      // sanity: the unbucketed plan shuffles, the bucketed one must not
      Bucketing.hasShuffle(plainJoin) shouldBe true
      Bucketing.hasShuffle(bucketedJoin) shouldBe false
      // and the bucketed SMJ trusts the 1-file-per-bucket sorted layout
      // (GraftSession sets the legacy outputOrdering conf; the aligned
      // write guarantees the precondition): no per-query re-sort of the
      // fact sides — at x1000 this is the 25.8 -> 18.2 s difference
      (bucketedJoin.queryExecution.executedPlan.toString
        should not).include("Sort [")

      bucketedJoin.count() shouldBe plainJoin.count()
      val a = bucketedJoin.agg(sum($"l_extendedprice" * $"o_totalprice")).head.getDouble(0)
      val b = plainJoin.agg(sum($"l_extendedprice" * $"o_totalprice")).head.getDouble(0)
      a shouldBe b +- math.abs(b) * 1e-12 // accumulation order differs
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key is also exchange-free") {
    val agg = Bucketing.table(spark, "li_bucketed")
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
    Bucketing.hasShuffle(agg) shouldBe false
    agg.count() should be > 0L
  }

  // a DETACHED external layout: written once, its catalog entry dropped
  // (external -> the files survive, unlike a managed DROP) — the on-disk
  // state a FRESH session faces when a previous JVM paid the write
  private lazy val extLoc: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketing-ext")
    val loc = dir.resolve("li_ext").toString
    Bucketing.writeBucketedExternal(
      graft.Tables.lineitem(spark, sf0001).select($"l_orderkey", $"l_quantity"),
      "li_ext_seed", "l_orderkey", 4, loc)
    spark.sql("DROP TABLE li_ext_seed")
    loc
  }

  test("write records a sidecar; registerExternal re-registers a detached layout from it") {
    // managed writes record the sidecar at the managed location too
    Bucketing.readMeta(Bucketing.managedLocation(spark, "ord_bucketed")) shouldBe
      Some(Bucketing.BucketMeta(4, "o_orderkey"))
    Bucketing.readMeta(extLoc) shouldBe Some(Bucketing.BucketMeta(4, "l_orderkey"))
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(extLoc, "_SUCCESS")) shouldBe true
    spark.catalog.tableExists("li_ext_seed") shouldBe false
    Bucketing.registerExternal(spark, "li_reattached", extLoc)
    val again = Bucketing.table(spark, "li_reattached")
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
    Bucketing.hasShuffle(again) shouldBe false
    again.count() should be > 0L
  }

  test("registerExternal fails fast when the expected bucket count disagrees with disk") {
    spark.sql("DROP TABLE IF EXISTS li_misdeclared")
    // registering a 4-bucket layout as 2 buckets would silently drop every
    // file with bucket id >= 2 (~half the rows) — the API must refuse
    val ex = intercept[IllegalArgumentException] {
      Bucketing.registerExternal(spark, "li_misdeclared", extLoc, expect = Some(2))
    }
    ex.getMessage should include("refusing to register")
    spark.catalog.tableExists("li_misdeclared") shouldBe false
  }

  test("readMetaOpt degrades a corrupt sidecar to None; readMeta fails fast") {
    val metaPath = java.nio.file.Paths.get(extLoc, Bucketing.MetaFile)
    val bytes = java.nio.file.Files.readAllBytes(metaPath)
    java.nio.file.Files.write(metaPath,
      "{\"buckets\": garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      // the probe contract (GATES "a probe never writes / never throws"):
      // an unreadable sidecar routes to the exchange plan, silently
      Bucketing.readMetaOpt(extLoc) shouldBe None
      // but a caller about to TRUST the layout must see the error
      intercept[RuntimeException] { Bucketing.readMeta(extLoc) }
        .getMessage should include("unparseable")
    } finally java.nio.file.Files.write(metaPath, bytes)
  }

  test("registerExternal derives the count from part-file names when no sidecar exists") {
    val metaPath = java.nio.file.Paths.get(extLoc, Bucketing.MetaFile)
    val bytes = java.nio.file.Files.readAllBytes(metaPath)
    java.nio.file.Files.delete(metaPath) // emulate a pre-sidecar layout
    try {
      Bucketing.bucketIdsOnDisk(extLoc) shouldBe Seq(0, 1, 2, 3)
      spark.sql("DROP TABLE IF EXISTS li_presidecar")
      // no sidecar and no key → unrecoverable, must say so
      val ex = intercept[RuntimeException] {
        Bucketing.registerExternal(spark, "li_presidecar", extLoc)
      }
      ex.getMessage should include("keyFallback")
      Bucketing.registerExternal(spark, "li_presidecar", extLoc,
        keyFallback = Some("l_orderkey"), expect = Some(4))
      Bucketing.hasShuffle(Bucketing.table(spark, "li_presidecar")
        .groupBy($"l_orderkey").agg(count(lit(1)))) shouldBe false
      spark.sql("DROP TABLE li_presidecar")
    } finally java.nio.file.Files.write(metaPath, bytes)
  }

  test("ensureBucketed writes once, re-registers from disk, and matches the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketing-spec")
    val loc = dir.resolve("ord_b").toString
    def build = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey")
    val t1 = Bucketing.ensureBucketed(spark, "ord_ensure", loc, "o_orderkey", 4)(build)
    val n = t1.count()
    n shouldBe build.count()
    // drop only the catalog entry: ensure must recover from the files
    spark.sql("DROP TABLE ord_ensure")
    val t2 = Bucketing.ensureBucketed(spark, "ord_ensure", loc, "o_orderkey", 4)(
      sys.error("ensureBucketed must not rebuild an existing layout"))
    t2.count() shouldBe n
    // a wrong expected count on re-register fails instead of dropping rows
    spark.sql("DROP TABLE ord_ensure")
    intercept[IllegalArgumentException] {
      Bucketing.ensureBucketed(spark, "ord_ensure", loc, "o_orderkey", 8)(build)
    }
    spark.sql("DROP TABLE IF EXISTS ord_ensure")
  }

  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import java.nio.file.{Files => F}
    F.createDirectories(to)
    F.list(from).forEach { p =>
      val t = to.resolve(p.getFileName)
      if (F.isDirectory(p)) copyTree(p, t) else F.copy(p, t)
    }
  }

  test("a stale layout can never serve old rows: slug layer, sidecar source layer, trust fail-fast") {
    import java.nio.file.{Files => F, Paths => P}
    val fixture = F.createTempDirectory("graft-fp-fixture").toString
    val srcEvents = spark.read.parquet(s"$sf0001/events.parquet")
    srcEvents.write.mode("overwrite").parquet(s"$fixture/events.parquet")

    // no layout yet → probe misses
    graft.SparkEntry.probeEvUtsLayout(fixture) shouldBe None
    // forced path builds the ev_uts layout; probe now routes to it
    val staleRows = graft.SparkEntry.j5AsofJoin(spark, fixture, Some(true)).count()
    graft.SparkEntry.probeEvUtsLayout(fixture) should not be None
    val slugA = graft.SparkEntry.layoutSlug(fixture, "events.parquet")
    Bucketing.readMeta(s"/tmp/graft-bucketed/$slugA/ev_uts")
      .flatMap(_.source) shouldBe Some(slugA)

    // REGENERATE the fixture (half the events): the content fingerprint
    // moves, so the old layout's path is simply never probed again
    srcEvents.filter($"event_id" % 2 === 0)
      .write.mode("overwrite").parquet(s"$fixture/events.parquet")
    graft.Tables.invalidate(Some(fixture)) // REFRESH after regen (TESTDATA.md contract)
    val slugB = graft.SparkEntry.layoutSlug(fixture, "events.parquet")
    slugB should not be slugA
    graft.SparkEntry.probeEvUtsLayout(fixture) shouldBe None

    // adversarial second layer: the STALE layout dir reappears at the
    // CURRENT slug path (copied/renamed/restored-from-backup). Path
    // evidence alone would trust it — the sidecar source fingerprint
    // (slugA, recorded at write time) disagrees with the fixture's
    // current fingerprint (slugB), so the probe must reject it and the
    // shipped query must compute from the FRESH fixture.
    val stalePath = P.get(s"/tmp/graft-bucketed/$slugB/ev_uts")
    copyTree(P.get(s"/tmp/graft-bucketed/$slugA/ev_uts"), stalePath)
    try {
      graft.SparkEntry.probeEvUtsLayout(fixture) shouldBe None
      val routed = graft.SparkEntry.j5AsofJoin(spark, fixture)
      val fresh = graft.SparkEntry.j5AsofJoin(spark, fixture, Some(false))
      routed.exceptAll(fresh).count() shouldBe 0L
      fresh.exceptAll(routed).count() shouldBe 0L
      routed.count() should be < staleRows // stale rows would double-count
      // and a caller about to TRUST the stale dir fails fast, loudly
      spark.sql("DROP TABLE IF EXISTS ev_stale_reg")
      val ex = intercept[IllegalArgumentException] {
        Bucketing.registerExternal(spark, "ev_stale_reg", stalePath.toString,
          expectSource = Some(slugB))
      }
      ex.getMessage should include("stale bucketed layout")
      spark.catalog.tableExists("ev_stale_reg") shouldBe false
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft_ev_uts_$slugA")
      Seq(slugA, slugB).foreach { s =>
        val root = P.get(s"/tmp/graft-bucketed/$s")
        if (F.exists(root))
          F.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => F.delete(p))
      }
    }
  }

  test("gold_wr source-fp file gates the chess_scale_winrate layout the same way") {
    import java.nio.file.{Files => F, Paths => P}
    val fixture = F.createTempDirectory("graft-fp-gold").toString
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.mode("overwrite").parquet(s"$fixture/orders.parquet")
    val slug = graft.SparkEntry.layoutSlug(fixture, "orders.parquet")
    try {
      val built = graft.SparkEntry.chessScaleWinrate(spark, fixture, Some(true))
      built.count() should be > 0L
      val fp = P.get(s"/tmp/graft-bucketed/$slug/gold_wr/_graft_source_fp")
      new String(F.readAllBytes(fp), "UTF-8") shouldBe slug
      // routed plan consumes the layout while the fp matches …
      graft.SparkEntry.chessScaleWinrate(spark, fixture)
        .queryExecution.executedPlan.toString should include("gold_wr")
      // … and abandons it the moment the fp names another generation
      F.write(fp, "deadbeefdead".getBytes("UTF-8"))
      val rerouted = graft.SparkEntry.chessScaleWinrate(spark, fixture)
      rerouted.queryExecution.executedPlan.toString should not include "gold_wr"
      val raw = graft.SparkEntry.chessScaleWinrate(spark, fixture, Some(false))
      rerouted.exceptAll(raw).count() shouldBe 0L
      raw.exceptAll(rerouted).count() shouldBe 0L
    } finally {
      val root = P.get(s"/tmp/graft-bucketed/$slug")
      if (F.exists(root))
        F.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => F.delete(p))
    }
  }
}
