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
}
