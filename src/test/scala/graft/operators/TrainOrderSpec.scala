package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TrainOrderSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  private val docs = (0L until 200L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")

  /** The definition: global row_number over (hash, id), minus one. */
  private def oracle(seed: Long): Map[Long, Long] = {
    val h = conv(substring(md5(concat_ws("_", lit(seed), $"doc_id".cast("string"))), 1, 8), 16, 10)
      .cast("long")
    docs.withColumn("pos", row_number().over(Window.orderBy(h, $"doc_id")) - 1)
      .select($"doc_id", $"pos".cast("long")).as[(Long, Long)].collect().toMap
  }

  test("epochShuffle matches the single-window definition") {
    val got = TrainOrder.epochShuffle(docs, "doc_id", seed = 7L, buckets = 16, smallBytes = 0L)
      .select($"doc_id", $"shuffle_pos").as[(Long, Long)].collect().toMap
    got shouldBe oracle(7L)
  }

  test("positions are a contiguous 0-based permutation; seeds differ") {
    val p1 = TrainOrder.epochShuffle(docs, "doc_id", seed = 1L, buckets = 8, smallBytes = 0L)
      .select($"shuffle_pos").as[Long].collect().sorted
    p1 shouldBe (0L until 200L).toArray
    val o1 = TrainOrder.epochShuffle(docs, "doc_id", seed = 1L, buckets = 8, smallBytes = 0L)
      .select($"doc_id", $"shuffle_pos").as[(Long, Long)].collect().toMap
    val o2 = TrainOrder.epochShuffle(docs, "doc_id", seed = 2L, buckets = 8, smallBytes = 0L)
      .select($"doc_id", $"shuffle_pos").as[(Long, Long)].collect().toMap
    o1 should not be o2 // independent permutation per epoch seed
    // bucket count does not change the order, only the plan
    val wide = TrainOrder.epochShuffle(docs, "doc_id", seed = 1L, buckets = 1000, smallBytes = 0L)
      .select($"doc_id", $"shuffle_pos").as[(Long, Long)].collect().toMap
    wide shouldBe o1
  }

  test("tokenBudgetHead matches the single-window definition; bucket-prune invariant") {
    val toks = docs.withColumn("n_tokens", ($"doc_id" % 30 + 1).cast("long"))
    val h = conv(substring(md5(concat_ws("_", lit(3L), $"doc_id".cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val oracle = toks
      .withColumn("cum", sum($"n_tokens").over(Window.orderBy(h, $"doc_id")))
      .filter($"cum" <= 400L)
      .select($"doc_id", $"cum".cast("long")).as[(Long, Long)].collect().toMap
    oracle should not be empty
    oracle.size should be < 200 // the budget actually cuts
    for (b <- Seq(4, 64, 1000)) { // prune path exercised at several widths
      val got = TrainOrder.tokenBudgetHead(toks, "doc_id", "n_tokens",
          seed = 3L, budget = 400L, buckets = b, smallBytes = 0L)
        .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
      got shouldBe oracle
    }
  }

  test("tokenBudgetHeadExpr (deferred kernel) agrees with tokenBudgetHead on both paths") {
    val tokExpr = ($"doc_id" % 30 + 1).cast("long")
    val toks = docs.withColumn("n_tokens", tokExpr)
    for (smallBytes <- Seq(0L, Long.MaxValue)) { // budget path AND window path
      val viaCol = TrainOrder.tokenBudgetHead(toks, "doc_id", "n_tokens",
          seed = 3L, budget = 400L, buckets = 64, smallBytes = smallBytes)
        .select($"doc_id", $"n_tokens", $"cum_tokens")
      val viaExpr = TrainOrder.tokenBudgetHeadExpr(docs, "doc_id", "n_tokens",
          tokExpr, seed = 3L, budget = 400L, buckets = 64, smallBytes = smallBytes)
        .select($"doc_id", $"n_tokens", $"cum_tokens")
      viaExpr.exceptAll(viaCol).count() shouldBe 0L
      viaCol.exceptAll(viaExpr).count() shouldBe 0L
    }
    // a pre-existing token column is a contract error, not silent shadowing
    intercept[IllegalArgumentException] {
      TrainOrder.tokenBudgetHeadExpr(toks, "doc_id", "n_tokens", tokExpr,
        seed = 3L, budget = 400L)
    }.getMessage should include("already exists")
    // deferral invariant: on the budget path the kernel sits ABOVE the
    // prune join — exactly one kernel evaluation below any join in the
    // optimized plan (the stats pass), none on the scan side of the join
    val plan = TrainOrder.tokenBudgetHeadExpr(docs, "doc_id", "n_tokens",
        tokExpr, seed = 3L, budget = 400L, buckets = 64, smallBytes = 0L)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    joins should not be empty
    val kernelBelowJoin = joins.head.left.expressions.map(_.toString)
      .count(_.contains("% 30"))
    withClue(s"kernel expressions on the probe side below the prune join: ") {
      kernelBelowJoin shouldBe 0
    }
  }

  test("tokenBudgetPerSource matches the per-source single-window definition") {
    val toks = docs.withColumn("n_tokens", ($"doc_id" % 30 + 1).cast("long"))
    val h = conv(substring(md5(concat_ws("_", lit(5L), $"doc_id".cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val oracle = toks
      .withColumn("cum", sum($"n_tokens").over(
        Window.partitionBy($"source").orderBy(h, $"doc_id")))
      .filter($"cum" <= 300L)
      .select($"doc_id", $"cum".cast("long")).as[(Long, Long)].collect().toMap
    oracle should not be empty
    oracle.size should be < 200 // the cap actually cuts
    for (b <- Seq(4, 64, 1000)) { // dead-bucket prune exercised at several widths
      val got = TrainOrder.tokenBudgetPerSource(toks, "doc_id", "n_tokens",
          "source", seed = 5L, budget = 300L, buckets = b, smallBytes = 0L)
        .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
      got shouldBe oracle
    }
    // every source is individually capped, and each contributes something
    val bySrc = TrainOrder.tokenBudgetPerSource(toks, "doc_id", "n_tokens",
        "source", seed = 5L, budget = 300L, smallBytes = 0L)
      .groupBy($"source").agg(max($"cum_tokens").as("m"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    bySrc.length shouldBe 4
    bySrc.foreach { case (_, m, n) => m should be <= 300L; n should be > 0L }
  }

  test("shardAssignments: round-robin along the order → equal sizes, unbiased") {
    val got = TrainOrder.shardAssignments(docs, "doc_id", seed = 5L, numShards = 8, smallBytes = 0L)
      .select($"doc_id", $"shuffle_pos", $"shard").as[(Long, Long, Long)].collect()
    got.length shouldBe 200
    got.foreach { case (_, pos, shard) => shard shouldBe pos % 8 }
    val sizes = got.groupBy(_._3).view.mapValues(_.length).toMap
    sizes.values.toSet shouldBe Set(25) // 200 / 8 exactly
  }

  test("tokenBudgetHead: zero budget keeps nothing; huge budget keeps all") {
    val toks = docs.withColumn("n_tokens", lit(5L))
    TrainOrder.tokenBudgetHead(toks, "doc_id", "n_tokens", seed = 1L, budget = 0L, smallBytes = 0L)
      .count() shouldBe 0L
    val all = TrainOrder.tokenBudgetHead(toks, "doc_id", "n_tokens",
      seed = 1L, budget = Long.MaxValue, smallBytes = 0L)
    all.count() shouldBe 200L
    all.agg(max($"cum_tokens")).as[Long].head() shouldBe 1000L
  }

  test("tokenBudgetHead: null token count fails with the contract error on BOTH paths") {
    // r13: the contract is in-plan (raise_error) on both paths — it
    // surfaces at the ACTION with the operator-named message (match on
    // the message, not the class; the large path used to throw eagerly
    // from its stats collect, which the in-plan redesign removed)
    val bad = Seq((1L, Some(3L)), (2L, None)).toDF("doc_id", "n_tokens")
    for (smallBytes <- Seq(0L, Long.MaxValue)) {
      val e = intercept[Exception] {
        TrainOrder.tokenBudgetHead(bad, "doc_id", "n_tokens",
          seed = 1L, budget = 10L, smallBytes = smallBytes).collect()
      }
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      chain should include("tokenBudgetHead")
      chain should include("non-null")
    }
  }

  test("null id fails fast with the contract error") {
    val bad = Seq((Some(1L), "a"), (None, "b")).toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      TrainOrder.epochShuffle(bad, "doc_id", seed = 1L, smallBytes = 0L).count()
    }
    e.getMessage should include("null 'doc_id'")
  }

  test("sourceInterleave: positions cycle sources round-robin; bucket-count invariant") {
    val mixed = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("doc_id", "source")
    val out = TrainOrder.sourceInterleave(mixed, "doc_id", "source",
      seed = 13L, buckets = 4, smallBytes = 0L)
      .select($"doc_id", $"source", $"source_rank", $"interleave_pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // pos = rank*3 + idx(source): a->0,3,6  b->1,4  c->2
    out.map(_._4).sorted shouldBe Array(0L, 1L, 2L, 3L, 4L, 6L)
    // reading in position order alternates sources while all are live
    val bySrcOrder = out.sortBy(_._4).map(_._2)
    bySrcOrder.take(3) shouldBe Array("a", "b", "c")
    // within-source ranks are contiguous 0-based
    out.filter(_._2 == "a").map(_._3).sorted shouldBe Array(0L, 1L, 2L)
    out.filter(_._2 == "b").map(_._3).sorted shouldBe Array(0L, 1L)
    // bucket count changes the plan, not the order
    val wide = TrainOrder.sourceInterleave(mixed, "doc_id", "source",
      seed = 13L, buckets = 64, smallBytes = 0L)
      .select($"doc_id", $"interleave_pos").as[(Long, Long)].collect().toMap
    wide shouldBe out.map(t => t._1 -> t._4).toMap
    // group-bound guard fails fast with an actionable message
    val e = intercept[IllegalArgumentException] {
      TrainOrder.sourceInterleave(mixed, "doc_id", "source",
        seed = 13L, buckets = 4, maxGroups = 2, smallBytes = 0L)
    }
    e.getMessage should include("maxGroups")
  }

  test("sourceInterleave: supplementary-plane source names index identically on both paths") {
    // "～" (U+FF5E) sorts AFTER "𐀀" (U+10000) in UTF-16 code units
    // (surrogates start at 0xD800) but BEFORE it in UTF-8 bytes (0xEF vs
    // 0xF0). Spark's string sort is binary UTF-8, so the driver-side index
    // of the two-phase path must use the same order — a UTF-16 String sort
    // would flip every interleave_pos between the two paths.
    val exotic = Seq(
      (1L, "～"), (2L, "～"),
      (3L, new String(Character.toChars(0x10000))),
      (4L, "ascii"))
      .toDF("doc_id", "source")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"interleave_pos").as[(Long, Long)].collect().toMap
    val small = m(TrainOrder.sourceInterleave(exotic, "doc_id", "source", seed = 3L))
    val big = m(TrainOrder.sourceInterleave(exotic, "doc_id", "source", seed = 3L,
      smallBytes = 0L))
    small shouldBe big
    // and the order is the UTF-8 one: ascii < U+FF5E < U+10000
    val bySrc = TrainOrder.sourceInterleave(exotic, "doc_id", "source", seed = 3L,
        smallBytes = 0L)
      .select($"source", $"interleave_pos").as[(String, Long)].collect()
      .sortBy(_._2).map(_._1)
    bySrc.head shouldBe "ascii"
    bySrc(1) shouldBe "～"
  }

  test("curriculumOrder: exact stage boundaries, seeded shuffle within each stage") {
    val staged = (1L to 60L).map(i => (i, i % 3)).toDF("doc_id", "bin")
    val out = TrainOrder.curriculumOrder(staged, "doc_id", "bin",
        seed = 7L, buckets = 8, smallBytes = 0L)
      .select($"doc_id", $"bin", $"curriculum_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positions are contiguous 0-based over the whole corpus
    out.map(_._3).sorted shouldBe (0L until 60L).toArray
    // every bin-0 position precedes every bin-1 position, etc.
    val maxByBin = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minByBin = out.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    maxByBin(0L) should be < minByBin(1L)
    maxByBin(1L) should be < minByBin(2L)
    // within a stage, the order IS the epoch-shuffle order of that slice
    val epoch = TrainOrder.epochShuffle(staged.filter($"bin" === 1), "doc_id",
        seed = 7L, smallBytes = 0L)
      .orderBy($"shuffle_pos").select($"doc_id").as[Long].collect()
    val stage1 = out.filter(_._2 == 1L).sortBy(_._3).map(_._1)
    stage1 shouldBe epoch
    // bucket count changes the plan, not the order
    val wide = TrainOrder.curriculumOrder(staged, "doc_id", "bin",
        seed = 7L, buckets = 64, smallBytes = 0L)
      .select($"doc_id", $"curriculum_pos").as[(Long, Long)].collect().toMap
    wide shouldBe out.map(t => t._1 -> t._3).toMap
  }

  test("size-adaptive small path matches the two-phase scan on every operator") {
    // the adaptive default routes these tiny frames to the single-window
    // plans; smallBytes = 0 pins the two-phase scan — both must agree
    // row-for-row (same contract as Sampling.stratified's switch)
    val toks = docs.withColumn("n_tokens", ($"doc_id" % 30 + 1).cast("long"))
    def m(df: org.apache.spark.sql.DataFrame, pos: String) =
      df.select($"doc_id", col(pos)).as[(Long, Long)].collect().toMap
    m(TrainOrder.epochShuffle(docs, "doc_id", seed = 7L), "shuffle_pos") shouldBe
      m(TrainOrder.epochShuffle(docs, "doc_id", seed = 7L, smallBytes = 0L), "shuffle_pos")
    m(TrainOrder.shardAssignments(docs, "doc_id", seed = 5L, numShards = 8), "shard") shouldBe
      m(TrainOrder.shardAssignments(docs, "doc_id", seed = 5L, numShards = 8,
        smallBytes = 0L), "shard")
    m(TrainOrder.tokenBudgetHead(toks, "doc_id", "n_tokens", seed = 3L,
        budget = 400L), "cum_tokens") shouldBe
      m(TrainOrder.tokenBudgetHead(toks, "doc_id", "n_tokens", seed = 3L,
        budget = 400L, smallBytes = 0L), "cum_tokens")
    m(TrainOrder.tokenBudgetPerSource(toks, "doc_id", "n_tokens", "source",
        seed = 5L, budget = 300L), "cum_tokens") shouldBe
      m(TrainOrder.tokenBudgetPerSource(toks, "doc_id", "n_tokens", "source",
        seed = 5L, budget = 300L, smallBytes = 0L), "cum_tokens")
    m(TrainOrder.sourceInterleave(docs, "doc_id", "source", seed = 13L),
        "interleave_pos") shouldBe
      m(TrainOrder.sourceInterleave(docs, "doc_id", "source", seed = 13L,
        smallBytes = 0L), "interleave_pos")
    val staged = (1L to 60L).map(i => (i, i % 3)).toDF("doc_id", "bin")
    m(TrainOrder.curriculumOrder(staged, "doc_id", "bin", seed = 7L),
        "curriculum_pos") shouldBe
      m(TrainOrder.curriculumOrder(staged, "doc_id", "bin", seed = 7L,
        smallBytes = 0L), "curriculum_pos")
    // the small path enforces the same null contract IN-PLAN (the
    // packSequences pattern): the named error surfaces at the action
    val bad = Seq((Some(1L), "a"), (None, "b")).toDF("doc_id", "source")
    val e = intercept[Exception] {
      TrainOrder.epochShuffle(bad, "doc_id", seed = 1L).count()
    }
    e.getMessage should include("null 'doc_id'")
  }

  test("AdaptiveGate is strict: 0-byte stats with smallBytes = 0 still pin two-phase") {
    // an empty local relation reports sizeInBytes = 0 — under the old
    // `<=` gate, smallBytes = 0 routed it to the small path and a
    // plan-pinning audit would silently audit the wrong shape
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "source")
    empty.queryExecution.optimizedPlan.stats.sizeInBytes shouldBe BigInt(0)
    val planned = TrainOrder.epochShuffle(empty, "doc_id", seed = 1L, smallBytes = 0L)
    // the two-phase plan carries the bucket column through its analyzed
    // tree; the single-window small plan never mentions it
    planned.queryExecution.analyzed.toString should include("__graft_b")
    planned.count() shouldBe 0L
  }

  test("curriculumOrder: fractional bins truncate consistently — positions stay a permutation") {
    // 2.2 and 2.7 must land in ONE stage (bin 2) with distinct positions;
    // ranking by the raw value while joining offsets by the truncation
    // would collide positions silently
    val frac = Seq((1L, 2.2), (2L, 2.7), (3L, 0.9), (4L, 1.5))
      .toDF("doc_id", "bin")
    val out = TrainOrder.curriculumOrder(frac, "doc_id", "bin",
        seed = 3L, buckets = 4, smallBytes = 0L)
      .select($"doc_id", $"curriculum_pos").as[(Long, Long)].collect()
    out.map(_._2).sorted shouldBe Array(0L, 1L, 2L, 3L)
    // truncated stages: 0.9 -> 0 first, 1.5 -> 1 second, {2.2, 2.7} last
    val pos = out.toMap
    pos(3L) shouldBe 0L
    pos(4L) shouldBe 1L
    Set(pos(1L), pos(2L)) shouldBe Set(2L, 3L)
  }
}
