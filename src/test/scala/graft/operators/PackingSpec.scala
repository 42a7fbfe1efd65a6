package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PackingSpec extends AnyFunSuite with Matchers with SparkFixture {
  import spark.implicits._

  test("packSequences equals the single-window global cumsum definition") {
    // deliberately awkward id space: sparse, unsorted insertion order
    val rows = Seq(
      (100L, 10L), (7L, 3L), (9999L, 5L), (501L, 7L), (502L, 1L),
      (4L, 2L), (4000L, 11L), (250L, 6L))
    val df = rows.toDF("doc_id", "n_tokens")
    // smallBytes = -1 forces the two-phase scan — the point of the test is
    // that it matches the window definition (the small path IS the window)
    val got = Packing.packSequences(df, "doc_id", "n_tokens", capacity = 8L,
        buckets = 4, smallBytes = -1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))

    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val exp = df.withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("start_offset", $"cum" - $"n_tokens")
      .select($"doc_id", $"start_offset",
        expr("start_offset DIV 8").as("seq_id"),
        pmod($"start_offset", lit(8L)).as("seq_offset"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got shouldBe exp
  }

  test("packMaterialize: exact-capacity sequences, straddling docs split across cuts") {
    // ids streams: doc 1 = [1,2,3], doc 2 = [4,5,6,7], doc 3 = [8], doc 4 = [9,10]
    // global stream 1..10 cut at capacity 4: [1,2,3,4] [5,6,7,8] [9,10]
    // doc 2 straddles the first cut (parts [4] and [5,6,7])
    val docs = Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(4L, 5L, 6L, 7L)),
      (3L, Seq(8L)), (4L, Seq(9L, 10L)))
      .toDF("doc_id", "ids")
    val got = Packing.packMaterialize(docs, "doc_id", "ids", capacity = 4L,
        buckets = 2)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
    got shouldBe Array(
      (0L, Seq(1L, 2L, 3L, 4L), 2L, 4L),
      (1L, Seq(5L, 6L, 7L, 8L), 2L, 4L),
      (2L, Seq(9L, 10L), 1L, 2L))
    // empty-id docs contribute nothing but do not break the stream
    val withEmpty = docs.union(Seq((5L, Seq.empty[Long])).toDF("doc_id", "ids"))
    Packing.packMaterialize(withEmpty, "doc_id", "ids", capacity = 4L, buckets = 2)
      .agg(sum(org.apache.spark.sql.functions.size($"ids")).cast("long"))
      .as[Long].head() shouldBe 10L
    // tokenCol fast path: identical output off the precomputed counts...
    val counted = docs.withColumn("n",
      org.apache.spark.sql.functions.size($"ids").cast("long"))
    Packing.packMaterialize(counted, "doc_id", "ids", capacity = 4L,
        buckets = 2, tokenCol = Some("n"))
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe got.toSeq
    // ...and a count that lies about the sizes fails fast, not silently
    val lying = docs.withColumn("n",
      org.apache.spark.sql.functions.size($"ids").cast("long") + 1L)
    an[Exception] should be thrownBy
      Packing.packMaterialize(lying, "doc_id", "ids", capacity = 4L,
          buckets = 2, tokenCol = Some("n")).collect()
  }

  test("packMaterialize round-trip: concatenated sequences reconstruct the id-order stream") {
    // irregular lengths (including empty and exactly-capacity docs), sparse
    // unsorted ids — flattening the sequences in seq_id order must equal
    // the doc-id-order concatenation of all ids, with every sequence except
    // the last holding exactly `capacity`
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(60) { i =>
      val id = i * 37L % 1000L // sparse, non-contiguous
      (id, Seq.fill(rng.nextInt(12))(rng.nextLong()))
    }
    val docs = rows.toDF("doc_id", "ids")
    val out = Packing.packMaterialize(docs, "doc_id", "ids", capacity = 7L,
        buckets = 8)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val stream = rows.sortBy(_._1).flatMap(_._2)
    out.flatMap(_._2).toSeq shouldBe stream
    out.map(_._1).toSeq shouldBe out.indices.map(_.toLong) // contiguous seq ids
    out.dropRight(1).foreach(_._2.length shouldBe 7)
    out.last._2.length should be <= 7
  }

  test("packSequences: offsets are a permutation-insensitive function of the data") {
    val a = (1L to 200L).map(i => (i, (i % 13) + 1))
    val df1 = a.toDF("doc_id", "n_tokens").repartition(7)
    val df2 = scala.util.Random.shuffle(a).toDF("doc_id", "n_tokens").repartition(3)
    val r1 = Packing.packSequences(df1, "doc_id", "n_tokens", 32L,
        buckets = 16, smallBytes = -1L)
      .orderBy("doc_id").collect().toSeq
    val r2 = Packing.packSequences(df2, "doc_id", "n_tokens", 32L,
        buckets = 16, smallBytes = -1L)
      .orderBy("doc_id").collect().toSeq
    r1 shouldBe r2
    // and the size-adaptive small path computes the identical assignment
    val viaSmall = Packing.packSequences(df1, "doc_id", "n_tokens", 32L)
      .orderBy("doc_id").collect().toSeq
    viaSmall shouldBe r1
    // total tokens of each fully-packed sequence is exactly the capacity:
    // consecutive start offsets tile [0, total) with no gaps
    val offs = r1.map(_.getLong(2))
    val toks = r1.map(_.getLong(1))
    offs.zip(toks).sliding(2).foreach {
      case Seq((o1, t1), (o2, _)) => o2 shouldBe (o1 + t1)
      case _ =>
    }
    offs.head shouldBe 0L
  }

  test("packSequences null contract fails on BOTH paths with a named error") {
    val withNull = Seq((Some(1L), Some(4L)), (Some(2L), None))
      .toDF("doc_id", "n_tokens")
    // r13: the tokenCol contract is in-plan (raise_error) on both paths —
    // it surfaces at the action with the operator-named message (the
    // two-phase path's probe now scans the id column only, so a null
    // TOKEN can no longer be detected eagerly there). A null ID still
    // fails eagerly on the two-phase path (counted on the range probe).
    for (smallBytes <- Seq(-1L, Long.MaxValue)) {
      val e = intercept[Exception] {
        Packing.packSequences(withNull, "doc_id", "n_tokens", 8L,
          smallBytes = smallBytes).collect()
      }
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      chain should include("packSequences")
    }
    val nullId = Seq((Some(1L), 4L), (None, 2L)).toDF("doc_id", "n_tokens")
    val e1 = intercept[IllegalArgumentException] {
      Packing.packSequences(nullId, "doc_id", "n_tokens", 8L, smallBytes = -1L)
    }
    e1.getMessage should include("doc_id")
  }

  test("packSequences on empty input returns an empty frame with the contract schema") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    for (sb <- Seq(256L << 20, -1L)) { // both the small and two-phase paths
      val out = Packing.packSequences(empty, "doc_id", "n_tokens", 16L,
        smallBytes = sb)
      out.columns.toSeq shouldBe Seq("doc_id", "n_tokens", "start_offset", "seq_id", "seq_offset")
      out.count() shouldBe 0L
    }
  }
}
