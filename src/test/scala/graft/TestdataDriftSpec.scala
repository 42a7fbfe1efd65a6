package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Early-warning guard against testdata regeneration drift: the synthetic
  * tables are regenerated out-of-band between build rounds, and a silent
  * physical-type change once broke 17 queries at analysis time with errors
  * that pointed nowhere near the cause (events.ts int64-nanos →
  * timestamp[us]). This spec pins the COLUMN CONTRACT every reader and
  * oracle depends on — names, and the semantic type after `Tables`
  * normalization — and fails with the observed schema in the message, so a
  * future refresh is diagnosed in one read instead of re-derived from a
  * pile of DATATYPE_MISMATCH stack traces.
  */
class TestdataDriftSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def cols(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private def expectCols(name: String, df: org.apache.spark.sql.DataFrame,
                         expected: (String, DataType)*): Unit = {
    val got = cols(df)
    withClue(s"$name observed schema ${df.schema.simpleString}:") {
      expected.foreach { case (c, t) =>
        got.get(c) shouldBe Some(t)
      }
    }
  }

  test("events contract: ts normalizes to TimestampType; value/id columns stable") {
    expectCols("events", Tables.events(spark, sf0001),
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "ts" -> TimestampType,
      "value" -> DoubleType)
  }

  test("documents contract: id/text/lang/source stable; text pure ASCII") {
    val docs = Tables.documents(spark, sf0001)
    expectCols("documents", docs,
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType)
    // the mm_resize/mm_frames oracles slice text by CHARACTER in DuckDB
    // and by BYTE in the kernels — only equivalent while the corpus stays
    // ASCII. A refresh that introduces multi-byte text must fail HERE.
    import org.apache.spark.sql.functions.{col, octet_length}
    docs.filter(octet_length(col("text")) =!=
        org.apache.spark.sql.functions.length(col("text")))
      .count() shouldBe 0L
  }

  test("embeddings contract: vec_id + float-array embedding") {
    val emb = Tables.embeddings(spark, sf0001)
    expectCols("embeddings", emb, "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true))
  }

  test("TPC-H tables carry the joined/aggregated key columns") {
    expectCols("lineitem", Tables.lineitem(spark, sf0001),
      "l_orderkey" -> LongType, "l_suppkey" -> LongType,
      "l_quantity" -> DoubleType)
    expectCols("orders", Tables.orders(spark, sf0001),
      "o_orderkey" -> LongType, "o_custkey" -> LongType)
    // nation keys ship as int32 (joins widen them implicitly); a refresh
    // that flips them to int64 would still join, but the pinned types
    // make any change VISIBLE here first
    expectCols("customer", Tables.customer(spark, sf0001),
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType)
    expectCols("supplier", Tables.supplier(spark, sf0001),
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    expectCols("nation", Tables.nation(spark, sf0001),
      "n_nationkey" -> IntegerType, "n_name" -> StringType)
  }
}
