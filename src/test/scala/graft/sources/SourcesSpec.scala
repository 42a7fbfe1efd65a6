package graft.sources

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SourcesSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("parquet and csv readers") {
    Sources.parquet(spark, s"$sf0001/nation.parquet").count() shouldBe 25L
    val openings = "/root/reference/dev_files/Data/openings.csv"
    assume(new java.io.File(openings).exists())
    val book = Sources.csv(spark, openings)
    book.columns shouldBe Array("eco_family", "eco", "name", "pgn")
    book.count() should be > 3000L
  }

  test("schema'd JSON keeps sparse fields that inference would drop") {
    val sample = "/root/reference/dev_files/Data/2024-01/games.json"
    assume(new java.io.File(sample).exists())
    val games = Sources.json(spark, sample, graft.chess.Schemas.bronze)
    games.schema.fieldNames should contain("accuracies")
    games.count() shouldBe 514L
  }

  test("ORC roundtrip preserves rows and keeps predicate pushdown working") {
    val src = Sources.parquet(spark, s"$sf0001/customer.parquet")
    val dir = java.nio.file.Files.createTempDirectory("orc-rt").toString + "/customer.orc"
    Sources.writeOrc(src, dir)
    val back = Sources.orc(spark, dir)
    back.count() shouldBe src.count()
    import org.apache.spark.sql.functions.col
    val filtered = back.filter(col("c_mktsegment") === "BUILDING")
    val p = filtered.queryExecution.executedPlan.toString
    p should include("PushedFilters")
    p should include("c_mktsegment")
    filtered.count() shouldBe src.filter(col("c_mktsegment") === "BUILDING").count()
  }

  test("partitioned JDBC read splits into parallel range queries") {
    import spark.implicits._
    val url = "jdbc:derby:memory:srcdb;create=true"
    val props = new java.util.Properties()
    (1L to 100L).map(i => (i, s"row$i")).toDF("id", "v")
      .write.mode("overwrite").jdbc(url, "t_src", props)
    val df = Sources.jdbc(spark, url, "t_src", props,
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 100L
  }
}
