package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiling main. Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()

    def t(name: String)(f: => Long): Unit = {
      // warm
      f; spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); dt
      }
      println(f"STAGE $name%-28s ${ts.min}%.3f s")
    }

    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sfDir)
    val norm = TextAnalysis.normalizedText(substring(col("text"), 1, 128))
    def tt = docs.select(col("doc_id"),
      substring(norm, 1, 32).as("prefix"), substring(norm, 1, 8).as("bucket"))
    t("normalize_scan") { tt.count() }
    t("pairs_nojoin_dp") {
      tt.as("a").join(tt.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id")).count()
    }
    t("full") { SparkEntry.queries("text_edit_distance")(spark, sfDir).count() }
    spark.stop()
  }
}
