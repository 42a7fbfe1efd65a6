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

    println(SparkEntry.queries("sample_stratified")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
