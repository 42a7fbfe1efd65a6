package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiling main. Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      // warm
      f; spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); dt
      }
      println(f"STAGE $name%-28s ${ts.min}%.3f s")
    }

    import graft.operators.Dedup
    val docs = Tables.documents(spark, sfDir)
    t("shingles_count") { Dedup.shingleTable(docs, 5).count() }
    t("signatures") { Dedup.minhashSignaturesFromShingles(
      Dedup.shingleTable(docs, 5).repartition(col("doc_id")), 16).count() }
    t("candidates") {
      val sh = Dedup.shingleTable(docs, 5).repartition(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c = Dedup.lshCandidates(sh, 16, 4)
      val n = c.count()
      c.unpersist(false); sh.unpersist(false); n
    }
    t("full") { Dedup.minhashLshDedup(docs, 5, 16, 4, 0.8).count() }
    spark.stop()
  }
}
