package graft

import org.apache.spark.sql.{Column, SparkSession}
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

    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val cents = emb.orderBy("vec_id").limit(32)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def cellOf(e: Column): Column =
      -array_max(array(cents.map { case (cid, ce) =>
        struct(round(Similarity.cosine(e, typedLit(ce)), 6).as("ccos"),
          lit(-cid).as("negcid"))
      }.toIndexedSeq: _*)).getField("negcid")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
