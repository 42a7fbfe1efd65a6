package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Throwaway dev main: per-job wall-time profile plus the executed plan of
  * the named queries (after a warm pass). Not part of the library surface (test sourceSet; run via `sbt Test/runMain`).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    @volatile var jobStart = Map.empty[Int, (Long, String)]
    @volatile var stageInfo = List.empty[(Int, Int, Long, String)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart += js.jobId -> (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("").take(60))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.get(je.jobId).foreach { case (t0, desc) =>
          println(f"  job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e3}%9.0f us  $desc")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageInfo ::= ((si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L), si.name.take(50)))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      Bench.evaluate(fn(spark, sfDir)) // warm
      spark.catalog.clearCache()
      Thread.sleep(300)
      stageInfo = Nil // drop warm-pass stages: the table must profile ONLY the timed pass
      println(s"===== $q (timed pass) =====")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      Bench.evaluate(df)
      println(f"  TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
      Thread.sleep(300)
      println(s"--- stages (id, tasks, ms) ---")
      stageInfo.reverse.foreach { case (id, n, ms, name) =>
        println(f"  stage $id%4d  tasks=$n%3d  ${ms}%5d ms  $name")
      }
      stageInfo = Nil
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
