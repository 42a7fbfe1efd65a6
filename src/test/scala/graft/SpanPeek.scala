package graft

import org.apache.spark.sql.functions._

/** r15: executed-plan census of spanCut's LARGE path (smallBytes = 0) —
  * does the occurrence exchange actually get reused by the stats and
  * probe sides, or does the md5 kernel run twice like pairStats did?
  */
object SpanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val df = operators.Dedup.spanCut(docs, l = 5, smallBytes = 0L)
    // collect, not the noop write: the write action plans a NEW
    // QueryExecution, so df.queryExecution would print the unexecuted
    // (initial) adaptive plan with no stage-reuse information
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("REUSED=" + "ReusedExchange".r.findAllIn(p).size)
    println("SHINGLE_EVALS=" + "shingle_hash31_all_array".r.findAllIn(p).size)
    println(p.take(14000))
    spark.stop()
  }
}
