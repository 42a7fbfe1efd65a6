package graft

import org.apache.spark.sql.functions._

/** Throwaway dev main: print Catalyst stats of the dedup posting subtree
  * at the given sf dirs — calibration input for the posting hub's
  * partition-count derivation. Not part of the library surface (test sourceSet; run via `sbt Test/runMain`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(identity)
    for (d <- args) {
      val docs = Tables.documents(spark, d)
      val arr = operators.Dedup.docShingleHashes(docs, 5)
      val posting = arr.select(col("doc_id"), size(col("hs")).as("__n"),
        explode(col("hs")).as("h31"))
      println(s"== $d")
      println(s"docs statBytes    = ${operators.AdaptiveGate.statBytes(docs)}")
      println(s"arr statBytes     = ${operators.AdaptiveGate.statBytes(arr)}")
      println(s"posting statBytes = ${operators.AdaptiveGate.statBytes(posting)}")
      val t0 = System.nanoTime()
      val n = posting.count()
      println(f"posting rows      = $n (count in ${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
