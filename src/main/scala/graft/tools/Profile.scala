package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Dev harness: stage-by-stage timing of the heavy dedup pipelines.
  * Usage: sbt "runMain graft.tools.Profile [sfDir]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // steady-state timing of cheap queries (3 runs each)
    for (q <- Seq("dedup_normalized", "a1_groupby_agg", "j4_roleplay_join", "dedup_ngram_jaccard");
         i <- 1 to 3)
      time(s"$q run$i")(graft.SparkEntry.queries(q)(spark, sfDir).count())

    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val arr = Dedup.docShingleHashes(docs.repartition(col("doc_id")), 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docShingleHashes materialize")(println(s"  rows=${arr.count()}"))
    val sigs = Dedup.minhashSignatures(arr, 16)
    time("minhash signatures")(println(s"  rows=${sigs.count()}"))
    val bands = Dedup.lshBands(Dedup.minhashSignatures(arr, 16), 16, 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("bands materialize")(println(s"  rows=${bands.count()}"))
    val joined = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("band self-join")(println(s"  rows=${joined.count()}"))
    val cand = Dedup.lshCandidates(docs, 5, 16, 4)
    time("lsh candidates")(println(s"  rows=${cand.count()}"))
    val full = Dedup.minhashLshDedup(docs, k = 5, numPerm = 16, bands = 4, threshold = 0.8)
    time("full pipeline")(println(s"  rows=${full.count()}"))
    spark.stop()
  }
}
