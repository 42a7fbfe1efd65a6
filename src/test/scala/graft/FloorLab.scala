package graft

import org.apache.spark.sql.functions._

/** r15 lab: decompose the ~0.095 s/stage sf0.1 floor. Times synthetic
  * 0/1/2-shuffle queries over a tiny parquet scan (per-iteration wall,
  * min-of-N), with AQE on vs off (runtime-settable), so the marginal cost
  * of one more stage — and AQE's share of it — is measured, not inferred.
  * Usage: sbt "Test/runMain graft.FloorLab [iters]"
  */
object FloorLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = args.headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    def q0 = Tables.nation(spark, sfDir).select(col("n_nationkey"))
    def q1 = q0.repartition(col("n_nationkey"))
      .groupBy("n_nationkey").agg(count(lit(1)))
    def q2 = q1.select(col("n_nationkey"), col("count(1)").as("c"))
      .repartition(col("c")).groupBy("c").agg(count(lit(1)))
    def q3 = q2.select(col("c"), col("count(1)").as("d"))
      .repartition(col("d")).groupBy("d").agg(count(lit(1)))
    val variants = Seq("s0" -> (() => q0), "s1" -> (() => q1),
      "s2" -> (() => q2), "s3" -> (() => q3))
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      variants.foreach { case (_, f) => Bench.evaluate(f()) } // warm
      val best = scala.collection.mutable.Map.empty[String, Double]
      val med = scala.collection.mutable.Map.empty[String, List[Double]]
      for (_ <- 1 to iters; (n, f) <- variants) {
        val t0 = System.nanoTime()
        Bench.evaluate(f())
        val s = (System.nanoTime() - t0) / 1e9
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
        med(n) = s :: med.getOrElse(n, Nil)
      }
      variants.foreach { case (n, _) =>
        val ms = med(n).sorted.apply(med(n).size / 2)
        println(f"FLOOR aqe=$aqe $n min=${best(n)}%.3f med=$ms%.3f")
      }
    }
    spark.stop()
  }
}
