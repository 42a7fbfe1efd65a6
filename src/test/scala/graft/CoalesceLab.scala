package graft

/** r15 lab: how much of the sf0.1 "floor" is AQE over-coalescing?
  *
  * Bench sets `advisoryPartitionSizeInBytes=1m` + `parallelismFirst=false`
  * so tiny shuffles collapse to 1-2 tasks (fewer per-task submissions).
  * Scratch (r15) shows the flip side: CPU-dense post-shuffle stages
  * (distinct hashes, windows, interpreted aggs) then run 1-3 tasks on a
  * 32-core box — serialized compute, not floor. This lab A/Bs the
  * coalescing configs SAME-SESSION (they are runtime-settable SQL confs),
  * interleaved across passes so host drift hits every setting equally,
  * min-of-N per (query, setting).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.CoalesceLab
  *          [passes] [setting ...]"
  * where a setting is "advisory/minPartitionSize/parallelismFirst",
  * e.g. "1m/256k/false" (bench default) or "256k/64k/false".
  */
object CoalesceLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(2)
    val settings =
      (if (args.exists(_.contains("/"))) args.filter(_.contains("/")).toSeq
       else Seq("1m/256k/false", "256k/64k/false", "96k/32k/false")).toIndexedSeq
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    def applySetting(s: String): Unit = {
      val Array(adv, minp, pf) = s.split("/")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", minp)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
    }
    val fixed = SparkEntry.fixedInputQueries
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benched = SparkEntry.queries.filterNot(q => fixed(q._1))
      .filter { case (n, _) => names.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)
    // warm (JIT, page cache, codegen) under the default setting
    benched.foreach { case (_, fn) =>
      try Bench.evaluate(fn(spark, sfDir)) catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (p <- 1 to passes; s <- (if (p % 2 == 1) settings else settings.reverse)) {
      applySetting(s)
      benched.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { Bench.evaluate(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        val sec = if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
        val k = (name, s)
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), sec)
      }
      spark.catalog.clearCache()
      println(s"[pass $p done: $s]")
    }
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println("query," + settings.mkString(","))
    benched.foreach { case (name, _) =>
      println(name + "," + settings.map(s => f(best((name, s)))).mkString(","))
    }
    println("TOTAL," + settings.map(s =>
      f(benched.map(q => best((q._1, s))).filterNot(_.isNaN).sum)).mkString(","))
    spark.stop()
  }
}
