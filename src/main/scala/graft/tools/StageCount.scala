package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}

import graft.{Bench, GraftSession, SparkEntry}

/** Per-query JOB/STAGE census under the exact Bench session configs — the
  * measured half of the sf0.1 floor model (r12 VERDICT #3: "structurally
  * floor-bound" must be a checkable record, not an argument).
  *
  * Spark pays a fixed ~0.1–0.15 s of scheduling/submission per job/stage
  * at sf0.1 (memory: small-path playbook); a query whose wall time ≈
  * stages × that floor is paying structure, not work, and its DuckDB
  * ratio inverts as data scales past the floor. This harness counts the
  * ACTUALLY SUBMITTED jobs/stages/tasks of one steady evaluation per
  * query (warm pass first, AQE re-plans and reused-exchange skips
  * included — the real execution, not the static plan):
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StageCount [names…]"
  *
  * Emits one JSON line per query: {"query","jobs","stages","tasks","sec"}.
  * `tools/floor_model.py` joins this census against BENCH_ORACLE.json and
  * calibrates the per-stage floor from the sub-threshold queries
  * themselves.
  */
object StageCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    // the listener bus is async: poll until the counters go quiet so a
    // query's tail events can't leak into the next query's delta
    def settle(): (Int, Int, Long) = {
      var prev = (-1, -1, -1L)
      var cur = (jobs.get(), stages.get(), tasks.get())
      while (cur != prev) {
        Thread.sleep(150)
        prev = cur
        cur = (jobs.get(), stages.get(), tasks.get())
      }
      cur
    }
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq
        .filterNot(SparkEntry.fixedInputQueries).sorted
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try {
        Bench.evaluate(fn(spark, sfDir)) // warm: JIT, page cache, memos
        spark.catalog.clearCache()
        Bench.evaluate(fn(spark, sfDir)) // cache shared subtrees like a
        spark.catalog.clearCache()       // bench pass would, then drop
        val (j0, s0, t0) = settle()
        val w0 = System.nanoTime()
        Bench.evaluate(fn(spark, sfDir))
        val sec = (System.nanoTime() - w0) / 1e9
        val (j1, s1, t1) = settle()
        spark.catalog.clearCache()
        println(s"""{"query":"$name","jobs":${j1 - j0},"stages":${s1 - s0},""" +
          s""""tasks":${t1 - t0},"sec":${"%.3f".formatLocal(java.util.Locale.ROOT, sec)}}""")
      } catch { case e: Throwable =>
        println(s"""{"query":"$name","err":"${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.nextOption.getOrElse("").take(120).replace("\"", "'")}"}""")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
