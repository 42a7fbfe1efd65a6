package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the calibrated gate constants to GATES.md: a plan edit that
  * moves a threshold must update the invariant doc (and its calibration
  * story) in the same change, or this spec fails.
  */
class GateInvariantsSpec extends AnyFunSuite with Matchers {

  private lazy val doc = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("GATES.md")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("gate constants match the GATES.md invariant record") {
    SparkEntry.rawAggBytes shouldBe (4L << 20)
    doc should include("`rawAggBytes` | **4 MB**")

    SparkEntry.shuffleHashBytes shouldBe (256L << 20)
    doc should include("`shuffleHashBytes` | **256 MB**")

    SparkEntry.j4PackedBytes shouldBe (8L << 20)
    doc should include("`j4PackedBytes` | **8 MB**")

    operators.AdaptiveGate.MaxDerivedPartitions shouldBe 2048L
    doc should include("partition cap | **2048**")

    operators.AdaptiveGate.PostingStatsPerPartition shouldBe (256L << 10)
    doc should include("**256 KB stats/partition**")

    operators.Dedup.DefaultMaxPostings shouldBe 1000000L
    doc should include("`Dedup.DefaultMaxPostings` | **1,000,000**")

    operators.Dedup.DefaultMaxCellRows shouldBe 10000L
    // spanCut small path: one collect_list stats aggregate owns the dup
    // set under the gate; the streaming hinted-join shape above it
    operators.Dedup.SpanCutSmallBytes shouldBe (64L << 20)
    doc should include("`semanticDedup.maxCellRows` | **10,000**")
  }

  test("hashHinted's default gate is the documented shuffleHashBytes") {
    // the AdaptiveGate default and the SparkEntry constant must not
    // drift apart: both are the non-spillable-build ceiling
    // (hashHinted's signature default is 256 MB; see AdaptiveGate)
    SparkEntry.shuffleHashBytes shouldBe (256L << 20)
  }
}
