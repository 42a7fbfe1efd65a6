package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Weighted Greenwald–Khanna quantile sketch: `percentile_approx` for
  * value–count inputs.
  *
  * Why it exists: the engine's high-cardinality aggregates reduce raw rows
  * through a codegen'd value-count pre-aggregate before any interpreted
  * per-row kernel sees them (the a6 lesson, GATES.md `rawAggBytes`; at
  * x1000 lineitem's 600M prices collapse to ~133k `(value, cnt)` rows).
  * Spark's own `ApproximatePercentile` cannot ride that reduction — its
  * sketch inserts one sample per RAW row — so the approximate-quantile
  * pass was the one aggregate still paying an interpreted update per raw
  * row. This aggregate inserts `(value, weight)` pairs instead: the same
  * GK summary, the same rank-error contract (`1/accuracy`), built from
  * `sum(weights)` logical rows at `O(distinct values)` cost.
  *
  * Mechanics: pending pairs buffer in a head array; a flush sorts the
  * batch, collapses equal values, and materializes it as an EXACT GK
  * summary — `Stats(value, g = weight, delta = 0)` is a valid summary of
  * `weight` copies of `value` with zero rank uncertainty — then merges it
  * into the running summary through `QuantileSummaries.merge`, whose
  * compression re-establishes the shared `2·eps·n` error budget. A heavy
  * value (weight > 2·eps·n) survives compression as its own sample, so
  * skewed weights lose no precision. Everything rides Spark's public
  * `QuantileSummaries` (the `percentile_approx` engine) — no forked math.
  *
  * Semantics match `percentile_approx(expr, p, accuracy)` evaluated over
  * the expanded multiset (each value repeated `weight` times): NULL values
  * and NULL/zero weights are skipped, negative weights raise (whether or
  * not the value is NULL), an empty aggregate returns NULL. The weight
  * must be an INTEGRAL type — a fractional weight has no expanded-multiset
  * meaning, so the builders reject it at analysis time instead of
  * silently truncating (r14 ADVICE).
  *
  * Rank-error contract: each single summary holds the GK `1/accuracy`
  * bound, but partial-aggregate MERGES of eps-summaries can accumulate up
  * to `2/accuracy` of `sum(weights)` — the same practical bound Spark's
  * own `percentile_approx` carries after shuffle merges. Callers must
  * size their margins off the POST-MERGE `2/accuracy` figure (a6's 1%
  * check and `SketchSpec`'s rank-error property both do).
  */
object WeightedQuantile {

  /** Aggregation buffer: a head of pending pairs + the running summary. */
  final class Digest(val relativeError: Double) extends Serializable {
    private var summary = emptySummary(relativeError)
    private var head = new ArrayBuffer[(Double, Long)](64)
    // same batch size as QuantileSummaries' own insert head, so the
    // amortized sort/merge profile matches the unweighted sketch
    private val headCap = QuantileSummaries.defaultHeadSize

    def add(value: Double, weight: Long): Unit = {
      if (weight < 0) {
        throw new IllegalArgumentException(
          s"graft_wpercentile_approx: negative weight $weight for value $value")
      }
      if (weight > 0) {
        head += ((value, weight))
        if (head.length >= headCap) flush()
      }
    }

    private def flush(): Unit = if (head.nonEmpty) {
      val sorted = head.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      // GK's query error is governed by max(g + delta): a sample heavier
      // than 2*eps*n breaks the bound for the WHOLE summary, so weights
      // above eps*W split into exact same-value chunks (they re-merge
      // under compression as the count grows). Tiny weighted inputs
      // degrade to unit samples — exactly percentile_approx's inserts.
      val maxChunk = math.max(1L,
        (relativeError * (summary.count + total)).toLong)
      val stats = new ArrayBuffer[Stats](sorted.length)
      var i = 0
      while (i < sorted.length) {
        val v = sorted(i)._1
        var w = sorted(i)._2
        var j = i + 1
        while (j < sorted.length && sorted(j)._1 == v) { w += sorted(j)._2; j += 1 }
        while (w > maxChunk) { stats += Stats(v, maxChunk, 0L); w -= maxChunk }
        if (w > 0) stats += Stats(v, w, 0L)
        i = j
      }
      val batch = new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, relativeError,
        stats.toArray, total, false)
      summary = mergeSummaries(summary, batch.compress())
      head.clear()
    }

    def mergeWith(other: Digest): Digest = {
      flush(); other.flush()
      summary = mergeSummaries(summary, other.summary)
      this
    }

    def query(percentage: Double): Option[Double] = {
      flush()
      summary.query(percentage)
    }

    private[WeightedQuantile] def compressedSummary(): QuantileSummaries = {
      flush()
      summary
    }

    private[WeightedQuantile] def setSummary(s: QuantileSummaries): Unit =
      summary = s
  }

  private def emptySummary(relativeError: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError, Array.empty[Stats], 0L, true)

  /** merge + defensive compress: `merge` concatenates the sampled arrays,
    * so without a compress the summary would grow by one batch per flush.
    */
  private def mergeSummaries(a: QuantileSummaries,
                             b: QuantileSummaries): QuantileSummaries = {
    val m = a.merge(b)
    if (m.sampled.length > m.compressThreshold) m.compress() else m
  }

  def serialize(d: Digest): Array[Byte] = {
    val s = d.compressedSummary()
    val n = s.sampled.length
    val buf = ByteBuffer.allocate(8 + 8 + 4 + n * 24)
    buf.putDouble(d.relativeError)
    buf.putLong(s.count)
    buf.putInt(n)
    s.sampled.foreach { st =>
      buf.putDouble(st.value); buf.putLong(st.g); buf.putLong(st.delta)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Digest = {
    val buf = ByteBuffer.wrap(bytes)
    val relativeError = buf.getDouble
    val count = buf.getLong
    val n = buf.getInt
    val sampled = Array.tabulate(n) { _ =>
      Stats(buf.getDouble, buf.getLong, buf.getLong)
    }
    val d = new Digest(relativeError)
    d.setSummary(new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError, sampled, count, true))
    d
  }
}

/** `graft_wpercentile_approx(value, weight, percentage, accuracy)` — see
  * [[WeightedQuantile]]. `percentage` and `accuracy` must be foldable.
  */
case class WeightedPercentileApprox(
    child: Expression,
    weight: Expression,
    percentageExpression: Expression,
    accuracyExpression: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WeightedQuantile.Digest] {

  private lazy val percentage: Double = {
    require(percentageExpression.foldable,
      "graft_wpercentile_approx: percentage must be a literal")
    val p = percentageExpression.eval() match {
      case d: Double => d
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case f: Float => f.toDouble
      case other => throw new IllegalArgumentException(
        s"graft_wpercentile_approx: non-numeric percentage $other")
    }
    require(p >= 0.0 && p <= 1.0,
      s"graft_wpercentile_approx: percentage $p outside [0, 1]")
    p
  }

  private lazy val accuracy: Int = {
    require(accuracyExpression.foldable,
      "graft_wpercentile_approx: accuracy must be a literal")
    val a = accuracyExpression.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_wpercentile_approx: non-integral accuracy $other")
    }
    require(a > 0, s"graft_wpercentile_approx: accuracy $a must be positive")
    a
  }

  // strict input types; the Column/SQL builders cast only the VALUE (a
  // lossless double widening). The weight is taken as-is and must be an
  // integral type: a blanket cast(LongType) would silently truncate a
  // fractional weight (0.9 → 0, row dropped) — rejecting the TYPE here
  // surfaces the bug at analysis time on both surfaces (r14 ADVICE).
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"graft_wpercentile_approx: value must be DOUBLE, got " +
          s"${child.dataType.simpleString} — cast explicitly")
    } else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(weight.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"graft_wpercentile_approx: weight must be an integral type " +
          s"(TINYINT/SMALLINT/INT/BIGINT), got " +
          s"${weight.dataType.simpleString} — a fractional weight has no " +
          "expanded-multiset meaning; cast explicitly if truncation is " +
          "really intended")
    } else if (!percentageExpression.foldable || !accuracyExpression.foldable) {
      TypeCheckResult.TypeCheckFailure(
        "graft_wpercentile_approx: percentage and accuracy must be literals")
    } else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val weightToLong: Any => Long = weight.dataType match {
    case LongType => w => w.asInstanceOf[Long]
    case IntegerType => w => w.asInstanceOf[Int].toLong
    case ShortType => w => w.asInstanceOf[Short].toLong
    case ByteType => w => w.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(
      s"graft_wpercentile_approx: unexpected weight type $other past " +
        "checkInputDataTypes")
  }

  override def createAggregationBuffer(): WeightedQuantile.Digest =
    new WeightedQuantile.Digest(1.0d / accuracy)

  override def update(buffer: WeightedQuantile.Digest,
                      input: InternalRow): WeightedQuantile.Digest = {
    // weight validates BEFORE the null-value short-circuit: the
    // "negative weights raise" contract must hold for (NULL, -5) rows
    // too, not only when the value survives (r14 ADVICE)
    val w = weight.eval(input)
    if (w != null) {
      val wl = weightToLong(w)
      if (wl < 0) throw new IllegalArgumentException(
        s"graft_wpercentile_approx: negative weight $wl")
      val v = child.eval(input)
      if (v != null && wl > 0) buffer.add(v.asInstanceOf[Double], wl)
    }
    buffer
  }

  override def merge(buffer: WeightedQuantile.Digest,
                     input: WeightedQuantile.Digest): WeightedQuantile.Digest =
    buffer.mergeWith(input)

  override def eval(buffer: WeightedQuantile.Digest): Any =
    buffer.query(percentage).map(Double.box).orNull

  override def serialize(buffer: WeightedQuantile.Digest): Array[Byte] =
    WeightedQuantile.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): WeightedQuantile.Digest =
    WeightedQuantile.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): WeightedPercentileApprox =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): WeightedPercentileApprox =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_wpercentile_approx"

  override def children: Seq[Expression] =
    Seq(child, weight, percentageExpression, accuracyExpression)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedPercentileApprox =
    copy(child = newChildren(0), weight = newChildren(1),
      percentageExpression = newChildren(2), accuracyExpression = newChildren(3))
}

object SketchFunctions {
  import org.apache.spark.sql.GraftShims.column
  import org.apache.spark.sql.GraftShims.expression

  /** `percentile_approx` over value–count rows: the approximate quantile of
    * the multiset where `e` occurs `w` times. Same rank-error contract as
    * `percentile_approx(e, p, accuracy)` on the expanded rows (practical
    * post-merge bound `2/accuracy`, see [[WeightedQuantile]]). `w` must be
    * an integral column — no silent truncation of fractional weights.
    */
  def wpercentile_approx(e: Column, w: Column, p: Double, accuracy: Int): Column =
    column(WeightedPercentileApprox(
      expression(e.cast(DoubleType)), expression(w),
      org.apache.spark.sql.catalyst.expressions.Literal(p),
      org.apache.spark.sql.catalyst.expressions.Literal(accuracy))
      .toAggregateExpression())
}
