package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregation over embedding columns — the `Aggregator[IN, BUF, OUT]`
  * extension point (no row-at-a-time UDAF): element-wise running sums in
  * double with a count, merged associatively, so partial aggregation
  * (map-side combine) applies like any built-in agg.
  */
object VectorAggregators {

  case class VecAcc(var sum: Array[Double], var n: Long)

  /** Element-wise mean of array<float> vectors (centroid). Empty input →
    * null; ragged inputs fold at the shorter length.
    */
  object VectorMeanAgg extends Aggregator[Array[Float], VecAcc, Array[Float]] {
    override def zero: VecAcc = VecAcc(Array.emptyDoubleArray, 0L)

    override def reduce(acc: VecAcc, v: Array[Float]): VecAcc = {
      if (v == null) return acc
      if (acc.n == 0L) {
        acc.sum = new Array[Double](v.length)
      }
      val n = math.min(acc.sum.length, v.length)
      var i = 0
      while (i < n) { acc.sum(i) += v(i); i += 1 }
      acc.n += 1
      acc
    }

    override def merge(a: VecAcc, b: VecAcc): VecAcc = {
      if (a.n == 0L) return b
      if (b.n == 0L) return a
      val n = math.min(a.sum.length, b.sum.length)
      var i = 0
      while (i < n) { a.sum(i) += b.sum(i); i += 1 }
      a.n += b.n
      a
    }

    override def finish(acc: VecAcc): Array[Float] =
      if (acc.n == 0L) null
      else acc.sum.map(s => (s / acc.n).toFloat)

    override def bufferEncoder: Encoder[VecAcc] = Encoders.product[VecAcc]
    override def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }

  /** DataFrame-facing column function: `vec_mean(col)`. */
  lazy val vec_mean: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(VectorMeanAgg)

  def vecMean(c: Column): Column = vec_mean(c)

  case class VecAccL(var sum: Array[Long], var n: Long)

  /** Fixed-point element-wise mean: components are quantized to the 1e-6
    * grid with `floor(x * 1e6 + 0.5)` and summed as LONGS — exact and
    * order-independent, unlike a float/double running sum — then the mean
    * is two correctly-rounded IEEE ops (`(sum / n) / 1e6`) and one
    * float32 narrowing. Every step is deterministic AND engine-portable
    * (`CAST(CAST(floor-sum AS DOUBLE) / n / 1000000.0 AS FLOAT)` in the
    * DuckDB oracle reproduces it bit-for-bit), which is what upgrades the
    * k-means-refined IVF path from a recall bound to a hash oracle.
    * Quantization loss is 5e-7 per component — noise at ANN precision.
    */
  object VectorMeanFixedAgg extends Aggregator[Array[Float], VecAccL, Array[Float]] {
    override def zero: VecAccL = VecAccL(Array.emptyLongArray, 0L)

    override def reduce(acc: VecAccL, v: Array[Float]): VecAccL = {
      if (v == null) return acc
      if (acc.n == 0L) {
        acc.sum = new Array[Long](v.length)
      }
      val n = math.min(acc.sum.length, v.length)
      var i = 0
      while (i < n) {
        // floor(x + 0.5), NOT round-half-away: engines disagree on
        // negative halves under the latter
        acc.sum(i) += math.floor(v(i).toDouble * 1e6 + 0.5).toLong
        i += 1
      }
      acc.n += 1
      acc
    }

    override def merge(a: VecAccL, b: VecAccL): VecAccL = {
      if (a.n == 0L) return b
      if (b.n == 0L) return a
      val n = math.min(a.sum.length, b.sum.length)
      var i = 0
      while (i < n) { a.sum(i) += b.sum(i); i += 1 }
      a.n += b.n
      a
    }

    override def finish(acc: VecAccL): Array[Float] =
      if (acc.n == 0L) null
      else acc.sum.map(s => ((s.toDouble / acc.n) / 1e6).toFloat)

    override def bufferEncoder: Encoder[VecAccL] = Encoders.product[VecAccL]
    override def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }

  lazy val vec_mean_fixed: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(VectorMeanFixedAgg)

  def vecMeanFixed(c: Column): Column = vec_mean_fixed(c)
}
