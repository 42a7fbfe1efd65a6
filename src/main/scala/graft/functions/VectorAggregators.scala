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
}
