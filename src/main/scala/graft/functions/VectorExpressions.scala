package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * A composed `zip_with` + `aggregate` dot product allocates an intermediate
  * array per pair and is interpreted per element; at 100 TB the ANN
  * brute-force stage evaluates billions of 64-dim dot products, so these are
  * tight loops over the raw `ArrayData` with whole-stage codegen
  * (`doGenCode`), no allocation, accumulating in double.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments")
    }
  }
}

/** dot(a, b) over array<float>, accumulated in double (index order). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of an array<float>, in double. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      s"graft.functions.VectorOps.norm($a)"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cosine(a, b) = dot / (|a| * |b|); 0.0 when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared scalar kernels callable from generated code. */
object VectorOps {
  def norm(x: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val d = math.sqrt(nx) * math.sqrt(ny)
    if (d == 0.0) 0.0 else dot / d
  }
}

/** Nearest-centroid assignment against a FIXED centroid set carried inside
  * the expression (not as literal subtrees): cell = cid of the centroid
  * with the highest `round(cosine, 6)`, ties to the smallest cid — exactly
  * the `array_max(array(struct(round(cos,6), -cid)...))` formulation it
  * replaces, whose O(nlist × dim) literal tree slowed analysis and risked
  * codegen fallback as nlist grows (the expression holds the matrix as one
  * reference object, so plan size is O(1) in nlist).
  */
case class IvfArgmaxCell(child: Expression, cids: IndexedSeq[Long],
                         cents: IndexedSeq[IndexedSeq[Float]]) extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length,
    "one cid per centroid, at least one")
  override def prettyName: String = "ivf_argmax_cell"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument")
    }

  @transient private lazy val centArrays: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cidArray: Array[Long] = cids.toArray

  def argmax(a: ArrayData): Long = {
    val dim = a.numElements()
    val emb = new Array[Float](dim)
    var i = 0
    while (i < dim) { emb(i) = a.getFloat(i); i += 1 }
    var best = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var c = 0
    while (c < centArrays.length) {
      val ce = centArrays(c)
      val n = math.min(dim, ce.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      i = 0
      while (i < n) {
        val x = emb(i).toDouble; val y = ce(i).toDouble
        dot += x * y; nx += x * x; ny += y * y
        i += 1
      }
      val d = math.sqrt(nx) * math.sqrt(ny)
      val raw = if (d == 0.0) 0.0 else dot / d // same zero guard as VectorOps.cosine
      // identical rounding to Spark's round(col, 6) and the DuckDB oracle
      val cos = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (cos > best || (cos == best && cidArray(c) < bestCid)) {
        best = cos
        bestCid = cidArray(c)
      }
      c += 1
    }
    bestCid
  }

  override def nullSafeEval(a: Any): Any = argmax(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfArgmax", this, classOf[IvfArgmaxCell].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.argmax($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftShims.{column, expression}
  def vec_dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def vec_norm(a: Column): Column = column(VectorNorm(expression(a)))
  def vec_cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def ivf_argmax_cell(emb: Column, cids: Seq[Long], cents: Seq[Seq[Float]]): Column =
    column(IvfArgmaxCell(expression(emb), cids.toIndexedSeq,
      cents.map(_.toIndexedSeq).toIndexedSeq))
}
