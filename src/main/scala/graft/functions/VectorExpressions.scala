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

  /** Kernel of [[SemanticKeepArray]]: given one cell's
    * `array<struct<vec_id, embedding>>`, mark each vector kept unless SOME
    * vector with a strictly smaller vec_id in the same cell scores
    * `round(cosine, 6) >= threshold` against it — the exact semantics of
    * the join spelling `removed = b WHERE EXISTS a (a.vec_id < b.vec_id
    * AND round(cos,6) >= t)` (a's own removal never exempts it, matching
    * the SQL). Scoring goes through [[IvfKernel.cos6]], the ONE
    * rounded-cosine kernel every ANN stage shares, so values stay
    * bit-identical to the in-plan `round(CosineSimilarity, 6)` and the
    * DuckDB oracle. Output rows in input order; O(k²) bounded by the
    * caller's maxCellRows guard.
    */
  def semanticKeep(vs: ArrayData, threshold: Double): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = vs.numElements()
    val ids = new Array[Long](k)
    val embs = new Array[Array[Float]](k)
    var i = 0
    while (i < k) {
      val row = vs.getStruct(i, 2)
      ids(i) = row.getLong(0)
      embs(i) = IvfKernel.toFloats(row.getArray(1))
      i += 1
    }
    // per-vector norms once (r16): cos6 recomputed BOTH norms inside every
    // pair — with the cell quadratic that tripled the hot-loop FLOPs and
    // paid one BigDecimal construction per pair. The threshold test is
    // now lazy ([[IvfKernel.cos6AtLeast]]): rounding is paid only inside
    // the 5e-7 band and by actual duplicates — same decisions, bit for bit
    // (DedupSpec pins kernel ≡ join spelling; oracle re-verified).
    val norms = new Array[Double](k)
    i = 0
    while (i < k) { norms(i) = IvfKernel.norm(embs(i)); i += 1 }
    // scan in ascending-vec_id order (collect_list order is partition-
    // dependent; the semantics are not)
    val idx = Array.range(0, k).sortBy(ids(_))
    val kept = new Array[Boolean](k)
    i = 0
    while (i < k) {
      val ii = idx(i)
      var keep = true
      var j = 0
      while (keep && j < i) {
        val jj = idx(j)
        if (ids(jj) != ids(ii) &&
            IvfKernel.cos6AtLeast(embs(jj), norms(jj), embs(ii), norms(ii),
              threshold)) keep = false
        j += 1
      }
      kept(ii) = keep
      i += 1
    }
    val out = new Array[Any](k)
    i = 0
    while (i < k) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(ids(i), kept(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** THE one centroid-scoring kernel: `round(cosine, 6)` of an embedding
  * against a centroid, double accumulation, identical rounding to Spark's
  * `round(col, 6)` and the DuckDB oracle. Both IVF expressions
  * ([[IvfArgmaxCell]] corpus assignment, [[IvfTopCells]] query probe
  * ranking) rank through this single implementation — there is no second
  * cosine to keep bit-identical by discipline (VERDICT r7 #4).
  */
object IvfKernel {
  def cos6(emb: Array[Float], ce: Array[Float]): Double = {
    val n = math.min(emb.length, ce.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val x = emb(i).toDouble; val y = ce(i).toDouble
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    val d = math.sqrt(nx) * math.sqrt(ny)
    val raw = if (d == 0.0) 0.0 else dot / d // same zero guard as VectorOps.cosine
    round6(raw)
  }

  /** Round-half-up to 6 decimals — the ranking convention every ANN stage
    * shares with Spark's `round(col, 6)` and the DuckDB oracle (the
    * brute-force parity spec pins the equality against the in-plan Round).
    */
  def round6(raw: Double): Double =
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Full-array norm in index order — the same accumulation sequence as
    * [[cos6]]'s `ny` whenever the two arrays share a length, so a norm
    * precomputed once per vector feeds [[cos6Lazy]] without changing a
    * single bit of the result.
    */
  def norm(v: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < v.length) { val x = v(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  /** [[cos6]] with precomputed norms and LAZY half-up rounding (r15):
    * returns `round6(raw)` when the raw cosine can still reach `floor`,
    * and -Inf otherwise — a raw strictly below (floor − 5e-7) rounds to
    * at most raw + 5e-7 < floor on the 1e-6 grid, so it can neither beat
    * nor tie a running best/rank-k of `floor` (round6 is monotone; the
    * same cutoff [[graft.operators.Similarity.LocalTopK]] uses). -Inf can
    * never equal a finite floor, so tie-break clauses in callers stay
    * unreachable for skipped candidates. The BigDecimal construction —
    * the dominant per-pair cost of the pre-r15 argmax at scale — is paid
    * only by candidates inside the 5e-7 window. Mixed lengths fall back
    * to [[cos6]]'s truncated-norm semantics (and always round).
    */
  def cos6Lazy(emb: Array[Float], embNorm: Double, ce: Array[Float],
               ceNorm: Double, floor: Double): Double = {
    val n = emb.length
    if (n != ce.length) return cos6(emb, ce)
    var dot = 0.0; var i = 0
    while (i < n) { dot += emb(i).toDouble * ce(i).toDouble; i += 1 }
    val d = embNorm * ceNorm
    val raw = if (d == 0.0) 0.0 else dot / d
    if (raw < floor - 5e-7) Double.NegativeInfinity else round6(raw)
  }

  /** `cos6(a, b) >= threshold` with precomputed norms and LAZY rounding
    * (r16): a raw cosine strictly below (threshold − 5e-7) rounds to at
    * most raw + 5e-7 < threshold on the 1e-6 grid, so it is rejected
    * without the BigDecimal — the same monotonicity argument as
    * [[cos6Lazy]]. Candidates at or above the cutoff pay [[round6]] and
    * compare exactly, so the decision is bit-identical to eager
    * `cos6(a, b) >= threshold` for every input. Mixed lengths fall back
    * to [[cos6]]'s truncated-norm semantics. This is the hot test of
    * [[VectorOps.semanticKeep]]'s per-cell quadratic scan.
    */
  def cos6AtLeast(a: Array[Float], aNorm: Double, b: Array[Float],
                  bNorm: Double, threshold: Double): Boolean = {
    val n = a.length
    if (n != b.length) return cos6(a, b) >= threshold
    var dot = 0.0; var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    val d = aNorm * bNorm
    val raw = if (d == 0.0) 0.0 else dot / d
    if (raw < threshold - 5e-7) false else round6(raw) >= threshold
  }

  /** The `nprobe` nearest centroids of `emb` by (cos6 desc, cid asc) —
    * the ONE probe-ranking implementation, shared by the in-plan
    * [[IvfTopCells]] expression and the driver-side probe-map build in
    * [[graft.operators.Similarity.ivfTopK]] (r15 kernel path), so the
    * two call sites can never drift. Insertion selection: nprobe is
    * small (≤ tens) — O(nlist × nprobe) with zero allocation beats
    * sorting nlist scored pairs.
    */
  def topCells(emb: Array[Float], cidArray: Array[Long],
               centArrays: Array[Array[Float]], nprobe: Int,
               centNorms: Array[Double]): Array[Long] = {
    val k = math.min(nprobe, cidArray.length)
    val embNorm = norm(emb)
    val topCos = new Array[Double](k)
    val topCid = new Array[Long](k)
    var filled = 0
    var c = 0
    while (c < centArrays.length) {
      // lazy rounding against the running rank-k (cos6Lazy: a skipped
      // candidate returns -Inf, which the insertion below cannot place)
      val floor = if (filled == k) topCos(k - 1) else Double.NegativeInfinity
      val cos = IvfKernel.cos6Lazy(emb, embNorm, centArrays(c), centNorms(c), floor)
      val cid = cidArray(c)
      var pos = filled
      while (pos > 0 && (topCos(pos - 1) < cos ||
          (topCos(pos - 1) == cos && topCid(pos - 1) > cid))) pos -= 1
      if (pos < k) {
        val stop = math.min(filled, k - 1)
        var j = stop
        while (j > pos) { topCos(j) = topCos(j - 1); topCid(j) = topCid(j - 1); j -= 1 }
        topCos(pos) = cos
        topCid(pos) = cid
        if (filled < k) filled += 1
      }
      c += 1
    }
    java.util.Arrays.copyOf(topCid, filled)
  }

  def toFloats(a: ArrayData): Array[Float] = {
    val dim = a.numElements()
    val emb = new Array[Float](dim)
    var i = 0
    while (i < dim) { emb(i) = a.getFloat(i); i += 1 }
    emb
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
  @transient private lazy val centNorms: Array[Double] =
    centArrays.map(IvfKernel.norm)

  /** Hot loop (one call per corpus row × refine round): scores through
    * [[IvfKernel.cos6Lazy]] — raw cosine from precomputed norms, half-up
    * rounding paid only by candidates within 5e-7 of the running best
    * (r15; the rounded argmax is unchanged — see cos6Lazy's monotonicity
    * note). The pre-r15 spelling called [[IvfKernel.cos6]] per
    * (row, centroid): one BigDecimal construction each, 3.9B of them for
    * the 2M-row × 1953-cell x1000 assignment.
    */
  def argmax(a: ArrayData): Long = {
    val emb = IvfKernel.toFloats(a)
    val embNorm = IvfKernel.norm(emb)
    var best = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var c = 0
    while (c < centArrays.length) {
      val cos = IvfKernel.cos6Lazy(emb, embNorm, centArrays(c), centNorms(c), best)
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

/** The `nprobe` nearest cells of an embedding, ordered by
  * (round-6 cosine desc, cid asc) — the query-side probe ranking of
  * [[graft.operators.Similarity.ivfTopK]], scored through the SAME
  * [[IvfKernel]] the corpus assignment uses, so probe ranking can never
  * drift from cell assignment. Runs in-plan over the query DataFrame —
  * query embeddings never travel to the driver.
  */
case class IvfTopCells(child: Expression, cids: IndexedSeq[Long],
                       cents: IndexedSeq[IndexedSeq[Float]], nprobe: Int)
    extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length,
    "one cid per centroid, at least one")
  require(nprobe > 0, "nprobe must be positive")
  override def prettyName: String = "ivf_top_cells"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
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
  @transient private lazy val centNorms: Array[Double] =
    centArrays.map(IvfKernel.norm)

  def topCells(a: ArrayData): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      IvfKernel.topCells(IvfKernel.toFloats(a), cidArray, centArrays, nprobe,
        centNorms))

  override def nullSafeEval(a: Any): Any = topCells(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfTopCells", this, classOf[IvfTopCells].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.topCells($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SemDeDup's within-cell earliest-survivor pass as ONE bounded kernel —
  * see [[VectorOps.semanticKeep]]. The SQL self-join spelling
  * (`a.cell = b.cell AND a.vec_id < b.vec_id AND round(cos, 6) >=
  * threshold` → anti-probe) re-ran the scan+argmax subtree once per join
  * input (column pruning + inferred not-null filters make the three
  * references canonicalize differently, so exchange reuse never fires —
  * plan-audited, r12); with the cell's vectors collected into one row the
  * quadratic scan runs in-task, bounded by the SAME maxCellRows guard
  * that already protects the join spelling.
  */
case class SemanticKeepArray(child: Expression, threshold: Double)
    extends UnaryExpression {
  override def prettyName: String = "semantic_keep"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("kept",
        org.apache.spark.sql.types.BooleanType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StructType(fields), _)
          if fields.length == 2 &&
            fields(0).dataType == org.apache.spark.sql.types.LongType &&
            (fields(1).dataType match {
              case ArrayType(FloatType, _) => true; case _ => false }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<long, array<float>>>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    VectorOps.semanticKeep(a.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.semanticKeep($c, ${threshold}D)")

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
  def ivf_top_cells(emb: Column, cids: Seq[Long], cents: Seq[Seq[Float]],
                    nprobe: Int): Column =
    column(IvfTopCells(expression(emb), cids.toIndexedSeq,
      cents.map(_.toIndexedSeq).toIndexedSeq, nprobe))
  def semantic_keep(vs: Column, threshold: Double): Column =
    column(SemanticKeepArray(expression(vs), threshold))
}
