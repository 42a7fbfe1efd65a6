package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, StartsWith, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.unsafe.types.UTF8String

/** Custom join operator for prefix-match joins:
  * `left JOIN right ON startsWith(left.text, right.prefix)`.
  *
  * Spark plans this non-equi condition as BroadcastNestedLoopJoin —
  * O(|left| · |right|) `startsWith` probes. When the right side is a
  * bounded dictionary (the opening book in SURVEY.md J3; any prefix
  * vocabulary), the right answer is a hash lookup per *byte-prefix* of the
  * left string: O(|left| · maxPrefixLen) with tiny constants. This is the
  * "whole-operator semantics the built-ins can't express" tier:
  * LogicalPlan pattern → [[PrefixJoinStrategy]] → [[PrefixJoinExec]],
  * registered through `SparkSessionExtensions` ([[GraftPlanExtensions]])
  * or `spark.experimental.extraStrategies`.
  *
  * Scale shape: the dictionary is collected once (strategy fires only under
  * the broadcast threshold) and broadcast; the probe side streams with no
  * shuffle, exactly like a broadcast hash join.
  */
case class PrefixJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKey: Expression, rightKey: Expression,
                          joinType: JoinType) extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rightRows = right.executeCollect()
    val rightKeyEval = UnsafeProjection.create(Seq(rightKey), right.output)
    val map = new java.util.HashMap[UTF8String, java.util.ArrayList[InternalRow]]()
    var maxLen = 0
    rightRows.foreach { r =>
      val k = rightKeyEval(r).getUTF8String(0)
      if (k != null) {
        val key = k.clone()
        maxLen = math.max(maxLen, key.numBytes())
        var bucket = map.get(key)
        if (bucket == null) { bucket = new java.util.ArrayList[InternalRow](); map.put(key, bucket) }
        bucket.add(r.copy())
      }
    }
    val bc = sparkContext.broadcast((map, maxLen))
    val isOuter = joinType == LeftOuter
    val rightArity = right.output.size
    val leftOutput = left.output
    val fullOutput = output

    left.execute().mapPartitions { iter =>
      val (dict, maxL) = bc.value
      val leftKeyEval = UnsafeProjection.create(Seq(leftKey), leftOutput)
      val proj = UnsafeProjection.create(fullOutput, fullOutput)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      iter.flatMap { lrow =>
        val t = leftKeyEval(lrow).getUTF8String(0)
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        if (t != null) {
          // the empty-string prefix matches every left row (startsWith(x, "")
          // is true even for x = ""), but the byte-length loop below starts
          // at 1 — probe the empty key separately or the rewrite silently
          // drops rows BroadcastNestedLoopJoin would emit
          val emptyBucket = dict.get(UTF8String.EMPTY_UTF8)
          if (emptyBucket != null) {
            val it = emptyBucket.iterator()
            while (it.hasNext) out += proj(joined(lrow, it.next())).copy()
          }
          val bytes = t.getBytes
          val bound = math.min(bytes.length, maxL)
          var l = 1
          while (l <= bound) {
            val bucket = dict.get(UTF8String.fromBytes(bytes, 0, l))
            if (bucket != null) {
              val it = bucket.iterator()
              while (it.hasNext) out += proj(joined(lrow, it.next())).copy()
            }
            l += 1
          }
        }
        if (out.isEmpty && isOuter) out += proj(joined(lrow, nullRight)).copy()
        out.iterator
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Planner strategy: fire on `Join(cond = StartsWith(l, r))` where `l` is
  * computable from the left child, `r` from the right, and the right side's
  * stats fit the broadcast threshold.
  */
object PrefixJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, jt @ (Inner | LeftOuter), Some(StartsWith(l, r)), _)
        if l.references.subsetOf(left.outputSet) &&
          r.references.subsetOf(right.outputSet) &&
          right.stats.sizeInBytes >= 0 &&
          right.stats.sizeInBytes <= math.max(
            org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold, 10L << 20) =>
      PrefixJoinExec(planLater(left), planLater(right), l, r, jt) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftPlanExtensions` wiring: the
  * planner strategy plus SQL registration of the native expressions, so
  * `spark.sql("SELECT graft_simhash16(text) ...")` reaches the same
  * codegen'd kernels as the Column API — the pure-SQL user gets the full
  * engine surface.
  */
class GraftPlanExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
  import graft.functions._

  /** The scalar parameters of the fused expressions (shingle width,
    * permutation count, distance cap) must be LITERAL in SQL — they are
    * compiled into the generated code, not evaluated per row.
    */
  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $e")
  }

  /** (name, signature-for-errors, arity, builder). Builders index `args`
    * positionally, so arity is validated BEFORE the builder runs — a call
    * like `graft_shingles(text)` gets a named wrong-number-of-arguments
    * error at analysis, not an IndexOutOfBoundsException.
    */
  private def fns: Seq[(String, String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_shingles", "(text, k)", 2, { args: Seq[Expression] =>
      ShingleArray(args.head, litInt(args(1), "graft_shingles", "k"))
    }),
    ("graft_shingle_hash31", "(text, k)", 2, { args: Seq[Expression] =>
      ShingleHash31Array(args.head, litInt(args(1), "graft_shingle_hash31", "k"))
    }),
    ("graft_shingle_hash31_all", "(text, k)", 2, { args: Seq[Expression] =>
      ShingleHash31AllArray(args.head,
        litInt(args(1), "graft_shingle_hash31_all", "k"))
    }),
    ("graft_minhash_sig", "(hashes, numPerm)", 2, { args: Seq[Expression] =>
      MinhashSigArray(args.head, litInt(args(1), "graft_minhash_sig", "numPerm"))
    }),
    ("graft_array_pairs", "(ids)", 1, { args: Seq[Expression] => ArrayPairs(args.head) }),
    ("graft_simhash16", "(text)", 1, { args: Seq[Expression] => SimHash16(args.head) }),
    ("graft_rolling_hash", "(text)", 1, { args: Seq[Expression] => RollingHash(args.head) }),
    ("graft_bounded_levenshtein", "(left, right, maxDist)", 3, { args: Seq[Expression] =>
      BoundedLevenshtein(args.head, args(1),
        litInt(args(2), "graft_bounded_levenshtein", "maxDist"))
    }),
    ("graft_term_counts", "(text)", 1, { args: Seq[Expression] => TermCountArray(args.head) }),
    ("graft_repetition_stats", "(text, k)", 2, { args: Seq[Expression] =>
      RepetitionStatsExpr(args.head, litInt(args(1), "graft_repetition_stats", "k"))
    }),
    // keysCsv is comma-separated with surrounding whitespace trimmed per
    // segment ('a, b' requests the key "b", not " b"); empty segments are
    // rejected loudly. A key whose NAME contains a comma cannot be
    // requested on this SQL surface — use the Scala API
    // (TextFunctions.json_top_scalars takes a Seq and is unaffected).
    ("graft_json_top_scalars", "(json, keysCsv)", 2, { args: Seq[Expression] =>
      val keys = args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, org.apache.spark.sql.types.StringType) =>
          s.toString.split(",", -1).toSeq.map(_.trim)
        case other => throw new IllegalArgumentException(
          "graft_json_top_scalars: keysCsv must be a string literal " +
            s"(comma-separated top-level keys), got $other")
      }
      require(keys.nonEmpty && keys.forall(_.nonEmpty),
        "graft_json_top_scalars: keysCsv holds an empty key " +
          s"(got '${keys.mkString(",")}') — every comma-separated segment " +
          "must name a top-level key; keys containing a comma are not " +
          "expressible here, use the Scala API")
      JsonTopScalars(args.head, keys)
    }),
    ("graft_vec_dot", "(vec, vec)", 2, { args: Seq[Expression] => DotProduct(args.head, args(1)) }),
    ("graft_vec_cosine", "(vec, vec)", 2, { args: Seq[Expression] => CosineSimilarity(args.head, args(1)) }),
    ("graft_vec_norm", "(vec)", 1, { args: Seq[Expression] => VectorNorm(args.head) }),
    // struct<width,height,channels,est_duration_ms>: real header decode
    // behind the magic gates, md5-stub arithmetic otherwise (the r14
    // columnar multimodal metadata kernel)
    ("graft_media_header_meta", "(payload, kind, md5hex)", 3, { args: Seq[Expression] =>
      graft.operators.MediaHeaderMeta(args.head, args(1), args(2))
    }),
    // weighted GK quantile sketch (percentile_approx over value-count
    // rows); the analyzer wraps the raw AggregateFunction into an
    // AggregateExpression at resolution, as for the built-in aggregates
    ("graft_wpercentile_approx", "(value, weight, percentage, accuracy)", 4,
      { args: Seq[Expression] =>
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.DoubleType
        // only the VALUE is cast (lossless widening); the weight stays
        // raw so checkInputDataTypes can reject fractional types instead
        // of a blanket Cast silently truncating 0.9 → 0 (r14 ADVICE)
        WeightedPercentileApprox(Cast(args.head, DoubleType),
          args(1), args(2), args(3))
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => PrefixJoinStrategy)
    ext.injectOptimizerRule(_ => EliminateUniqueKeyLeftJoin)
    fns.foreach { case (name, sig, arity, builder) =>
      val checked: Seq[Expression] => Expression = { args =>
        if (args.length != arity) throw new IllegalArgumentException(
          s"$name expects $arity argument(s): $name$sig; got ${args.length}")
        builder(args)
      }
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), checked))
    }
  }
}
