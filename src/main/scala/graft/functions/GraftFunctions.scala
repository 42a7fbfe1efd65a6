package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of graft's native expressions, so `spark.sql` text can
  * call them like built-ins:
  *
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT shingle_array(text, 5), simhash16(text), rolling_hash(text) ...
  *
  * Two entry points:
  *  - [[GraftExtensions]] for config-time wiring:
  *    `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - [[GraftFunctions.register]] for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "internal")

  private[functions] val descriptors
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", info("vec_dot", "vec_dot(a, b) - dot product of two array<float>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("vec_norm", info("vec_norm", "vec_norm(a) - L2 norm of an array<float>"),
      (args: Seq[Expression]) => VectorNorm(args(0))),
    ("vec_cosine", info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<float>"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    ("shingle_array", info("shingle_array",
      "shingle_array(text, k) - distinct k-word shingles (k a literal int)"),
      (args: Seq[Expression]) => ShingleArray(args(0),
        args(1).eval(null).asInstanceOf[Int])),
    ("simhash16", info("simhash16", "simhash16(text) - 16-bit md5-vote SimHash"),
      (args: Seq[Expression]) => SimHash16(args(0))),
    ("rolling_hash", info("rolling_hash",
      "rolling_hash(text) - polynomial codepoint hash mod 1e9+7"),
      (args: Seq[Expression]) => RollingHash(args(0))))

  /** Register all graft functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
