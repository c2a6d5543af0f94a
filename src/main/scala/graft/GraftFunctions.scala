package graft

import graft.functions.VectorFunctions.{DotProduct, NormalizeL2}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's custom Catalyst expressions, so the
  * `spark.sql(...)` surface (the reference's Hasura-query analog, SURVEY
  * §3.2) can use them like built-ins:
  *
  *   SELECT vec_dot(a.emb, b.emb) FROM ...
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  *    (cluster-wide, set at session build time);
  *  - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("vec_normalize"),
      info("vec_normalize", "vec_normalize(a) - L2-normalize an array<double>"),
      (args: Seq[Expression]) => NormalizeL2(args.head)))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, fInfo, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, fInfo, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
