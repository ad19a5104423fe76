package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

import graft.functions.expressions.{CosineSimilarity, DotProduct}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - `.withExtensions(new GraftExtensions)` at session build time
  *    (the SparkSessionExtensions route, for spark.sql users);
  *  - [[GraftFunctions.register]] on an existing session (what Verify,
  *    Bench, and the tests use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

object GraftFunctions {

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

  /** Idempotent registration on an existing session (functions + the
    * TopKPerKey planner strategy). */
  def register(spark: SparkSession): Unit = {
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.WindowTopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.WindowTopKRewrite
    }
  }

  /** Column-API form of the native cosine (goes through the registry, so
    * [[register]] must have run on the session). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Column-API form of the native dot product (same registry caveat). */
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
}
