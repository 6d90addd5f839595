package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** The one imperative registration loop shared by every function
  * family ([[vectors]], [[texthash]], [[textstats]], [[topk]]) — kept
  * in a single place so the idempotency contract with
  * [[graft.GraftExtensions]] (same builders, same names, exactly one
  * implementation per name) cannot drift between copies. Skips names
  * that already exist so repeated per-query calls don't spam
  * `WARN SimpleFunctionRegistry ... replaced`. */
object registry {
  private[graft] def register(
      spark: SparkSession,
      builders: Seq[(String, Seq[Expression] => Expression)]): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
