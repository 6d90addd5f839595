package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point: installs every graft function
  * (vector distances, text hashing, text statistics, the topk_sketch
  * aggregate) into the session catalog at SESSION BUILD time —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — so plain-SQL users (thrift server, spark-sql shell, notebooks
  * that never touch the Scala API) get `l2_distance(...)`,
  * `topk_sketch(...)` etc. without any imperative `register()` call.
  * This is the deployment-grade registration path;
  * the per-object `register()` helpers remain for embedding the
  * library into sessions graft doesn't construct (and are idempotent
  * against this one — both resolve through the same registry, and the
  * builders are shared, so there is exactly one implementation per
  * name either way).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.allBuilders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), b))
    }
}

object GraftExtensions {
  private[graft] def allBuilders: Seq[(String, Seq[Expression] => Expression)] =
    functions.vectors.builders ++
      functions.texthash.builders ++
      functions.textstats.builders ++
      functions.topk.builders
}
