package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` installer for the engine's native
  * expressions — the deployment-grade registration path:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions …
  * }}}
  *
  * makes `simhash64`, `minhash_signature`, `vector_dot` and `winnow`
  * available to every `spark.sql` in the cluster without per-session
  * [[GraftFunctions.register]] calls. No Spark internals are modified —
  * this is the public extension-point API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
    // MV rewrite (graft.plans.MvRewrite) — a no-op until a state table
    // is registered for a fact path, so injecting unconditionally is
    // free for sessions that never register one
    ext.injectOptimizerRule(_ => new graft.plans.MvRewriteRule)
  }
}
