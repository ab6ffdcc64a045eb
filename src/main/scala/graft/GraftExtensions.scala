package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer for graft's native expressions —
  * the declarative registration path: sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` (wired into
  * [[GraftSession.staticTuning]]) resolve `graft_dot` / `graft_shingles`
  * in EVERY session derived from that context, including
  * `spark.newSession()`, with no runtime registration call.
  * [[GraftSession.registerFunctions]] stays as the imperative fallback
  * for externally built sessions that didn't set the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.plans.DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => graft.plans.DotProduct(children(0), children(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_dotl"),
      new ExpressionInfo(classOf[graft.plans.LongDotProduct].getName, "graft_dotl"),
      (children: Seq[Expression]) => graft.plans.LongDotProduct(children(0), children(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.plans.ShingleArray].getName, "graft_shingles"),
      (children: Seq[Expression]) => graft.plans.ShingleArray(children(0), children(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[graft.plans.NormalizeString].getName, "graft_normalize"),
      (children: Seq[Expression]) => graft.plans.NormalizeString(children(0), children(1)),
    ))
    // Rule[LogicalPlan] tier: lossless O(1) length-difference guard in
    // front of O(len²) levenshtein threshold predicates (see
    // plans.LevenshteinPrefilter) — applies to hand-written SQL too
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
  }
}
