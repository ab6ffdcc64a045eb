package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{BaseSubqueryExec, GlobalLimitExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.ExecSubqueryExpression

/** Shared physical-plan audits, used by both the [[PlanAudit]] main (any
  * SF, driver-run) and the PlanSpec fleet test (sf0.001, `sbt test`) so
  * the two gates cannot drift.
  */
object PlanChecks {

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: QueryStageExec        => unwrap(q.plan)
    case other                    => other
  }

  /** Mid-pipeline `Exchange SinglePartition` detector — the scale check
    * BEYOND join shape: a single-partition exchange funnels the whole
    * upstream through ONE task, which at 100 TB is an outage unless what
    * flows through it is provably tiny. Legitimate by construction (not
    * flagged):
    *   - a global one-row rollup: the exchange's parent is a final
    *     aggregate with NO grouping keys — one row per upstream
    *     partition enters (partial agg ran map-side), one row leaves;
    *   - a global limit: bounded to n rows by the operator itself.
    * Everything else — a global Sort feeding a Window, a keyless window,
    * a stray repartition(1) — is returned as `parentNode <- childNode`
    * strings for the caller to assert against its per-query allowlist
    * (the q111-class BOUNDED-fold windows, where the single partition
    * holds a derived grid whose size is capped independent of fact
    * rows, are allowlisted BY QUERY NAME at the call sites, never here).
    */
  def singlePartitionOffenders(root: SparkPlan): Seq[String] = {
    val bad = mutable.ArrayBuffer.empty[String]
    val seen = mutable.Set.empty[Int] // subquery plans can be shared (reuse)
    def visit(parent: Option[SparkPlan], p0: SparkPlan): Unit = {
      val p = unwrap(p0)
      if (!seen.add(System.identityHashCode(p))) return
      p match {
        case ex: ShuffleExchangeExec if ex.outputPartitioning == SinglePartition =>
          parent.map(unwrap) match {
            case Some(agg: BaseAggregateExec) if agg.groupingExpressions.isEmpty => ()
            case Some(_: GlobalLimitExec)                                        => ()
            case other =>
              bad += s"${other.map(_.nodeName).getOrElse("<root>")} <- ${ex.child.nodeName}"
          }
        case _ => ()
      }
      p.children.foreach(c => visit(Some(p), c))
      // scalar/IN subquery legs carry their own plans (q107's one-row
      // total rides here); their global rollups must pass the same rule
      p.expressions.foreach(_.foreach {
        case se: ExecSubqueryExpression =>
          se.plan match {
            case bs: BaseSubqueryExec => visit(Some(bs), bs.child)
            case sp                   => visit(None, sp)
          }
        case _ => ()
      })
    }
    visit(None, root)
    bad.toSeq
  }
}
