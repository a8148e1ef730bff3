package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SubqueryAlias, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule (SURVEY.md §4's "Rule to auto-broadcast the EC
  * universe"): joins whose one side scans a registered dimension table get
  * a broadcast hint, independent of `spark.sql.autoBroadcastJoinThreshold`
  * — clusters often disable the size-based heuristic (stale stats, remote
  * storage), while the dimension list is static knowledge.
  *
  * Dimensions are recognized by file-scan path fragments (e.g.
  * "nation.parquet"); wire via `GraftExtensions` at session build or
  * `spark.experimental.extraOptimizations` on a live session.
  */
case class AutoBroadcastDims(dimPathFragments: Seq[String])
    extends Rule[LogicalPlan] {

  /** A join side qualifies only when it IS a dimension scan — a dim file
    * relation possibly wrapped in cardinality-preserving-or-reducing nodes
    * (Project/Filter/SubqueryAlias). Merely *containing* a dim leaf is not
    * enough: after the first dim join, the fact side of a later fact-fact
    * join also contains that leaf, and a hint there would broadcast a
    * fact-cardinality intermediate (hints bypass the size threshold).
    */
  private def isDim(plan: LogicalPlan): Boolean = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths
        .exists(p => dimPathFragments.exists(p.toString.contains))
      case _ => false
    }
    case Project(_, child)        => isDim(child)
    case Filter(_, child)         => isDim(child)
    case SubqueryAlias(_, child)  => isDim(child)
    case _ => false
  }

  private def broadcastHint(h: Option[HintInfo]): Option[HintInfo] =
    Some(h.getOrElse(HintInfo()).copy(strategy = Some(BROADCAST)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    // the dims.broadcast switch governs this rule too: with it off, join
    // strategy must genuinely revert to the size-based heuristic (the
    // huge-dim fallback DimBroadcast documents) — a rule that kept
    // hinting would silently re-broadcast what the conf just disabled
    if (!conf.getConfString(DimBroadcast.Conf, "true").toBoolean) plan
    else plan.transformUp {
      case j @ Join(l, r, _, _, hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        val lDim = isDim(l)
        val rDim = isDim(r)
        if (rDim && !lDim) j.copy(hint = hint.copy(rightHint = broadcastHint(hint.rightHint)))
        else if (lDim && !rDim) j.copy(hint = hint.copy(leftHint = broadcastHint(hint.leftHint)))
        else j
    }
}
