package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BaseOrdering, Descending, Expression, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftx.GraftPlanBridge

/** Whole-operator Catalyst extension (the SURVEY §2.I "custom
  * LogicalPlan + SparkStrategy + SparkPlan" slot): exact top-k rows per
  * group, planned as a partial/final pair so each input partition sends at
  * most k rows per group into the exchange.
  *
  * The built-in way to say "k best rows per group" is a rank window +
  * filter: that plan shuffles EVERY row to its group's partition and
  * full-sorts each partition before the rank filter drops the losers. At
  * 100 TB the shuffle is the data set. This operator is the per-group
  * analogue of Spark's own global TakeOrderedAndProjectExec: a bounded
  * heap per group on the map side first (memory O(groups × k) per task,
  * O(log k) per row), so the exchange carries ≤ k rows per (group,
  * input-partition) — shuffle volume scales with GROUPS × k, not rows.
  * The same bounded-heap pass after the exchange merges the partials
  * (top-k of a union = top-k of per-part top-ks).
  *
  * Reference shapes this serves: every dashboard "best/LIMIT per entity"
  * query (neodash_queries.yaml's per-entry best-cognate / LIMIT idioms)
  * and the bestCognate argmax (D4/F2/F4) when k > 1.
  *
  * Determinism contract: `order` must be a TOTAL order within a group
  * (include a unique tiebreak column, as every registered query does) —
  * same requirement a row_number window has for a stable result.
  */
final case class TopKPerGroup(groupExprs: Seq[Expression],
                              order: Seq[SortOrder], k: Int,
                              child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  require(groupExprs.nonEmpty, "topKPerGroup requires at least one group column")
  // an empty order would compare all rows equal: the heaps would keep k
  // ARBITRARY rows per group, varying with partitioning — fail fast
  // instead of silently breaking the determinism contract
  require(order.nonEmpty, "topKPerGroup requires at least one order column")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {

  /** Typed entry: k best rows per group under `order` ((column,
    * descending) pairs applied left to right). Output columns = input
    * columns; row order is unspecified (append an orderBy, exactly as
    * after a groupBy).
    */
  def topK(df: DataFrame, groupCols: Seq[String],
           order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val g = groupCols.map(n => UnresolvedAttribute.quoted(n))
    val so = order.map { case (n, desc) =>
      SortOrder(UnresolvedAttribute.quoted(n),
        if (desc) Descending else Ascending)
    }
    GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerGroup(g, so, k, GraftPlanBridge.planOf(df)))
  }
}

/** Plans the logical node as final-over-partial — the HashAggregate
  * partial/final split, for top-k. EnsureRequirements inserts the single
  * hash exchange between the two from the final's required distribution.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      // Normalize -0.0/0.0 and NaN payloads in float/double group keys
      // (incl. nested in structs/arrays) at PLANNING time, exactly as
      // Catalyst's NormalizeFloatingNumbers rule does for Aggregate/
      // Window/Join keys — that rule never visits a custom node, and
      // both the hash exchange and the exec's byte-keyed map would
      // otherwise split one SQL-equal group into several
      val ng = g.map(GraftPlanBridge.normalizeFloats)
      val partial = TopKPerGroupExec(ng, o, k, partial = true,
        planLater(child))
      TopKPerGroupExec(ng, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** One bounded-heap pass: per group, a worst-at-head priority queue of at
  * most k row copies. `partial = true` runs on unshuffled input (map-side
  * trim, no distribution requirement); `partial = false` declares
  * ClusteredDistribution on the group key so all partials of one group
  * meet in one partition for the exact merge.
  *
  * Memory envelope: the per-task state is an on-heap map of
  * (groups-in-partition × k) row copies. The PARTIAL pass removes the
  * OOM cliff with a size-triggered degrade: when the map exceeds
  * `spark.graft.topk.partialFlushRows` kept rows (default 1M), it is
  * flushed as partial output and restarted — correct because partial
  * output is only ever a candidate superset and the final merge
  * re-trims; the cost of a flush is extra exchange rows (≤ k per group
  * per flush epoch), degrading toward the window plan's shuffle volume
  * instead of failing. The FINAL pass sees one group entirely in one
  * partition, so its state is (groups-per-reduce-partition × k):
  * bounded operationally by raising shuffle partitions (state shrinks
  * linearly; AQE skew split caps a hot partition). Registered usage
  * (s7, k=2, dimension-keyed groups) sits far inside the envelope.
  */
final case class TopKPerGroupExec(groupExprs: Seq[Expression],
                                  order: Seq[SortOrder], k: Int,
                                  partial: Boolean,
                                  child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val groupE = groupExprs
    val orderE = order
    val inAttrs = child.output
    val kk = k
    // size-triggered degrade (partial pass only): flush-and-restart when
    // the map holds this many row copies. Partial output is a candidate
    // superset by construction, so the final merge re-trims to the exact
    // answer; the final pass itself must never flush mid-group and keeps
    // the documented raise-shuffle-partitions operating rule instead.
    val flushBudget =
      if (partial)
        conf.getConfString("spark.graft.topk.partialFlushRows", "1048576").toLong
      else Long.MaxValue
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(groupE, inAttrs)
      val ord: BaseOrdering = RowOrdering.create(orderE, inAttrs)
      // head = LAST row in the requested order among those kept = the one
      // the next better row evicts
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      var heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      var kept = 0L

      def insert(row: InternalRow): Unit = {
        val key = proj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), h) // proj reuses its row — copy the key
        }
        if (h.size() < kk) { h.add(row.copy()); kept += 1 }
        else if (ord.compare(row, h.peek()) < 0) { // beats the worst kept
          h.poll()
          h.add(row.copy())
        }
      }

      // LAZY drain: hand out an iterator over the current map and start a
      // fresh one, instead of copying every kept row reference into a
      // transient ArrayBuffer at the operator's peak-memory moment. Safe
      // against concurrent mutation because the outer iterator only
      // resumes insert() after the drained iterator is exhausted (the
      // advance() loop gates on !out.hasNext); the old map becomes
      // garbage as it drains.
      def drain(): Iterator[InternalRow] = {
        val old = heaps
        heaps = new java.util.HashMap[
          UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        kept = 0L
        old.values().iterator().asScala
          .flatMap(_.iterator().asScala)
          .map { r => numOutputRows += 1; r }
      }

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        private def advance(): Unit =
          while (!out.hasNext && !inputDone) {
            var flushed = false
            while (iter.hasNext && !flushed) {
              insert(iter.next())
              if (kept >= flushBudget) { out = drain(); flushed = true }
            }
            if (!flushed) { inputDone = true; out = drain() }
          }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
