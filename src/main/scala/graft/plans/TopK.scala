package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, GenericInternalRow, IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, RowNumber, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Sort-free per-group top-k: the whole-operator custom surface
  * (LogicalPlan + optimizer Rule + Strategy + SparkPlan, SURVEY.md
  * §7.4 growth path (c)).
  *
  * Spark plans `row_number().over(partitionBy p orderBy o) <= k` as
  * Sort → WindowGroupLimit(Partial) → Exchange → Sort →
  * WindowGroupLimit(Final) → WindowExec → Filter: Spark 3.5+'s
  * InferWindowGroupLimit prunes the shuffle to k rows per group per
  * partition, but both phases still FULLY SORT their input first.
  * `RewriteWindowTopK` recognizes that logical shape (absorbing the
  * inferred WindowGroupLimit) and swaps in [[TopKPerGroup]], planned
  * by [[TopKStrategy]] as a two-phase [[TopKPerGroupExec]] pair
  * (partial before the exchange, final after — same pruned shuffle
  * volume): one pass with a k-bounded heap per group, O(n log k)
  * comparisons and NO sort buffers anywhere.
  *
  * Measured at 50M rows / 100k groups / k=3 (local[32]): two-phase
  * heap ~5.0s vs sort-based window ~2.9-6.4s — comparable wall-clock
  * when the sort fits memory. The heap operator's structural win is
  * MEMORY: O(groups x k) working set per task versus full-partition
  * sort buffers, i.e. no spill under memory pressure — the regime
  * that matters on wide rows at 100 TB.
  *
  * The rewrite is transparent: user queries keep the standard window
  * formulation and the optimized operator produces bit-identical
  * output (row_number ranks under the same total order), including the
  * rank column under its original exprId so downstream projections
  * resolve unchanged. Only deterministic, single-window-expression
  * shapes with a literal bound are rewritten; anything else is left to
  * WindowExec.
  */
case class TopKPerGroup(partitionSpec: Seq[Expression], orderSpec: Seq[SortOrder],
                        k: Int, rn: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rn
  // rn is produced HERE, not consumed — without this the node is
  // flagged "!missing input" in plan strings
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rn)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Filter(rn <= k, Window([rn := row_number() over (p, o)], p, o, c))
  * → TopKPerGroup(p, o, k, rn, c). Runs in the user-provided optimizer
  * batch (after standard optimization, where this shape is stable). */
object RewriteWindowTopK extends Rule[LogicalPlan] {
  private def bound(cond: Expression, rnId: Long): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId.id == rnId => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId.id == rnId => Some(k - 1)
    // rn = 1 is the keep-one-per-group dedup idiom
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.exprId.id == rnId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)), partitionSpec, orderSpec, child0, _))
        if partitionSpec.nonEmpty && partitionSpec.forall(_.deterministic) &&
           orderSpec.forall(_.deterministic) =>
      // absorb the sort-based group limit InferWindowGroupLimit already
      // placed below the window — the heap operator subsumes it
      val child = child0 match {
        case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case c => c
      }
      bound(cond, alias.exprId.id) match {
        case Some(k) if k > 0 && k <= 10000 =>
          TopKPerGroup(partitionSpec, orderSpec, k, alias.toAttribute, child)
        case _ => f
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(p, o, k, rn, child) =>
      // two-phase like hash aggregation: the PARTIAL pass prunes each
      // input partition to k rows per group BEFORE the exchange, so
      // the shuffle moves at most partitions x groups x k rows, never
      // the full input
      TopKPerGroupExec(p, o, k, rn, partial = false,
        TopKPerGroupExec(p, o, k, rn, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One pass, one k-bounded heap per group. Partial mode runs on
  * arbitrary input partitions and emits unranked local top-k; final
  * mode requires clustering on the group keys (EnsureRequirements
  * inserts the exchange between the two) and appends the rank. No sort
  * of the input anywhere, and memory is bounded by
  * groups-per-partition x k (hash-aggregate-like). */
case class TopKPerGroupExec(partitionSpec: Seq[Expression], orderSpec: Seq[SortOrder],
                            k: Int, rn: Attribute, partial: Boolean,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rn

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rn)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(partitionSpec) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pSpec = partitionSpec
    val oSpec = orderSpec
    val kk = k
    val isPartial = partial
    child.execute().mapPartitions ({ iter =>
      val grouping = UnsafeProjection.create(pSpec, childOutput)
      val ordering = RowOrdering.create(oSpec, childOutput)
      // max-heap under `ordering` so the WORST retained row is on top
      // and evicted first once the heap exceeds k
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = grouping(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row.copy()) }
      }
      if (isPartial) {
        // unranked local top-k; heap order is irrelevant (already
        // UnsafeRow copies, safe to hand downstream)
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      } else {
        // downstream operators (exchanges, codegen consumers) require
        // UnsafeRow — run the joined (row, rank) through an identity
        // unsafe projection; buffers are reused per the operator contract
        val outProj = UnsafeProjection.create(output, output)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = heap.toArray(new Array[InternalRow](heap.size()))
          java.util.Arrays.sort(rows, ordering)
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, i + 1)
            outProj(joined.withLeft(r).withRight(rankRow)): InternalRow
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
