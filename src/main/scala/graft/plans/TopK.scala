package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** TOP-K PER KEY as a first-class operator — the full custom-operator
  * stack (marker Expression → Rule[LogicalPlan] → custom LogicalPlan →
  * SparkStrategy → physical SparkPlan), the (c)-tier extension surface
  * for semantics Spark's built-ins can't express efficiently.
  *
  * Spark's idiom for "top k rows per key" is
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k` — which
  * SORTS every key's full row set (shuffle + per-partition sort of ALL
  * rows) just to throw away everything past rank k. At 100 TB that sort
  * is the cost. The native operator instead keeps a bounded heap of k
  * rows per key: O(n log k) with NO sort, and because top-k is a
  * semigroup (top-k of a union = top-k of the per-part top-k's) it runs
  * in two phases like a hash aggregate — a PARTIAL pass before the
  * shuffle caps every (partition, key) at k rows, so the exchange
  * carries at most partitions × keys × k rows instead of the full table.
  *
  * Memory: each phase holds (#keys-in-partition × k) row copies — the
  * same bound as a hash aggregate's buffer per distinct key, and
  * strictly less than the window idiom's full-partition sort buffer.
  *
  * Usage (installed by GraftFunctions.register / GraftExtensions):
  *   df.filter(call_function("graft_topk", lit(k),
  *     ord.cast("double"), tie.cast("long"), key1, ...))
  * Ranking is ord DESC with tie ASC as the total-order tiebreak (tie must
  * be unique per row for deterministic results). Rows with NULL ord are
  * dropped (they rank below everything, matching the window idiom where
  * NULLS LAST puts them past rank k for k < group size).
  */
case class TopKMarker(children: Seq[Expression]) extends Expression
    with Unevaluable {
  // children = k (int literal), ord (double), tie (long), keys...
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKMarker = copy(children = cs)
}

/** Logical top-k-per-key. Preserves the child's output unchanged. */
case class TopKPerKey(keys: Seq[Expression], ord: Expression,
    tie: Expression, k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Rewrite `Filter(graft_topk(...), child)` → `TopKPerKey(child)`.
  * Runs in extraOptimizations (after the main batches), so the marker may
  * have been conjoined with other predicates by CombineFilters — the rule
  * splits the conjunction and keeps the residual as a real Filter UNDER
  * the top-k (predicates combined into one Filter node would have
  * filtered before ranking in the original query order).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def split(cond: Expression): (Option[TopKMarker], Seq[Expression]) = {
    val conjuncts = {
      def flat(e: Expression): Seq[Expression] = e match {
        case And(l, r) => flat(l) ++ flat(r)
        case x => Seq(x)
      }
      flat(cond)
    }
    val (markers, rest) = conjuncts.partition(_.isInstanceOf[TopKMarker])
    (markers.headOption.map(_.asInstanceOf[TopKMarker]), rest)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
      split(cond) match {
        case (Some(m), rest) =>
          val base =
            if (rest.isEmpty) child
            else org.apache.spark.sql.catalyst.plans.logical.Filter(
              rest.reduce(And), child)
          val k = m.children.head match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_topk k must be an int literal, got $other")
          }
          TopKPerKey(m.children.drop(3), m.children(1), m.children(2), k, base)
        case _ => f
      }
  }
}

/** Plan TopKPerKey as partial → (exchange inserted by EnsureRequirements)
  * → final, exactly the hash-aggregate shape.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ord, tie, k, child) =>
      val partial = TopKPerKeyExec(keys, ord, tie, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, ord, tie, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key. Partial phase runs on whatever partitioning
  * the child has (map-side cap); final phase requires clustering by the
  * keys — EnsureRequirements inserts the hash exchange, which then only
  * carries the partial survivors.
  */
case class TopKPerKeyExec(keys: Seq[Expression], ord: Expression,
    tie: Expression, k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  /** Partial-phase memory guard: when the per-partition heap map exceeds
    * this many distinct keys, the partial FLUSHES its current heaps
    * downstream and starts fresh. Correctness is unaffected — the final
    * phase merges every flushed fragment (top-k is a semigroup); the only
    * cost is extra exchange rows for super-high-cardinality keys. The
    * final phase never flushes: clustered by key, it holds exactly
    * (#keys-in-its-partition × k) rows, the hash-aggregate bound.
    * Tunable via `graft.topk.partialFlushKeys` (TopKSpec drives it to 4
    * to exercise the flush path).
    */
  private def flushKeys: Int =
    session.conf.getOption("graft.topk.partialFlushKeys")
      .map(_.toInt).getOrElse(1 << 17)

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = ord
    val tieExpr = tie
    val kk = k
    val isPartial = partial
    val flushAt = flushKeys
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(Seq(ordExpr, tieExpr), childOutput)
      // dequeue yields the WORST kept row: smaller ord first, then larger tie
      val worstFirst = new Ordering[(Double, Long, InternalRow)] {
        override def compare(a: (Double, Long, InternalRow),
            b: (Double, Long, InternalRow)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
      new Iterator[InternalRow] {
        private val heaps =
          mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, Long, InternalRow)]]
        private var out: Iterator[InternalRow] = Iterator.empty

        private def drain(): Iterator[InternalRow] = {
          val it = heaps.values.toArray.iterator.flatMap(_.iterator.map(_._3))
          heaps.clear()
          it
        }

        private def fill(): Unit = {
          while (out.isEmpty && iter.hasNext) {
            val row = iter.next()
            val ot = ordProj(row)
            if (!ot.isNullAt(0)) {
              val o = ot.getDouble(0)
              val t = if (ot.isNullAt(1)) 0L else ot.getLong(1)
              val key = keyProj(row)
              val heap = heaps.get(key) match {
                case Some(h) => h
                case None =>
                  val h = mutable.PriorityQueue
                    .empty[(Double, Long, InternalRow)](worstFirst)
                  heaps.put(key.copy(), h)
                  h
              }
              if (heap.size < kk) heap.enqueue((o, t, row.copy()))
              else if (worstFirst.compare((o, t, null), heap.head) < 0) {
                heap.dequeue()
                heap.enqueue((o, t, row.copy()))
              }
              if (isPartial && heaps.size >= flushAt) out = drain()
            }
          }
          if (out.isEmpty && heaps.nonEmpty) out = drain()
        }

        override def hasNext: Boolean = { if (out.isEmpty) fill(); out.hasNext }
        override def next(): InternalRow = { if (out.isEmpty) fill(); out.next() }
      }
    }
  }
}
