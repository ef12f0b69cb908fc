package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, LongType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  *
  *   -- single ordering column, descending (the classic form):
  *   df.filter(call_function("graft_topk", lit(k), ord, tie, key1, ...))
  *
  *   -- explicit / multi-column ordering ('asc' | 'desc' literal after
  *   -- each ordering column):
  *   df.filter(call_function("graft_topk", lit(k),
  *     ord1, lit("desc"), ord2, lit("asc"), tie, key1, ...))
  *
  * With NO key columns the operator computes a GLOBAL top-k (final phase
  * gathers the ≤ k-per-partition partial survivors into one partition).
  * Ordering columns and the tie column take any numeric type — the
  * rewrite inserts the double/long casts (ties compare as ascending
  * long; tie must be unique per row for deterministic results).
  *
  * NULL ordering contract: every ordering column compares NULLS LAST —
  * a NULL ranks below every non-NULL value in ITS OWN column, and
  * lower-priority columns still break ties among NULLs. This is
  * per-column (a row with a high first column and NULL second column
  * ranks on the first column as usual), matching
  * `desc_nulls_last`/`asc_nulls_last` window ordering exactly — rows are
  * never silently dropped, so a group with fewer than k non-NULL rows
  * still returns k rows when it has them. Pinned by TopKSpec against the
  * window idiom on a nullable secondary column. (Implementation note:
  * NULL is ranked via a ±Infinity sentinel, so an actual ±Infinity value
  * in an ordering column ties with NULL instead of ordering before it —
  * the one deliberate divergence, irrelevant for finite data.)
  *
  * Predicate-interaction contract (pinned by TopKSpec): conjuncts in the
  * SAME filter condition as the marker apply BEFORE ranking (they
  * constrain the ranked relation); separate `.filter` calls keep query
  * order — a filter applied after the top-k filter stays above it. The
  * marker reports `deterministic = false` precisely so the optimizer
  * cannot merge a later filter into the marker's (CombineFilters) or
  * push the marker below a Project/Join (PushDownPredicates) — either
  * would silently re-order ranking vs filtering.
  */
case class TopKMarker(children: Seq[Expression]) extends Expression
    with Unevaluable {
  // children = k (int literal), then either
  //   ord, tie, keys...                          (legacy: ord DESC), or
  //   (ord, 'asc'|'desc')..., tie, keys...       (explicit directions)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  /** Nondeterministic BY DECLARATION (evaluation is a pure marker): stops
    * CombineFilters from merging later filters into this one and
    * PushDownPredicates from moving it below Project/Join — both legal
    * for deterministic predicates and both semantics-changing here.
    */
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    TopKMarker.parse(children) match {
      case scala.util.Left(msg) => TypeCheckFailure(msg)
      case scala.util.Right(spec) =>
        spec.k match {
          case Literal(_: Int, IntegerType) =>
          case other => return TypeCheckFailure(
            s"graft_topk: k must be an INT literal, got ${other.sql}")
        }
        spec.ords.map(_._1).find(e => !e.dataType.isInstanceOf[NumericType])
          .foreach { e => return TypeCheckFailure(
            s"graft_topk: ordering column ${e.sql} has type " +
              s"${e.dataType.simpleString}; numeric required") }
        if (!spec.tie.dataType.isInstanceOf[NumericType])
          return TypeCheckFailure(
            s"graft_topk: tie column ${spec.tie.sql} has type " +
              s"${spec.tie.dataType.simpleString}; numeric required")
        TypeCheckSuccess
    }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKMarker = copy(children = cs)
}

object TopKMarker {
  /** Parsed argument structure: ords carry (expr, descending?). */
  final case class Spec(k: Expression, ords: Seq[(Expression, Boolean)],
      tie: Expression, keys: Seq[Expression])

  private def dirOf(e: Expression): Option[Boolean] = e match {
    case Literal(s: UTF8String, t) if t.isInstanceOf[StringType] =>
      s.toString.toLowerCase match {
        case "desc" => Some(true)
        case "asc" => Some(false)
        case _ => None
      }
    case _ => None
  }

  /** Arity/structure guard with descriptive messages (ADVICE: a bad call
    * must die at analysis, not with an opaque planner require).
    *
    * Multi-column ordering REQUIRES a direction literal after EVERY
    * ordering column — `graft_topk(3, ord1, ord2, tie, key)` without
    * directions would silently parse as legacy single-ord (ord2 becomes
    * the tie, tie a key). Guard: a direction literal found anywhere past
    * the (ord, dir) prefix means a misplaced/omitted direction and fails
    * the call instead of reinterpreting it.
    */
  def parse(children: Seq[Expression]): Either[String, Spec] = {
    if (children.length < 3)
      return scala.util.Left("graft_topk needs at least (k, ord, tie [, keys...]); " +
        s"got ${children.length} argument(s)")
    val ords = mutable.Buffer.empty[(Expression, Boolean)]
    var i = 1
    while (i + 1 < children.length && dirOf(children(i + 1)).isDefined) {
      ords += ((children(i), dirOf(children(i + 1)).get))
      i += 2
    }
    if (ords.isEmpty) { ords += ((children(1), true)); i = 2 }
    if (i >= children.length)
      return scala.util.Left("graft_topk: missing tie column after the " +
        "(ord, 'asc'|'desc') pairs")
    val rest = children.drop(i)
    if (rest.exists(e => dirOf(e).isDefined))
      return scala.util.Left("graft_topk: found an 'asc'/'desc' literal in " +
        "a tie/key position — multi-column ordering requires a direction " +
        "literal after EVERY ordering column, e.g. graft_topk(k, ord1, " +
        "'desc', ord2, 'asc', tie, keys...)")
    scala.util.Right(Spec(children.head, ords.toSeq, rest.head, rest.tail))
  }
}

/** Logical top-k-per-key. Preserves the child's output unchanged.
  *
  * Ordering is modeled as PARALLEL fields (`ordExprs` + `ordDescending`),
  * never `Seq[(Expression, Boolean)]`: QueryPlan.expressions only
  * traverses product elements that are Expressions or Seqs of them —
  * tuples hide their contents, so with tupled ordering the node's
  * `references` would miss the ordering columns and ColumnPruning
  * (which runs in the SAME fixed-point batch as this node's rewrite via
  * the GraftExtensions injectOptimizerRule path) would prune them from
  * the child whenever the query doesn't project them. TopKSpec pins
  * expression visibility and the pruning behavior.
  */
case class TopKPerKey(keys: Seq[Expression], ordExprs: Seq[Expression],
    ordDescending: Seq[Boolean], tie: Expression, k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(ordExprs.length == ordDescending.length,
    "ordExprs and ordDescending must be parallel")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Rewrite `Filter(graft_topk(...), child)` → `TopKPerKey(child)`.
  *
  * Conjuncts sharing the marker's filter condition become a Filter UNDER
  * the top-k (same-condition conjuncts constrain the ranked input — the
  * documented contract). Cross-filter reordering cannot happen because
  * the marker is nondeterministic (see TopKMarker). After the rewrite,
  * any marker still left in the plan (under OR/NOT, in a projection, …)
  * fails with a descriptive error instead of dying later as Unevaluable.
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
    // Two markers ANDed in ONE condition have no defined composition
    // order (which top-k ranks first?) — and silently dropping the
    // second (the old headOption) returned wrong results with no error.
    // Sequential top-ks belong in separate .filter calls, which stack.
    if (markers.length > 1)
      throw new IllegalArgumentException(
        "graft_topk: multiple graft_topk markers in one filter condition " +
          "are ambiguous — chain separate .filter(...) calls instead " +
          "(each ranks the previous result)")
    (markers.headOption.map(_.asInstanceOf[TopKMarker]), rest)
  }

  private def asDouble(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)
  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transform {
      case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        split(cond) match {
          case (Some(m), rest) =>
            val base =
              if (rest.isEmpty) child
              else org.apache.spark.sql.catalyst.plans.logical.Filter(
                rest.reduce(And), child)
            val spec = TopKMarker.parse(m.children) match {
              case scala.util.Right(s) => s
              case scala.util.Left(msg) => throw new IllegalArgumentException(msg)
            }
            val k = spec.k match {
              case Literal(v: Int, IntegerType) => v
              case other => throw new IllegalArgumentException(
                s"graft_topk: k must be an INT literal, got $other")
            }
            TopKPerKey(spec.keys, spec.ords.map(p => asDouble(p._1)),
              spec.ords.map(_._2), asLong(spec.tie), k, base)
          case _ => f
        }
    }
    rewritten.foreach { node =>
      node.expressions.foreach { e =>
        if (e.exists(_.isInstanceOf[TopKMarker]))
          throw new IllegalArgumentException(
            "graft_topk must appear as a top-level conjunct of a filter " +
              "condition (WHERE a AND graft_topk(...)); it cannot sit " +
              "under OR/NOT or inside a projection: " + e.sql)
      }
    }
    rewritten
  }
}

/** Plan TopKPerKey as partial → (exchange inserted by EnsureRequirements)
  * → final, exactly the hash-aggregate shape.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ordExprs, ordDesc, tie, k, child) =>
      val partial = TopKPerKeyExec(keys, ordExprs, ordDesc, tie, k,
        partial = true, planLater(child))
      TopKPerKeyExec(keys, ordExprs, ordDesc, tie, k, partial = false,
        partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key. Partial phase runs on whatever partitioning
  * the child has (map-side cap); final phase requires clustering by the
  * keys — EnsureRequirements inserts the hash exchange, which then only
  * carries the partial survivors. With NO keys the final phase requires
  * AllTuples (one partition): global top-k over the ≤ k-per-partition
  * partial survivors, never over the full table.
  */
case class TopKPerKeyExec(keys: Seq[Expression], ordExprs: Seq[Expression],
    ordDescending: Seq[Boolean], tie: Expression, k: Int,
    partial: Boolean, child: SparkPlan)
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
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExprList = ordExprs
    val descDirs = ordDescending.toArray
    val nOrd = descDirs.length
    val tieExpr = tie
    val kk = k
    val isPartial = partial
    val flushAt = flushKeys
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(ordExprList :+ tieExpr, childOutput)
      // dequeue yields the WORST kept row: per ordering column, desc means
      // larger-is-better (so smaller sorts toward the head), asc the
      // reverse; ties break toward the larger tie value being worse.
      val worstFirst = new Ordering[(Array[Double], Long, InternalRow)] {
        override def compare(a: (Array[Double], Long, InternalRow),
            b: (Array[Double], Long, InternalRow)): Int = {
          var i = 0
          while (i < nOrd) {
            val c = java.lang.Double.compare(a._1(i), b._1(i))
            if (c != 0) return if (descDirs(i)) -c else c
            i += 1
          }
          java.lang.Long.compare(a._2, b._2)
        }
      }
      new Iterator[InternalRow] {
        private val heaps =
          mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Array[Double], Long, InternalRow)]]
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
            // NULLS LAST per column: a NULL ranks below every non-NULL
            // value of its column, encoded as the "worst" sentinel for
            // the column's direction (desc: -Inf, asc: +Inf). Rows are
            // never dropped — ties among NULLs fall through to the
            // remaining columns and the tie, matching
            // desc_nulls_last/asc_nulls_last window ordering.
            val o = new Array[Double](nOrd)
            var i = 0
            while (i < nOrd) {
              o(i) =
                if (ot.isNullAt(i)) {
                  if (descDirs(i)) Double.NegativeInfinity
                  else Double.PositiveInfinity
                } else ot.getDouble(i)
              i += 1
            }
            val t = if (ot.isNullAt(nOrd)) 0L else ot.getLong(nOrd)
            val key = keyProj(row)
            val heap = heaps.get(key) match {
              case Some(h) => h
              case None =>
                val h = mutable.PriorityQueue
                  .empty[(Array[Double], Long, InternalRow)](worstFirst)
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
          if (out.isEmpty && heaps.nonEmpty) out = drain()
        }

        override def hasNext: Boolean = { if (out.isEmpty) fill(); out.hasNext }
        override def next(): InternalRow = { if (out.isEmpty) fill(); out.next() }
      }
    }
  }
}
