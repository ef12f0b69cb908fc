package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The LSH similarity-join operator as a Catalyst expression + optimizer
  * rule (the §2.10/§4 custom-surface: Expression + Rule[LogicalPlan],
  * injected via GraftExtensions or `spark.experimental.extraOptimizations`).
  *
  * `graft_lsh_match(a, b, t)` is TRUE iff a and b fall in the same
  * 4-bit sign-hyperplane bucket AND cosine(a, b) >= t. It is an ordinary
  * boolean expression — evaluable per row pair, so a query using it is
  * CORRECT on any Spark — but as a bare join condition it forces a
  * nested-loop join (no equi-keys). LshJoinRewrite rewrites it into
  *   bucket(a) = bucket(b) AND cosine(a, b) >= t
  * which is semantically IDENTICAL (bucket equality is exactly what the
  * match tests first) and lets ExtractEquiJoinKeys plan a hash/sort-merge
  * join on the bucket key: O(n²) → O(n) + per-bucket refinement. That is
  * the entire 100 TB story of this operator in one rule.
  */
object LshVectors {
  /** Deterministic hyperplane weight (shared with Similarity's SQL oracle):
    * plane p, dim d → ((p·97 + d·31 + 13) mod 17) − 8.
    */
  @inline def weight(p: Int, d: Int): Double = (p * 97 + d * 31 + 13) % 17 - 8

  def bucketOf(v: ArrayData): UTF8String = {
    val n = v.numElements()
    val bits = new Array[Char](4)
    var p = 0
    while (p < 4) {
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getFloat(d).toDouble * weight(p, d); d += 1 }
      bits(p) = if (dot > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(bits))
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** dot(float vector, double vector) — sequential left-to-right double
    * fold, bit-identical to the HOF `aggregate(zip_with(e, c, (x,y) ->
    * CAST(x AS DOUBLE) * y))` it replaces in the centroid-assignment
    * paths (the centroid side is a plan-literal array<double>; the
    * corpus side array<float>).
    */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }

  /** Byte-wise hamming distance of two ASCII sketch strings ('0'/'1'
    * bit strings, hex bands). Exact for the single-byte alphabets the
    * sketch columns use; extra positions of the longer string each count
    * one mismatch (the zip_with-pad semantics this replaces).
    */
  def hamming(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes; val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var d = math.abs(ab.length - bb.length)
    var i = 0
    while (i < n) { if (ab(i) != bb(i)) d += 1; i += 1 }
    d
  }
}

/** 4-bit sign-LSH bucket key of an array<float> column.
  *
  * Fully codegen'd (a static call into [[LshVectors]], not a fallback):
  * this expression is a JOIN KEY after [[LshJoinRewrite]], and a
  * CodegenFallback there would break the surrounding WholeStageCodegen
  * stage for every probe.
  */
case class LshBucket(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    LshVectors.bucketOf(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LshVectors.bucketOf($c)")
  override protected def withNewChildInternal(c: Expression): LshBucket =
    copy(child = c)
}

/** cosine(a, b) over two array<float> columns. Codegen'd like
  * [[LshBucket]] — it is the post-probe refinement predicate of the
  * similarity join, evaluated once per candidate pair on the hot path.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LshVectors.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.LshVectors.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Hamming distance of two ASCII hash-sketch strings. Codegen'd like
  * [[CosineSim]] — it is the verification step of the banded
  * simhash/dhash candidate joins, evaluated once per candidate pair on
  * the hot path; the HOF form it replaces (split both strings, zip_with,
  * fold) allocated two 64-element arrays per pair.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LshVectors.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.LshVectors.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
    copy(left = l, right = r)
}

/** dot(array<float>, array<double>) — the centroid-assignment kernel.
  * Codegen'd like [[CosineSim]]; the corpus side is float embeddings,
  * the centroid side a plan-literal double vector, and the IVF argmax
  * evaluates it k times per corpus row.
  */
case class DotFloatDouble(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LshVectors.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.LshVectors.dotFD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFloatDouble =
    copy(left = l, right = r)
}

/** Marker predicate: same bucket AND cosine >= threshold. Row-wise
  * evaluable (correct everywhere); the rewrite rule makes it fast.
  */
case class LshMatch(left: Expression, right: Expression, threshold: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = threshold
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val av = a.asInstanceOf[ArrayData]; val bv = b.asInstanceOf[ArrayData]
    LshVectors.bucketOf(av) == LshVectors.bucketOf(bv) &&
      LshVectors.cosine(av, bv) >= t.asInstanceOf[Double]
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): LshMatch = copy(left = f, right = s, threshold = t)
}

/** Rewrite `graft_lsh_match(a, b, t)` →
  * `LshBucket(a) = LshBucket(b) AND CosineSim(a, b) >= t`.
  * Runs in the optimizer, before join planning: the equality conjunct has
  * one side referencing each join child, so ExtractEquiJoinKeys turns the
  * nested-loop join into a hash/sort-merge join keyed on the bucket.
  */
object LshJoinRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LshMatch(l, r, t) =>
        And(EqualTo(LshBucket(l), LshBucket(r)),
          GreaterThanOrEqual(CosineSim(l, r), t))
    }
}
