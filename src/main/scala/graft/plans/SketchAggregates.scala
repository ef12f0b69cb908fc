package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter candidate sketch as a native
  * `TypedImperativeAggregate` — the mergeable-summary shape every
  * production frequency sketch (CMS, MG, SpaceSaving) takes on Spark:
  * each task maintains a BOUNDED buffer (≤ k counters), partial buffers
  * serialize into the shuffle, and `merge` combines them with the
  * Agarwal et al. mergeable-summaries rule (sum counters pairwise, then
  * subtract the (k+1)-th largest count and drop non-positive ones), so
  * driver and shuffle traffic are O(k) per partition regardless of key
  * cardinality — the whole point versus an exact groupBy whose shuffle
  * carries the full domain.
  *
  * Guarantee (and the ONLY deterministic contract): every key with true
  * frequency > n/k survives to the output candidate list. Which OTHER
  * keys ride along depends on partitioning and merge order, so callers
  * that need a deterministic result must re-verify candidates with an
  * exact filtered count — see `operators.Profiling.dqHeavyHitters` for
  * the two-pass pattern. Candidates are emitted sorted for stable
  * explode order.
  *
  * Null inputs are skipped (SQL aggregate convention). The buffer is a
  * plain String-keyed map: values are copied out of Spark's reused
  * UTF8String row buffers at update time, which a buffer holding
  * UTF8String references directly would corrupt.
  */
case class MisraGriesCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(k >= 2 && k <= 65536, s"sketch size k=$k out of range [2, 65536]")

  // Analysis-time contract: the tracked column must be STRING (ADVICE
  // r8 — an unconditional UTF8String cast in update() turned a
  // non-string child into a runtime ClassCastException mid-job).
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // classic MG decrement: the unseen key and every tracked key
          // each give up one count; zeroed counters free their slot
          for ((key, c) <- buf.toList) {
            if (c == 1L) buf.remove(key) else buf.update(key, c - 1L)
          }
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((key, c) <- b2) b1.update(key, b1.getOrElse(key, 0L) + c)
    if (b1.size > k) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - k - 1) // (k+1)-th largest
      for ((key, c) <- b1.toList) {
        if (c <= sub) b1.remove(key) else b1.update(key, c - sub)
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.keys.toArray.sorted
      .map(UTF8String.fromString(_).asInstanceOf[Any]))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesCandidates =
    copy(child = c)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_mg_candidates"
}

object MisraGriesCandidates {
  /** Validated construction from SQL call args `(k, col)` — every
    * registration site routes through here so a long/column/null k
    * fails at resolution time with a usable message instead of a raw
    * ClassCastException from `eval().asInstanceOf[Int]` (ADVICE r8).
    */
  def fromArgs(exprs: Seq[Expression]): MisraGriesCandidates = {
    require(exprs.length == 2,
      s"graft_mg_candidates expects 2 arguments (k INT, col STRING), " +
        s"got ${exprs.length}")
    val kExpr = exprs.head
    require(kExpr.foldable && kExpr.dataType == IntegerType,
      "graft_mg_candidates: k must be a foldable INT literal (e.g. 64), " +
        s"got ${kExpr.dataType.simpleString} expression ${kExpr.sql}")
    val k = kExpr.eval()
    require(k != null, "graft_mg_candidates: k must not be NULL")
    MisraGriesCandidates(exprs(1), k.asInstanceOf[Int])
  }
}
