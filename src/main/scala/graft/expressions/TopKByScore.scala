package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap per-group top-k as a native Catalyst aggregate
  * (`graft_topk(score, id, k)`) — the scale-safe alternative to the
  * window form (q55's `row_number` over a per-group sort) when a group
  * can be enormous: aggregation state is O(k) per group, the partial
  * buffers combine map-side like any aggregate, and no executor ever
  * sorts (or even holds) a whole group. At 100 TB, "top 3 docs per
  * domain" over a single-domain crawl is the difference between one
  * partition sorting the corpus and k rows per map task.
  *
  * Input generality: `score` is any numeric type (int counts, float
  * qualities, decimals — widened to double in the buffer, so the
  * result's `score` field is always double); `id` is `bigint` OR
  * `string` (real quota keys are often URLs or terms, not synthetic
  * longs). `k` must be a non-null positive int literal.
  *
  * Semantics — a STATED total order, no engine luck: rank by score
  * descending, ties broken by the lower id (numeric order for bigint
  * ids, binary UTF-8 order — Spark's own string `<` — for string ids).
  * Rows with a null score or id are skipped. The result is the sorted
  * array<struct<score, id>>, best first — deterministic under any
  * partitioning because the kept set is the k maxima of a total order
  * and the final sort is over exactly those k.
  *
  * The buffer is a k-bounded min-heap keyed by "worst kept first", so
  * update is O(log k) and merge O(k log k); serialization is the plain
  * (n, pairs...) byte form Spark's TypedImperativeAggregate contract
  * requires for partial-aggregate shuffles. String ids are cloned out
  * of the input row on store — Spark reuses the unsafe-row buffer an
  * evaluated UTF8String points into, so retaining it across rows
  * without the copy would corrupt the heap.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]] {

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, kExpr.dataType) match {
      case (_: NumericType, LongType | StringType, IntegerType) if kExpr.foldable =>
        // A foldable null (lit(null).cast("int")) must be a clean
        // TypeCheckFailure, not an NPE from the lazy `k` during analysis.
        if (kExpr.eval() == null)
          TypeCheckResult.TypeCheckFailure("graft_topk: k must be a non-null literal")
        else if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"graft_topk: k must be >= 1, got $k")
      case (_: NumericType, LongType | StringType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure("graft_topk: k must be a literal")
      case (s, i, kk) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk requires (numeric, bigint|string, int) arguments, got ($s, $i, $kk)")
    }

  @transient private lazy val k: Int =
    kExpr.eval().asInstanceOf[Number].intValue()

  /** Tie order over the id representation the buffer actually holds:
    * Long for bigint ids, UTF8String (binary UTF-8 compare — identical
    * to Spark's string ordering) for string ids. Lower id = better. */
  @transient private lazy val idOrd: Ordering[Any] = id.dataType match {
    case LongType => new Ordering[Any] {
      override def compare(a: Any, b: Any): Int =
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    }
    case StringType => new Ordering[Any] {
      override def compare(a: Any, b: Any): Int =
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    }
    case other => throw new IllegalStateException(s"graft_topk id type $other")
  }

  /** "Worse first": lower score is worse; at equal score the higher id
    * is worse. A better element compares LESS-THAN a worse one, so an
    * ascending sort is best-first and a max-priority-queue's head is the
    * worst kept element. The (Double, Long) specialization is
    * [[TopKByScore.WorstFirst]], shared with the streaming tracker twin
    * so the two cannot drift. */
  @transient private lazy val worstFirst: Ordering[(Double, Any)] =
    new Ordering[(Double, Any)] {
      override def compare(a: (Double, Any), b: (Double, Any)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else idOrd.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty[(Double, Any)](worstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Any)],
      item: (Double, Any)): Unit =
    if (buf.size < k) buf.enqueue(item)
    else if (worstFirst.compare(item, buf.head) < 0) { // item beats the worst kept
      buf.dequeue(); buf.enqueue(item)
    }

  override def update(buf: mutable.PriorityQueue[(Double, Any)],
      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val d = s match {
        case dec: Decimal => dec.toDouble
        case n: Number => n.doubleValue()
      }
      // UTF8String from eval points into a reused row buffer — copy it.
      val key = i match {
        case u: UTF8String => u.clone()
        case other => other
      }
      push(buf, (d, key))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Any)],
      other: mutable.PriorityQueue[(Double, Any)]): mutable.PriorityQueue[(Double, Any)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Any)]): Any = {
    // worstFirst orders "better" elements FIRST under ascending sort (a
    // better element compares less-than a worse one), so no reverse here
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) =>
      out.writeDouble(s)
      i match {
        case l: Long => out.writeLong(l)
        case u: UTF8String =>
          val b = u.getBytes
          out.writeInt(b.length); out.write(b)
      }
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val stringId = id.dataType == StringType
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val s = in.readDouble()
      val key: Any =
        if (stringId) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        } else in.readLong()
      buf.enqueue((s, key))
      j += 1
    }
    buf
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", id.dataType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKByScore {
  /** The aggregate's total order specialized to (double, bigint),
    * "worse first": lower score is worse; at equal score the higher id
    * is worse. A better element compares LESS-THAN a worse one, so an
    * ascending sort is best-first and a max-priority-queue's head is the
    * worst kept element. Shared with the streaming tracker twin so the
    * two cannot drift. */
  object WorstFirst extends Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}
