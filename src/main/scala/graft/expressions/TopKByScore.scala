package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k as a native Catalyst aggregate
  * (`graft_topk(score, id, k)`) — the scale-safe alternative to the
  * window form (q55's `row_number` over a per-group sort) when a group
  * can be enormous: aggregation state is O(k) per group, the partial
  * buffers combine map-side like any aggregate, and no executor ever
  * sorts (or even holds) a whole group. At 100 TB, "top 3 docs per
  * domain" over a single-domain crawl is the difference between one
  * partition sorting the corpus and k rows per map task.
  *
  * Semantics — a STATED total order, no engine luck: rank by score
  * descending, ties broken by the lower id (the engine's canonical
  * tie rule). Rows with a null score or id are skipped. The result is
  * the sorted array<struct<score, id>>, best first — deterministic under
  * any partitioning because the kept set is the k maxima of a total
  * order and the final sort is over exactly those k.
  *
  * The buffer is a k-bounded min-heap keyed by "worst kept first", so
  * update is O(log k) and merge O(k log k); serialization is the plain
  * (n, pairs...) byte form Spark's TypedImperativeAggregate contract
  * requires for partial-aggregate shuffles.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, kExpr.dataType) match {
      case (DoubleType, LongType, IntegerType) if kExpr.foldable =>
        // A foldable null (lit(null).cast("int")) must be a clean
        // TypeCheckFailure, not an NPE from the lazy `k` during analysis.
        if (kExpr.eval() == null)
          TypeCheckResult.TypeCheckFailure("graft_topk: k must be a non-null literal")
        else if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"graft_topk: k must be >= 1, got $k")
      case (DoubleType, LongType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure("graft_topk: k must be a literal")
      case (s, i, kk) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk requires (double, bigint, int) arguments, got ($s, $i, $kk)")
    }

  @transient private lazy val k: Int =
    kExpr.eval().asInstanceOf[Number].intValue()

  private def WorstFirst = TopKByScore.WorstFirst

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](WorstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Long)],
      item: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(item)
    else if (WorstFirst.compare(item, buf.head) < 0) { // item beats the worst kept
      buf.dequeue(); buf.enqueue(item)
    }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      push(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // WorstFirst orders "better" elements FIRST under ascending sort (a
    // better element compares less-than a worse one), so no reverse here
    val sorted = buf.toArray.sorted(WorstFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

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
  /** The aggregate's total order, "worse first": lower score is worse;
    * at equal score the higher id is worse. A better element compares
    * LESS-THAN a worse one, so an ascending sort is best-first and a
    * max-priority-queue's head is the worst kept element. Shared with the
    * streaming tracker twin so the two cannot drift. */
  object WorstFirst extends Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}
