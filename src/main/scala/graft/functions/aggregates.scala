package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) pairs, worst at heap head
  * for O(log k) eviction. Better = higher score, ties broken by lower id. */
final class TopKBuffer(val k: Int) {
  private val worstFirst = Ordering.by((t: (Double, Long)) => (-t._1, t._2))
  val heap: scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty(worstFirst)

  def add(score: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wi) = heap.head
      if (score > ws || (score == ws && id < wi)) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }

  /** Best-first. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy(t => (-t._1, t._2))
}

/** Native top-k aggregate — the Spark-idiomatic analogue of the reference's
  * dedicated TopK physical operator
  * (/root/reference/datafusion/physical-plan/src/topk/mod.rs). `topk_pairs(
  * score, id, k)` keeps the k highest-score (score, id) pairs in a bounded
  * heap, returned best-first as array<struct<score,id>>.
  *
  * Being an AGGREGATE is the whole point: Spark's partial-aggregation
  * machinery makes the map side emit at most k rows per (partition, group) —
  * per-partition top-k with zero extra code — and the shuffle then carries
  * only those k-row heaps, never the full scored set. groupBy(qid) +
  * topk_pairs + posexplode therefore replaces the row_number window whose
  * single-partition-per-qid sort was the round-1 scale-killer, and there is
  * no O(corpus) state anywhere: memory is O(k) per group on every path. */
case class TopKPairs(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"topk_pairs k: $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType || id.dataType != LongType ||
        !Seq[DataType](IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs(double, bigint, int) got ${score.dataType}, " +
          s"${id.dataType}, ${kExpr.dataType}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_pairs k must be a literal")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk_pairs k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val arr = buf.sorted
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
