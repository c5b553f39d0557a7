package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-heap kept by [[TopKByScore]]: the k best (score DESC, id
  * ASC) entries seen so far. Head of the heap is the WEAKEST kept entry —
  * a candidate enters only by beating it, so update is O(log k) and the
  * buffer never exceeds k entries. */
final class TopKHeap(val k: Int) {
  // weakest-first ordering: lower score first; on ties HIGHER id first
  // (a higher id loses the tie under the score-desc/id-asc output order)
  private[functions] val q = new java.util.PriorityQueue[Array[Any]](
    math.max(k, 1),
    (a: Array[Any], b: Array[Any]) => {
      val c = java.lang.Double.compare(
        a(0).asInstanceOf[Double], b(0).asInstanceOf[Double])
      if (c != 0) c
      else java.lang.Long.compare(
        b(1).asInstanceOf[Long], a(1).asInstanceOf[Long])
    })

  def offer(score: Double, id: Long): Unit = {
    if (q.size < k) q.add(Array[Any](score, id))
    else {
      val head = q.peek()
      val hs = head(0).asInstanceOf[Double]
      val hid = head(1).asInstanceOf[Long]
      if (score > hs || (score == hs && id < hid)) {
        q.poll()
        q.add(Array[Any](score, id))
      }
    }
  }

  /** Entries best-first: score DESC, id ASC — the row_number order. */
  def sorted: Array[Array[Any]] = {
    val out = q.toArray(new Array[Array[Any]](q.size))
    java.util.Arrays.sort(out, (a: Array[Any], b: Array[Any]) => {
      val c = java.lang.Double.compare(
        b(0).asInstanceOf[Double], a(0).asInstanceOf[Double])
      if (c != 0) c
      else java.lang.Long.compare(
        a(1).asInstanceOf[Long], b(1).asInstanceOf[Long])
    })
    out
  }
}

/** Top-k-per-group as a TypedImperativeAggregate — the scale-correct
  * replacement for `row_number().over(partitionBy(key).orderBy(score
  * desc)) <= k` when k ≪ group size.
  *
  * The window form shuffles EVERY scored row to its key's partition and
  * sorts there: for an ANN query scoring an N×M candidate grid the
  * exchange moves N·M rows. This aggregate runs inside
  * ObjectHashAggregate with map-side partial aggregation: each map task
  * keeps a k-bounded heap per key, so the exchange moves at most
  * k·keys·tasks pre-combined entries and there is no sort at all —
  * the asymptotic difference between "shuffle the candidate grid" and
  * "shuffle the answers".
  *
  * Output: `array<struct<score double, id bigint>>`, best-first with the
  * exact row_number tie order (score DESC, id ASC) — downstream
  * `posexplode` reproduces (value, rank) bit-identically to the window
  * plan, so oracle hashes are unchanged. Null score or id contributes
  * nothing (row_number parity: NULLS LAST would rank them past k for any
  * real k; documented contract here is skip).
  */
case class TopKByScore(
    left: Expression, // score (double)
    right: Expression, // id (long)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  // analysis-time type check: without it a non-(double, long) call (an
  // INT id column, say) passes analysis and dies mid-job with a
  // ClassCastException inside update() on executors
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_score expects (DOUBLE score, BIGINT id), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}) — " +
        "cast the arguments explicitly")
  }

  override def prettyName: String = "topk_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    val it = other.q.iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.offer(e(0).asInstanceOf[Double], e(1).asInstanceOf[Long])
    }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map(e =>
      InternalRow(e(0).asInstanceOf[Double], e(1).asInstanceOf[Long])))

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val entries = buffer.sorted
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { e =>
      bb.putDouble(e(0).asInstanceOf[Double])
      bb.putLong(e(1).asInstanceOf[Long])
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKByScore {
  /** Column API: the k best (score, id) pairs per group, best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftSqlShim.column(
      TopKByScore(GraftSqlShim.expression(score),
        GraftSqlShim.expression(id), k).toAggregateExpression())
}
