package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom AGGREGATE expressions — mergeable bounded state evaluated with
  * map-side partial aggregation, for the per-group reductions Spark can
  * only express through a window (which forces a full sort shuffle of
  * every row in every group).
  *
  * The flagship is [[LongTopK]]: per-group top-k selection whose
  * aggregation buffer is a k-entry binary heap. `row_number() OVER
  * (PARTITION BY key ORDER BY ord DESC)` shuffles and SORTS the whole
  * group — at 100 TB with a handful of hot keys that is the entire corpus
  * through a sort per key. The heap aggregate ships at most k entries per
  * (key, map partition) across the exchange and never sorts more than k
  * elements anywhere: the reduction is associative/commutative, so
  * Catalyst plans the standard partial → final ObjectHashAggregate pair
  * and the shuffle volume is `min(rows, k · partitions · keys)` instead of
  * `rows`.
  */
object AggExpressions {

  /** Top-k `(ord, id)` pairs per group, ordered by `(ord DESC, id ASC)` —
    * the deterministic tie-break makes the kept set total (equal to the
    * window `row_number ... ORDER BY ord DESC, id ASC <= k` rule exactly,
    * which is what the DuckDB oracle replays). Rows with a NULL ord or id
    * are skipped. Returns `array<struct<ord: long, id: long>>`, best
    * first.
    */
  def longTopK(ord: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      LongTopK(GraftColumnBridge.expression(ord), GraftColumnBridge.expression(id), k)
        .toAggregateExpression())
}

/** Bounded top-k state: a k-entry binary min-heap on the KEEP order, so
  * the root is always the WORST entry currently kept and a full buffer
  * admits a new entry with one O(log k) sift. Entry A outranks B iff
  * `A.ord > B.ord || (A.ord == B.ord && A.id < B.id)` — total, so the
  * result is independent of partitioning and merge order.
  */
final class TopKHeap(val k: Int) {
  val ords = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true iff (o1, i1) is strictly WORSE than (o2, i2) in keep order. */
  private def worse(o1: Long, i1: Long, o2: Long, i2: Long): Boolean =
    o1 < o2 || (o1 == o2 && i1 > i2)

  def insert(ord: Long, id: Long): Unit =
    if (size < k) {
      var i = size
      ords(i) = ord; ids(i) = id; size += 1
      while (i > 0 && worse(ords(i), ids(i), ords((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (worse(ords(0), ids(0), ord, id)) {
      ords(0) = ord; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var w = i // index of the worst of {i, l, r}
        if (l < size && worse(ords(l), ids(l), ords(w), ids(w))) w = l
        if (r < size && worse(ords(r), ids(r), ords(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

  private def swap(i: Int, j: Int): Unit = {
    val o = ords(i); ords(i) = ords(j); ords(j) = o
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }
}

case class LongTopK(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "long_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) {
      TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    } else if (ord.dataType != LongType || id.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"long_top_k needs (bigint, bigint), got (${ord.dataType.sql}, ${id.dataType.sql})")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      buffer.insert(o.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.ords(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    // best-first: sort the <= k survivors by keep order (the only sort in
    // the whole operator, and it is k elements on the reduce side)
    val idx = (0 until buffer.size).sortBy(i => (-buffer.ords(i), buffer.ids(i)))
    new GenericArrayData(
      idx.map(i => InternalRow(buffer.ords(i), buffer.ids(i))).toArray[Any])
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.ords(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // entries re-inserted, not memcpy'd: heap shape is an invariant of
    // insert order, but the kept SET is not, so this stays exact
    while (i < n) { val o = bb.getLong(); val d = bb.getLong(); heap.insert(o, d); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LongTopK =
    copy(ord = newChildren(0), id = newChildren(1))
}
