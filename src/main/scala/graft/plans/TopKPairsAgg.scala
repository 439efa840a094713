package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `topk_pairs(key, payload, k)` keeps,
  * per group, the k (key, payload) LONG pairs with the largest keys
  * (ties broken by SMALLEST payload — a total order, so the result is
  * deterministic and oracle-comparable) and returns them as an array
  * of `{k, v}` structs sorted (key desc, payload asc).
  *
  * This is the aggregation-shaped answer to "top N per group". The
  * window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * key DESC)` then `rn <= k`) shuffles and SORTS every input row on
  * the group key before discarding all but k per group; at 100 TB the
  * exchange carries the whole fact table. A TypedImperativeAggregate
  * instead runs as ObjectHashAggregate with a PARTIAL pass on the map
  * side: each mapper reduces its slice to at most k pairs per group
  * (O(k) heap state), and only those survivors cross the wire —
  * shuffle volume is `groups × k × 16 bytes` per mapper, independent
  * of input row count, and nothing is ever globally sorted.
  *
  * The heap is a classic binary min-heap rooted at the WORST kept
  * pair (smallest key, then largest payload), so admission is an O(1)
  * compare against the root and eviction is O(log k); merge re-offers
  * the other buffer's pairs. State serializes as `4 + 16k` bytes
  * (count + packed longs) for spill/exchange.
  *
  * LONG/LONG by contract: ranking keys reduce to integers in this
  * engine anyway (cents, ppm, epoch micros — the exactness recipes
  * used registry-wide), and a monomorphic buffer keeps update() free
  * of boxing and ordering dispatch. Registered via [[GraftExtensions]]
  * as `topk_pairs(keyLong, payloadLong, kLiteral)`.
  */
case class TopKPairsAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Heap] {

  require(k >= 1 && k <= 1000000,
    s"topk_pairs k must be in 1..1000000, got $k")

  override def children: Seq[Expression] = Seq(key, payload)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = key.dataType == LongType && payload.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (BIGINT, BIGINT), got " +
        s"${key.dataType.catalogString}, ${payload.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKPairsAgg.Heap =
    new TopKPairsAgg.Heap(k)

  override def update(buf: TopKPairsAgg.Heap,
                      input: InternalRow): TopKPairsAgg.Heap = {
    val kv = key.eval(input)
    if (kv != null) {
      val pv = payload.eval(input)
      if (pv != null) buf.offer(kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKPairsAgg.Heap,
                     other: TopKPairsAgg.Heap): TopKPairsAgg.Heap = {
    var i = 0
    while (i < other.size) {
      buf.offer(other.keys(i), other.vals(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKPairsAgg.Heap): Any = {
    val idx = Array.range(0, buf.size).sortWith { (a, b) =>
      if (buf.keys(a) != buf.keys(b)) buf.keys(a) > buf.keys(b)
      else buf.vals(a) < buf.vals(b)
    }
    new GenericArrayData(idx.map(i =>
      InternalRow(buf.keys(i), buf.vals(i)): Any))
  }

  override def serialize(buf: TopKPairsAgg.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.keys(i)); bb.putLong(buf.vals(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKPairsAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(key = newChildren(0), payload = newChildren(1))

  override def prettyName: String = "topk_pairs"
}

object TopKPairsAgg {

  /** Min-heap rooted at the worst kept pair under the total order
    * (key desc, payload asc): `worse(a, b)` ⇔ a ranks strictly below
    * b, i.e. smaller key, or equal key and larger payload.
    */
  final class Heap(capacity: Int) {
    var keys: Array[Long] = new Array[Long](capacity)
    var vals: Array[Long] = new Array[Long](capacity)
    var size: Int = 0

    @inline private def worse(k1: Long, v1: Long, k2: Long, v2: Long): Boolean =
      k1 < k2 || (k1 == k2 && v1 > v2)

    def offer(k: Long, v: Long): Unit = {
      if (size < capacity) {
        // grow phase: append and sift up
        var i = size
        keys(i) = k; vals(i) = v
        size += 1
        while (i > 0) {
          val p = (i - 1) >> 1
          if (worse(keys(i), vals(i), keys(p), vals(p))) {
            swap(i, p); i = p
          } else return
        }
      } else if (worse(keys(0), vals(0), k, v)) {
        // full and better than the current worst: replace root, sift down
        keys(0) = k; vals(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < size && worse(keys(l), vals(l), keys(m), vals(m))) m = l
          if (r < size && worse(keys(r), vals(r), keys(m), vals(m))) m = r
          if (m == i) done = true
          else { swap(i, m); i = m }
        }
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val tk = keys(a); keys(a) = keys(b); keys(b) = tk
      val tv = vals(a); vals(a) = vals(b); vals(b) = tv
    }
  }
}
