package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Misra–Gries frequent-items sketch: `freq_items(item, k)` keeps at
  * most k counters and GUARANTEES that every item with true frequency
  * > n/(k+1) survives — under any partitioning and any merge order
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS 2012). Returns the surviving (item, lower-bound
  * count) pairs sorted (count desc, item asc).
  *
  * This is the FIRST pass of the two-pass exact heavy-hitter pattern:
  * MG reduces an unbounded-cardinality stream to ≤ k candidates with
  * O(k) state per mapper (a plain groupBy-count would shuffle every
  * distinct item — at 100 TB the distinct-token space IS the data);
  * the second pass semi-joins the raw stream against the k candidates
  * and counts exactly, so the final answer carries no sketch error.
  * Individual counter VALUES may vary with merge order (only the
  * guarantee is order-free), which is why the registered queries
  * never expose raw MG counts — they gate the exact second pass.
  *
  * Update is the textbook algorithm: increment a live counter, else
  * occupy a free slot, else decrement ALL counters by 1 (amortized
  * O(1): each decrement cancels one prior increment). Merge sums
  * counters, then subtracts the (k+1)-largest combined count from
  * every survivor — the canonical mergeable-summaries reduction.
  *
  * LONG items by contract (hash wide values first — a hash collision
  * only merges two counters UPWARD, so no true heavy hitter is ever
  * lost); state serializes as 4 + 16·|counters| bytes.
  */
case class MisraGriesAgg(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k >= 1 && k <= 100000, s"freq_items k must be in 1..100000, got $k")

  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (item.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"freq_items requires BIGINT, got ${item.dataType.catalogString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val it = v.asInstanceOf[Long]
      buf.get(it) match {
        case Some(c) => buf.update(it, c + 1L)
        case None if buf.size < k => buf.update(it, 1L)
        case None =>
          // all k counters live and the item is new: decrement every
          // counter (this increment and k decrements cancel k+1
          // stream occurrences — the source of the n/(k+1) bound)
          val dead = mutable.ArrayBuffer.empty[Long]
          buf.foreachEntry { (key, c) =>
            if (c <= 1L) dead += key else buf.update(key, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
                     other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    // canonical mergeable-summaries reduction: sum counters, then if
    // more than k survive, subtract the (k+1)-largest count from all
    other.foreachEntry { (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - k - 1) // (k+1)-largest
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (key, c) =>
        if (c <= pivot) dead += key else buf.update(key, c - pivot)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val entries = buf.toArray // (item, cnt)
    val sorted = entries.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1 < b._1
    }
    new GenericArrayData(sorted.map { case (it, c) =>
      InternalRow(it, c): Any
    })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (key, c) => bb.putLong(key); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(item = newChildren(0))

  override def prettyName: String = "freq_items"
}
