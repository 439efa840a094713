package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd shingle-set primitives for exact n-gram Jaccard at scale.
  *
  * `packed_shingles(text, n)` packs each distinct character n-gram
  * (n ≤ 8) of the normalized input into ONE long — byte-per-char,
  * big-endian — and returns the SORTED distinct array. The packing is
  * bijective for the normalizeText alphabet ([a-z0-9 ], all ≥ 0x20):
  * a k-byte pack is always numerically below any (k+1)-byte pack, so
  * distinct shingles (even the short-text whole-string shingle) map
  * to distinct longs and |∩| / |∪| over the packed sets equals the
  * same counts over the string sets, bit-for-bit.
  *
  * `jaccard_sorted(a, b)` intersects two such sorted long arrays with
  * a two-pointer merge — no per-pair hash-set allocation, which is
  * what makes the all-pairs-in-block string formulation quadratic in
  * practice (array_intersect builds a hash set per PAIR; this walks
  * two long arrays).
  */
case class PackedShingles(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  require(shingleSize >= 1 && shingleSize <= 8,
    "packed shingles fit 8 bytes max")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"packed_shingles requires STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PackedShingles.compute(input.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.PackedShingles.compute($c, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): PackedShingles =
    copy(child = newChild)

  override def prettyName: String = "packed_shingles"
}

object PackedShingles {
  /** Static hot loop: pack, dedupe, sort. */
  def compute(s: UTF8String, shingleSize: Int): ArrayData = {
    val str = s.toString
    // mirror TextDedup.shingleExpr: greatest(len - (n-1), 1) shingles,
    // short texts contribute their whole self
    val count = math.max(str.length - (shingleSize - 1), 1)
    val raw = new Array[Long](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + shingleSize, str.length)
      var acc = 0L
      var j = i
      while (j < end) { acc = (acc << 8) | (str.charAt(j) & 0xff); j += 1 }
      raw(i) = acc
      i += 1
    }
    java.util.Arrays.sort(raw)
    // distinct on the sorted array in place
    var n = 0
    var k = 0
    while (k < count) {
      if (k == 0 || raw(k) != raw(k - 1)) { raw(n) = raw(k); n += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, n))
  }
}

case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted requires two ARRAY<BIGINT>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.JaccardSorted.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

/** Two-pointer intersection COUNT over two sorted distinct long
  * arrays — the shared primitive under both resemblance (Jaccard, see
  * [[JaccardSorted]]) and containment C(A,B) = |A∩B| / min(|A|,|B|)
  * (Broder 1997 distinguishes the two). Exposed separately so the
  * containment join can normalize by the smaller set without paying a
  * second merge walk or a per-pair hash set.
  */
case class OverlapSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"overlap_sorted requires two ARRAY<BIGINT>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    OverlapSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.OverlapSorted.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OverlapSorted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "overlap_sorted"
}

object OverlapSorted {
  /** Two-pointer intersection count over sorted distinct long arrays. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

object JaccardSorted {
  /** Two-pointer intersection count over sorted distinct long arrays. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0 // both empty: identical sets
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }
}
