package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MinHash signature vector: for the (already normalized)
  * input text, the i-th element is the minimum over the text's
  * distinct `shingleSize`-grams of the i-th disjoint 5-hex-char
  * segment of the shingle's md5 — bit-identical to the composed
  * formulation `min(substring(md5(explode(shingles)), 1+5i, 5))
  * groupBy id` (TextDedup.shingleExpr semantics, including the
  * whole-string shingle for short texts), but computed in ONE tight
  * JVM loop per row: no row explosion, no shuffle, no aggregation —
  * the signature becomes a scan-side projection.
  *
  * Registered as SQL function `minhash_sigs(text[, numHashes[,
  * shingleSize]])` via [[GraftExtensions]].
  *
  * Input contract: text is `normalizeText` output ([a-z0-9 ] only),
  * so Java chars = code points = UTF-8 bytes and the shingling
  * matches Spark's character-based `substring`. The md5 is over the
  * shingle's UTF-8 bytes, hex lowercase — exactly Spark's `md5`.
  */
case class MinHashSigs(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 6,
    "md5 provides 6 disjoint 5-hex-char segments")
  require(shingleSize >= 1, "shingleSize must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[UTF8String], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashSigs.compute($c, $numHashes, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

/** Production-key twin of [[MinHashSigs]]: same shingling, same
  * min-over-distinct-shingles semantics, but hash function i is
  * xxhash64 of the shingle's UTF-8 bytes with seed i (the exact
  * `XXH64` Spark's built-in `xxhash64` runs — seed i instead of the
  * built-in's fixed 42) and the signature elements are LONGs compared
  * UNSIGNED. ~8 bytes per signature element instead of a 5-char
  * string, and no cryptographic digest on the hot path — the shape
  * the scaladoc at TextDedup promises for the 100 TB corpus, where
  * the md5 path remains the engine-reproducible oracle twin
  * (DuckDB has no xxhash64, so this variant is spec-gated by pair-set
  * equality instead).
  *
  * Registered as SQL function `minhash_sigs_xx64(text[, numHashes[,
  * shingleSize]])` via [[GraftExtensions]]; numHashes is unbounded by
  * digest width here (each i is its own seed).
  */
case class MinHashSigsXx64(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be positive")
  require(shingleSize >= 1, "shingleSize must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs_xx64 requires STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigsXx64.compute(input.asInstanceOf[UTF8String], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashSigsXx64.compute($c, $numHashes, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsXx64 =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs_xx64"
}

object MinHashSigsXx64 {

  /** Static hot loop invoked from both interpreted and generated
    * code: one xxhash64 per (distinct shingle, hash function) — no
    * allocation beyond the shingle substring and the result array.
    */
  def compute(s: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    val str = s.toString
    val count = math.max(str.length - (shingleSize - 1), 1)
    val seen = new java.util.HashSet[String](math.min(count * 2, 1 << 16))
    val mins = new Array[Long](numHashes)
    val has = new Array[Boolean](numHashes)
    var i = 0
    while (i < count) {
      val sh = str.substring(i, math.min(i + shingleSize, str.length))
      if (seen.add(sh)) {
        val u = UTF8String.fromString(sh)
        var k = 0
        while (k < numHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(u, k.toLong)
          if (!has(k) || java.lang.Long.compareUnsigned(h, mins(k)) < 0) {
            mins(k) = h; has(k) = true
          }
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashSigs {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Static hot loop invoked from both interpreted and generated code. */
  def compute(s: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    val str = s.toString
    // shingle count mirrors shingleExpr: greatest(len - (n-1), 1) —
    // a short text contributes its whole self as the one shingle
    val count = math.max(str.length - (shingleSize - 1), 1)
    val seen = new java.util.HashSet[String](math.min(count * 2, 1 << 16))
    val mins = new Array[String](numHashes)
    val md = digest.get()
    val hex = new Array[Char](32)
    var i = 0
    while (i < count) {
      val sh = str.substring(i, math.min(i + shingleSize, str.length))
      // distinct shingles only — duplicates can't change a minimum,
      // and the set test is ~10× cheaper than the md5 it skips
      if (seen.add(sh)) {
        val bytes = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 16) {
          hex(b * 2) = HexChars((bytes(b) >> 4) & 0xf)
          hex(b * 2 + 1) = HexChars(bytes(b) & 0xf)
          b += 1
        }
        var k = 0
        while (k < numHashes) {
          val seg = new String(hex, k * 5, 5)
          if (mins(k) == null || seg.compareTo(mins(k)) < 0) mins(k) = seg
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): AnyRef))
  }
}
