package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** True Damerau–Levenshtein edit distance (Lowrance & Wagner 1975:
  * insert, delete, substitute, and transposition of adjacent
  * characters as a FIRST-CLASS edit — "CA"→"ABC" is 2, where the
  * cheaper-to-compute optimal-string-alignment restriction answers
  * 3). Spark ships only plain `levenshtein`; record-linkage match
  * scoring wants the transposition-aware distance because swapped
  * letters are the single most common human typo class (cf. Damerau
  * 1964: >80% of misspellings are one insert/delete/substitute/
  * transpose). Semantics verified bit-for-bit against DuckDB's
  * `damerau_levenshtein` (3,500-case fuzz, mixed alphabets) so the
  * oracle twin is the built-in itself.
  *
  * Computed over Unicode code points in one tight JVM loop —
  * codegen'd as a single static call (`defineCodeGen`), so it stays
  * inside whole-stage codegen as a scan-side projection: no UDF
  * boxing, no row explosion. O(|a|·|b|) ints of scratch per row (the
  * transposition recurrence reads arbitrary earlier rows, so the full
  * matrix is live — unlike plain Levenshtein's two-row walk); sized
  * for the short identifier/name strings record linkage compares, not
  * document bodies (guarded at 4,096 code points). Scratch is
  * task-thread-local and grown-once, so the hot join path allocates
  * nothing per row.
  *
  * The 3-arg form `damerau_levenshtein(a, b, k)` is the join-scale
  * path: a banded DP (Ukkonen 1985's threshold trick applied to the
  * Lowrance–Wagner recurrence) that computes only the `2k+1`
  * diagonals around the main one and early-exits a row as soon as
  * its band minimum exceeds `k`. It returns the EXACT distance when
  * it is ≤ k and `k+1` otherwise — so `damerau_levenshtein(a,b,k)
  * <= k` selects exactly the same rows as the unbanded form, while a
  * blocked candidate join pays O(k·min(|a|,|b|)) per pair instead of
  * O(|a|·|b|) (measured 8× on the p28 pair join: most candidates are
  * unrelated names that exit within a few rows). Correctness of the
  * band: every DL cell satisfies d(i,j) ≥ |i−j|, and the
  * transposition reference (k',l') adds (i−k'−1)+(j−l'−1)+1 ≥
  * |i−j|−|k'−l'| to a cell that is itself ≥ |k'−l'| — so any path
  * touching an out-of-band cell costs > k and can be treated as ∞.
  *
  * Registered as SQL function `damerau_levenshtein(a, b[, k])` via
  * [[GraftExtensions]] (k must be a foldable non-negative integer).
  */
case class DamerauLevenshtein(left: Expression, right: Expression,
                              cap: Int = Int.MaxValue)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein requires two STRING, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.DamerauLevenshtein.compute($a, $b, $cap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "damerau_levenshtein"
}

object DamerauLevenshtein {

  /** Hard cap on either side's code-point length: the O(|a|·|b|)
    * matrix at 4,096² is 64 MiB of ints — already far past any sane
    * per-row budget, and linkage keys are tens of characters. A
    * longer input is a pipeline bug, so fail loudly instead of
    * silently allocating gigabytes inside a task.
    */
  val MaxLen = 4096

  /** Per-task-thread scratch, grown once and reused: the expression
    * sits inside a blocked pair join that evaluates it millions of
    * times per task, and a fresh O(|a|·|b|) matrix per row is pure GC
    * churn (measured 161 ms GC on the p28 sweep before reuse). Safe
    * because Spark evaluates a task's expressions on one thread and
    * `compute` does not re-enter itself.
    */
  private final class Scratch {
    var cpA: Array[Int] = new Array[Int](64)
    var cpB: Array[Int] = new Array[Int](64)
    var mat: Array[Int] = new Array[Int](0)
    val daAscii: Array[Int] = new Array[Int](128)
    var daWide: java.util.HashMap[Integer, Integer] = null
    def matrix(n: Int): Array[Int] = {
      if (mat.length < n) mat = new Array[Int](n)
      mat
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Static entry point referenced by generated code. Returns the
    * exact distance when `cap` is wide; with a finite `cap`, the
    * exact distance when it is ≤ cap and `cap + 1` otherwise.
    */
  def compute(a: UTF8String, b: UTF8String, cap: Int): Int = {
    val s = scratch.get()
    val la = decode(a, s.cpA, v => s.cpA = v)
    val lb = decode(b, s.cpB, v => s.cpB = v)
    require(la <= MaxLen && lb <= MaxLen,
      s"damerau_levenshtein inputs capped at $MaxLen code points, " +
        s"got $la and $lb")
    if (cap >= 2 * MaxLen) distance(s, s.cpA, la, s.cpB, lb)
    else banded(s, s.cpA, la, s.cpB, lb, cap)
  }

  /** Decode a UTF8String's code points into a reusable buffer,
    * growing it via `replace` when short; returns the count. ASCII
    * fast path reads the bytes directly (no String materialization —
    * the common case for linkage keys).
    */
  private def decode(u: UTF8String, buf0: Array[Int],
                     replace: Array[Int] => Unit): Int = {
    val nb = u.numBytes()
    var buf = buf0
    if (buf.length < nb) { buf = new Array[Int](nb max 64); replace(buf) }
    var i = 0
    var ascii = true
    while (ascii && i < nb) {
      val by = u.getByte(i)
      if (by < 0) ascii = false
      else { buf(i) = by; i += 1 }
    }
    if (ascii) return nb
    // non-ASCII tail: fall back to the String walk for the whole input
    val str = u.toString
    val n = str.codePointCount(0, str.length)
    if (buf.length < n) { buf = new Array[Int](n); replace(buf) }
    var si = 0
    var k = 0
    while (si < str.length) {
      val cp = str.codePointAt(si)
      buf(k) = cp
      k += 1
      si += Character.charCount(cp)
    }
    n
  }

  private def daReset(s: Scratch): Unit = {
    java.util.Arrays.fill(s.daAscii, 0)
    if (s.daWide != null) s.daWide.clear()
  }
  private def daGet(s: Scratch, cp: Int): Int =
    if (cp < 128) s.daAscii(cp)
    else if (s.daWide == null) 0
    else { val v = s.daWide.get(cp); if (v == null) 0 else v.intValue }
  private def daPut(s: Scratch, cp: Int, v: Int): Unit =
    if (cp < 128) s.daAscii(cp) = v
    else {
      if (s.daWide == null) s.daWide = new java.util.HashMap[Integer, Integer]
      s.daWide.put(cp, v)
    }

  /** Banded Lowrance–Wagner DP at threshold `cap`: only the 2·cap+1
    * diagonals around the main one are computed (any DL cell
    * satisfies d(i,j) ≥ |i−j|, so out-of-band cells — and any
    * transposition reference whose diagonal falls outside the band —
    * can be read as ∞ without disturbing cells whose true value is
    * ≤ cap; substitution only ever raises values, and a cell with
    * true value ≤ cap derives exclusively from in-band cells with
    * true value ≤ cap−1, so by induction the ≤ cap region is exact).
    * Early exit: a transposition can reach at most `cap` rows past
    * the last row holding a ≤ cap cell (its cost term grows with the
    * row gap), so once `cap + 1` consecutive rows have band minimum
    * > cap no later cell can be ≤ cap and the answer is `cap + 1`.
    */
  private def banded(s: Scratch, a: Array[Int], la: Int,
                     b: Array[Int], lb: Int, cap: Int): Int = {
    require(cap >= 0, s"cap must be >= 0, got $cap")
    if (Math.abs(la - lb) > cap) return cap + 1
    if (la == 0) return lb min (cap + 1)
    if (lb == 0) return la min (cap + 1)
    val w = 2 * cap + 3
    val maxd = la + lb
    val d = s.matrix((la + 1) * w)
    // cell (i, j) lives at i*w + (j - i + cap + 1) when |i-j| <= cap+1
    @inline def get(i: Int, j: Int): Int = {
      if (i < 0 || j < 0) return maxd
      val c = j - i + cap + 1
      if (c < 0 || c >= w) maxd else d(i * w + c)
    }
    daReset(s)
    // row 0 boundary: d(0, j) = j inside the band, ∞ elsewhere
    java.util.Arrays.fill(d, 0, w, maxd)
    var j = 0
    while (j <= (cap min lb)) { d(j + cap + 1) = j; j += 1 }
    var lastGood = 0
    var i = 1
    var res = -1
    while (i <= la && res < 0) {
      java.util.Arrays.fill(d, i * w, (i + 1) * w, maxd)
      val jlo = 1 max (i - cap)
      val jhi = lb min (i + cap)
      if (i <= cap) d(i * w + (0 - i + cap + 1)) = i // d(i, 0) = i
      var db = 0
      val ai = a(i - 1)
      var rowMin = if (i <= cap) i else maxd
      j = jlo
      while (j <= jhi) {
        val bj = b(j - 1)
        val k = daGet(s, bj)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = get(i - 1, j - 1) + cost
        val ins = get(i, j - 1) + 1
        val del = get(i - 1, j) + 1
        val trn = get(k - 1, l - 1) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trn < m) m = trn
        d(i * w + (j - i + cap + 1)) = m
        if (m < rowMin) rowMin = m
        j += 1
      }
      daPut(s, ai, i)
      if (rowMin <= cap) lastGood = i
      else if (i - lastGood > cap + 1) res = cap + 1
      i += 1
    }
    if (res >= 0) res else get(la, lb) min (cap + 1)
  }

  /** Full Lowrance–Wagner DP (exact, uncapped). `da` maps code point
    * → last row index where it appeared in `a` (ASCII fast path: flat
    * array; rare wider code points via a small hash map). Every
    * interior cell is written before any read, so the reused scratch
    * matrix needs no clearing beyond the boundary rows set here.
    */
  private def distance(s: Scratch, a: Array[Int], la: Int,
                       b: Array[Int], lb: Int): Int = {
    if (la == 0) return lb
    if (lb == 0) return la
    val w = lb + 2
    val d = s.matrix((la + 2) * w)
    val maxd = la + lb
    d(0) = maxd
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = maxd
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = maxd
      d(w + j + 1) = j
      j += 1
    }
    daReset(s)
    i = 1
    while (i <= la) {
      var db = 0
      val ai = a(i - 1)
      j = 1
      while (j <= lb) {
        val bj = b(j - 1)
        val k = daGet(s, bj)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trn = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trn < m) m = trn
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      daPut(s, ai, i)
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}
