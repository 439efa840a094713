package graft

import org.scalatest.funsuite.AnyFunSuite

/** Direct property test of the prefix-filtering math behind
  * `TextDedup.ngramJaccardPairsPrefix` — the trickiest claims in the
  * repo, exercised on thousands of seeded random set pairs rather
  * than only the fixture corpus:
  *
  *  1. PREFIX LEMMA: for any pair with J(A,B) ≥ t, the (len,
  *     tiebreak)-smaller side's INDEX prefix (len − ⌊2t/(1+t)·len⌋
  *     + 1 rarest/first tokens under a shared total order) and the
  *     larger side's PROBE prefix (len − ⌊t·len⌋ + 1) share at least
  *     one token — so the equi-join on prefix tokens cannot lose a
  *     qualifying pair.
  *  2. POSITIONAL BOUND: for EVERY token shared by the two prefixes
  *     at (1-based) positions (i, j), min(i−1, j−1) + 1 +
  *     min(|A|−i, |B|−j) ≥ t/(1+t)·(|A|+|B|) — so filtering candidate
  *     rows by the bound before dedup cannot lose a qualifying pair
  *     either (every row of a true pair survives).
  *
  * The formulas here mirror the production expressions exactly
  * (floor-based prefix lengths, double threshold math with the same
  * 1e-9 slack).
  */
class PpjoinLemmaSpec extends AnyFunSuite {

  private def jaccard(a: Set[Long], b: Set[Long]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  private def probePrefixLen(len: Int, t: Double): Int =
    len - math.floor(t * len).toInt + 1

  private def indexPrefixLen(len: Int, t: Double): Int =
    len - math.floor(2 * t / (1 + t) * len).toInt + 1

  // the GENERALIZED (k-token) forms the production code runs with —
  // prefixes widened by k − 1, capped at len (TextDedup.PrefixK)
  private def probePrefixLenK(len: Int, t: Double, k: Int): Int =
    math.min(len, len - math.floor(t * len).toInt + k)

  private def indexPrefixLenK(len: Int, t: Double, k: Int): Int =
    math.min(len, len - math.floor(2 * t / (1 + t) * len).toInt + k)

  test("prefix lemma and positional bound hold on 20k random qualifying pairs") {
    val rnd = new scala.util.Random(20260813L)
    var qualifying = 0
    for (trial <- 0 until 200000 if qualifying < 20000) {
      val t = Seq(0.3, 0.5, 0.7, 0.8, 0.9)(trial % 5)
      // build a pair with controlled overlap so J ≥ t happens often
      val common = Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong()).distinct
      val extraA = Seq.fill(rnd.nextInt(20))(rnd.nextLong()).distinct
      val extraB = Seq.fill(rnd.nextInt(20))(rnd.nextLong()).distinct
      val a = (common ++ extraA).distinct.sorted.toVector
      val b = (common ++ extraB).distinct.sorted.toVector
      val j = jaccard(a.toSet, b.toSet)
      if (j >= t && a.nonEmpty && b.nonEmpty) {
        qualifying += 1
        // smaller side by (len, first-element) — any deterministic
        // tiebreak works; the lemma only uses |x| ≤ |y|
        val (x, y) = if (a.length < b.length || (a.length == b.length))
          (a, b) else (b, a)
        val ix = x.take(indexPrefixLen(x.length, t)).toSet
        val probe = y.take(probePrefixLen(y.length, t)).toSet
        val shared = ix.intersect(probe)
        assert(shared.nonEmpty,
          s"t=$t |x|=${x.length} |y|=${y.length} J=$j: prefixes disjoint")
        // positional bound for EVERY shared prefix token
        val alpha = t / (1 + t) * (x.length + y.length)
        shared.foreach { w =>
          val i = x.indexOf(w) + 1
          val jj = y.indexOf(w) + 1
          val bound = math.min(i - 1, jj - 1) + 1 +
            math.min(x.length - i, y.length - jj)
          assert(bound + 1e-9 >= alpha,
            s"t=$t token at ($i,$jj) of (${x.length},${y.length}): " +
              s"bound $bound < alpha $alpha for a J=$j pair")
        }
        // GENERALIZED k-token lemma (the production count filter):
        // the k-widened prefixes must share at least min(k, ceil(α))
        // tokens — the exact requirement ngramJaccardPairsPrefix
        // applies before verification, so a violation here would mean
        // the filter silently LOSES a qualifying pair
        val k = graft.operators.TextDedup.PrefixK
        val ixK = x.take(indexPrefixLenK(x.length, t, k)).toSet
        val probeK = y.take(probePrefixLenK(y.length, t, k)).toSet
        val needed = math.min(k.toLong, math.ceil(alpha - 1e-9).toLong)
        val sharedK = ixK.intersect(probeK).size
        assert(sharedK >= needed,
          s"t=$t |x|=${x.length} |y|=${y.length} J=$j: k-prefixes share " +
            s"$sharedK < required $needed tokens")
      }
    }
    assert(qualifying >= 10000, s"only $qualifying qualifying pairs generated")
    info(s"verified on $qualifying qualifying pairs")
  }

  test("splitAssign percent bounds are enforced, assignments exhaustive") {
    // pure contract checks that need no Spark: validation rejects
    // out-of-range splits
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.splitAssign(null, "k", 90, 20)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.splitAssign(null, "k", -1, 5)
    }
  }
}
