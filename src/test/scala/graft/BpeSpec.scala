package graft

import graft.operators.Bpe
import graft.sources.Tables
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.table(spark, sfDir, "documents")

  /** Sequential reference BPE trainer (Sennrich et al. 2016 shape):
    * the ground truth the distributed trainer must reproduce exactly.
    */
  private def refTrain(texts: Seq[String], numMerges: Int,
                       minCount: Long): Seq[(String, String)] = {
    def greedy(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> g.size.toLong
      }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var rank = 0
    while (rank < numMerges && !done) {
      val counts = words.toSeq
        .flatMap { case (s, f) => s.zip(s.tail).map(_ -> f) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        if (n < minCount) done = true
        else {
          merges += ((a, b))
          words = words.toSeq
            .map { case (s, f) => greedy(s, a, b) -> f }
            .groupMapReduce(_._1)(_._2)(_ + _)
          rank += 1
        }
      }
    }
    merges.result()
  }

  test("train reproduces the sequential reference merge table exactly") {
    val sample = docs.filter($"doc_id" < 60).select("text")
    val texts = sample.as[String].collect().toSeq
    val expected = refTrain(texts, numMerges = 12, minCount = 2)
    val got = Bpe.train(sample, "text", numMerges = 12, minCount = 2)
      .map(m => (m.a, m.b))
    assert(got === expected)
    // partitioning-invariant: the argmax tiebreak is a total order
    val repart = Bpe.train(sample.repartition(7), "text", 12, 2)
      .map(m => (m.a, m.b))
    assert(repart === expected)
  }

  test("encode applies merges greedily and reconstructs the text") {
    val toy = Seq("aaab aaab ab").toDF("text")
    val merges = Bpe.train(toy, "text", numMerges = 3, minCount = 1)
    val enc = Bpe.encode(toy, "text", merges)
      .select("bpe_tokens", "n_bpe_tokens").head
    val toks = enc.getSeq[String](0)
    // every word ends with a token carrying </w>; stripping markers and
    // concatenating reconstructs the input words in order
    val rebuilt = toks.mkString("")
      .replace(Bpe.EndOfWord, " ").trim
    assert(rebuilt === "aaab aaab ab")
    assert(enc.getInt(1) === toks.length)
    // merges learned on "aaab aaab ab": (a,a) first (freq 4) — so the
    // encoded form uses multi-char symbols, not raw characters
    assert(toks.exists(_.length > 1))
  }

  test("encode token count shrinks as merges grow (compression monotonicity)") {
    val sample = docs.filter($"doc_id" < 40).select("text")
    val m4 = Bpe.train(sample, "text", 4, 2)
    val m12 = Bpe.train(sample, "text", 12, 2)
    def total(ms: Seq[Bpe.Merge]) =
      Bpe.encode(sample, "text", ms)
        .agg(sum($"n_bpe_tokens")).head.getLong(0)
    val (t0, t4, t12) = (total(Nil), total(m4), total(m12))
    assert(t4 < t0, s"4 merges: $t4 !< $t0")
    assert(t12 < t4, s"12 merges: $t12 !< $t4")
  }
}
