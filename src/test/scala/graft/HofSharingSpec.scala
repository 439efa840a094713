package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Regression guard for the X89 bug class: sibling projection columns
  * holding COPIES of one higher-order-function tree (nested lambdas —
  * filter/transform/aggregate) can share `NamedLambdaVariable` state
  * across the copies and return different values in the same row
  * (first measured in `Similarity.mmrRerank`: `_picked` and `_out`
  * copies of the same argmax tree disagreed within a single row).
  *
  * The shipped contract is the HARDENED shape: every operator that
  * needs one HOF result in several sibling columns materializes it
  * exactly once into a [[graft.plans.NoInline]]-fenced column. These
  * tests pin that contract by recomputing each operator's sibling
  * columns independently on the driver and asserting bit-agreement —
  * the assertion that goes red if a shared-tree regression (or the
  * underlying Spark behavior) ever reaches these operators again.
  */
class HofSharingSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    1L -> "the cat sat on the mat the end",
    2L -> "alpha beta gamma alpha beta alpha",
    3L -> "visa 4111111111111111 and junk 1234567890123456 pay 30569309025904",
    4L -> "",
    5L -> "one-token",
    6L -> ("repeat word " * 40).trim)

  test("unigramEntropy: sibling columns agree with a driver-side recomputation") {
    val df = texts.toDF("doc_id", "text")
    val got = TextAnalysis.unigramEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    texts.foreach { case (id, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      val n = toks.size // split("") == Seq("") → size 1, matches Spark
      val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
      // same fold order as the operator: sorted distinct tokens
      val h = counts.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, c)) =>
        val p = c.toDouble / n; acc + p * math.log(p)
      }
      val entropy = if (n == 0) 0.0
        else BigDecimal(-h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === ((n, counts.size, entropy)),
        s"doc $id: sibling columns disagree with ground truth")
    }
  }

  test("luhnCcDetect: candidate count and valid count agree per row") {
    val df = texts.toDF("doc_id", "text")
    val got = TextAnalysis.luhnCcDetect(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    def luhn(s: String): Boolean =
      s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
      }.sum % 10 == 0
    texts.foreach { case (id, t) =>
      val cands = "\\d+".r.findAllIn(t).toSeq.filter(c => c.length >= 13 && c.length <= 19)
      assert(got(id) === ((cands.size, cands.count(luhn))),
        s"doc $id: candidate/valid sibling columns disagree with ground truth")
    }
    // row 3 carries two Luhn-valid cards (4111… and the 14-digit Diners
    // test number) and one invalid 16-digit run — the counts differ, so
    // a cross-contaminated shared tree could not pass by coincidence
    assert(got(3L) === ((3, 2)))
  }

  /** The copied-HOF-tree shape itself, in miniature: one
    * filter-with-lambda tree referenced by two sibling columns, where
    * the X89 contamination would make the siblings disagree. The
    * fenced (materialize-once) form must agree unconditionally — this
    * is the shape `unigramEntropy`/`luhnCcDetect`/`mmrRerank` now use.
    */
  test("fenced materialize-once pattern: siblings over one HOF result agree") {
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("arr", sequence(lit(1), (col("id") % 50 + lit(1)).cast("int")))
    val shared = filter(col("arr"), x => x % 2 === 0) // the HOF tree
    val fenced = df
      .select(col("id"), col("arr"),
        graft.plans.NoInline(spark, shared).as("_m"))
      .select(col("id"),
        size(col("_m")).as("a"),
        size(filter(col("_m"), x => x > 10)).as("b"),
        aggregate(col("_m"), lit(0), (acc, x) => acc + x).as("s"))
      .collect()
    fenced.foreach { r =>
      val id = r.getLong(0); val evens = (1 to (id % 50 + 1).toInt).filter(_ % 2 == 0)
      assert(r.getInt(1) == evens.size && r.getInt(2) == evens.count(_ > 10) &&
        r.getInt(3) == evens.sum, s"row $id: fenced siblings disagree")
    }
  }
}
