package graft

import org.apache.spark.sql.DataFrame

/** Interpreted ≡ generated for every custom Catalyst expression.
  *
  * Each graft expression implements both `nullSafeEval` (the
  * interpreted path) and `doGenCode` (the compiled path). Spark picks
  * between them at runtime — codegen normally, interpreted whenever
  * codegen falls back (Janino compile failure, oversized generated
  * methods, `spark.sql.codegen.factoryMode=NO_CODEGEN`). The
  * expressions route both paths through one static helper precisely so
  * they cannot diverge; this spec pins that property against refactors
  * by running identical queries under forced `CODEGEN_ONLY` and forced
  * `NO_CODEGEN` and requiring bit-identical results. A divergence here
  * is the nastiest bug class at scale: results silently change
  * depending on which executor's expression tree happened to fall back.
  *
  * Inputs cover the edge shapes: NULL text, empty string, input
  * shorter than the shingle size, non-ASCII with surrogate pairs,
  * repeated characters (distinct-shingle collapse), whitespace runs,
  * zero vectors, length-mismatched and NULL vectors.
  */
class CodegenConsistencySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(
      (1L, Option("hello world, the quick brown fox")),
      (2L, Option("")),
      (3L, Option.empty[String]),
      (4L, Option("a")),
      (5L, Option("naïve café 𝒳𝒴 emoji 🙂 text")),
      (6L, Option("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")),
      (7L, Option("  spaced   out\ttabs and more words here  "))
    ).toDF("id", "text")
    df.createOrReplaceTempView("cg_docs")
    df
  }

  private lazy val vecs = {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(
      (1L, Option(Seq(1.0f, 2.0f, 3.0f)), Option(Seq(4.0, 5.0, 6.0))),
      (2L, Option(Seq(0.0f, 0.0f)), Option(Seq(0.0, 0.0))),
      (3L, Option(Seq(1.0f)), Option(Seq(1.0, 2.0))), // length mismatch → NULL
      (4L, Option.empty[Seq[Float]], Option(Seq(1.0))), // NULL vector
      (5L, Option(Seq.empty[Float]), Option(Seq.empty[Double])) // empty ≡ dot 0
    ).toDF("id", "fv", "dv")
    df.createOrReplaceTempView("cg_vecs")
    df
  }

  /** Collect `sql` under a forced codegen factory mode; restores the
    * session confs afterwards (the suite-shared session must not leak
    * a forced mode into other suites' tests).
    */
  private def collectUnder(mode: String, wholeStage: Boolean, sql: String): Seq[String] = {
    (docs, vecs) // force fixture + function registration
    val conf = spark.conf
    val m0 = conf.getOption("spark.sql.codegen.factoryMode")
    val w0 = conf.getOption("spark.sql.codegen.wholeStage")
    try {
      conf.set("spark.sql.codegen.factoryMode", mode)
      conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      spark.sql(sql).collect().map(_.toString).toSeq.sorted
    } finally {
      m0.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      w0.fold(conf.unset("spark.sql.codegen.wholeStage"))(v =>
        conf.set("spark.sql.codegen.wholeStage", v))
    }
  }

  private def assertBothPathsAgree(sql: String): Unit = {
    val gen = collectUnder("CODEGEN_ONLY", wholeStage = true, sql)
    val interp = collectUnder("NO_CODEGEN", wholeStage = false, sql)
    assert(gen.nonEmpty, s"empty result under codegen for: $sql")
    assert(gen === interp, s"codegen vs interpreted diverged for: $sql")
  }

  test("poly_hash64: interpreted == generated (incl. NULL, unicode, empty)") {
    assertBothPathsAgree(
      "SELECT id, poly_hash64(text) FROM cg_docs ORDER BY id")
  }

  test("packed_shingles: interpreted == generated at sizes 1, 3, 5, 8") {
    Seq(1, 3, 5, 8).foreach { n =>
      assertBothPathsAgree(
        s"SELECT id, packed_shingles(text, $n) FROM cg_docs ORDER BY id")
    }
  }

  test("minhash_sigs / minhash_sigs_xx64: interpreted == generated") {
    assertBothPathsAgree(
      "SELECT id, minhash_sigs(text) FROM cg_docs ORDER BY id")
    assertBothPathsAgree(
      "SELECT id, minhash_sigs(text, 6, 4) FROM cg_docs ORDER BY id")
    assertBothPathsAgree(
      "SELECT id, minhash_sigs_xx64(text) FROM cg_docs ORDER BY id")
    assertBothPathsAgree(
      "SELECT id, minhash_sigs_xx64(text, 8, 4) FROM cg_docs ORDER BY id")
  }

  test("jaccard_sorted / overlap_sorted: interpreted == generated over all pairs") {
    assertBothPathsAgree(
      """SELECT a.id, b.id,
        |       jaccard_sorted(packed_shingles(a.text, 3), packed_shingles(b.text, 3)),
        |       overlap_sorted(packed_shingles(a.text, 3), packed_shingles(b.text, 3))
        |FROM cg_docs a JOIN cg_docs b ON a.id < b.id
        |ORDER BY a.id, b.id""".stripMargin)
  }

  test("damerau_levenshtein: interpreted == generated, unbanded and banded") {
    assertBothPathsAgree(
      """SELECT a.id, b.id, damerau_levenshtein(a.text, b.text)
        |FROM cg_docs a JOIN cg_docs b ON a.id < b.id
        |ORDER BY a.id, b.id""".stripMargin)
    assertBothPathsAgree(
      """SELECT a.id, b.id, damerau_levenshtein(a.text, b.text, 3)
        |FROM cg_docs a JOIN cg_docs b ON a.id < b.id
        |ORDER BY a.id, b.id""".stripMargin)
  }

  test("vec_dot: interpreted == generated across float/double/mismatch/NULL") {
    assertBothPathsAgree(
      "SELECT id, vec_dot(fv, dv), vec_dot(fv, fv), vec_dot(dv, dv) " +
        "FROM cg_vecs ORDER BY id")
  }

  test("no_inline: interpreted == generated and value-transparent") {
    assertBothPathsAgree(
      "SELECT id, no_inline(poly_hash64(text)) FROM cg_docs ORDER BY id")
    // transparency: fenced value == unfenced value on the same path
    val fenced = spark.sql(
      "SELECT no_inline(poly_hash64(text)) FROM cg_docs ORDER BY id")
      .collect().map(_.toString).toSeq
    val plain = spark.sql(
      "SELECT poly_hash64(text) FROM cg_docs ORDER BY id")
      .collect().map(_.toString).toSeq
    assert(fenced === plain)
  }
}
