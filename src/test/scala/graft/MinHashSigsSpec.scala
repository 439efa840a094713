package graft

import graft.functions.Functions.normalizeText
import graft.operators.TextDedup
import graft.plans.GraftExtensions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The codegen'd MinHashSigs expression must be bit-identical to the
  * composed-builtin derivation it replaced (explode shingles → md5 →
  * min over digest segments) — the DuckDB oracle re-derives that
  * exact formula.
  */
class MinHashSigsSpec extends SparkSpec {
  import spark.implicits._

  test("expression matches the exploded composed-builtin derivation bit-for-bit") {
    val docs = Tables.table(spark, sfDir, "documents")
    val viaExpr = TextDedup.minhashSignatures(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val sigCols = (0 until 6).map(i =>
      min(substring(col("_h"), 1 + 5 * i, 5)).as(s"sig_$i"))
    val viaExplode = docs
      .withColumn("_norm", normalizeText(col("text")))
      .withColumn("_sh", explode(TextDedup.shingleExpr("_norm", 5)))
      .withColumn("_h", md5(col("_sh")))
      .groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaExpr.nonEmpty && viaExpr === viaExplode)
  }

  test("short and repetitive texts shingle like shingleExpr") {
    val d = Seq((1L, "ab"), (2L, "aaaaaaaa"), (3L, "abcdef")).toDF("doc_id", "text")
    val viaExpr = TextDedup.minhashSignatures(d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val sigCols = (0 until 6).map(i =>
      min(substring(col("_h"), 1 + 5 * i, 5)).as(s"sig_$i"))
    val viaExplode = d
      .withColumn("_norm", normalizeText(col("text")))
      .withColumn("_sh", explode(TextDedup.shingleExpr("_norm", 5)))
      .withColumn("_h", md5(col("_sh")))
      .groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaExpr === viaExplode)
  }

  test("null text rows are dropped, matching explode semantics") {
    val d = Seq((1L, Some("hello world text")), (2L, None))
      .toDF("doc_id", "text")
    val out = TextDedup.minhashSignatures(d, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("registered SQL function works with literal args") {
    GraftExtensions.register(spark)
    val r = Seq("some normalized text").toDF("t")
      .selectExpr("minhash_sigs(t, 6, 5) AS s")
      .selectExpr("size(s)").as[Int].head()
    assert(r === 6)
  }

  test("non-literal or null shape args raise AnalysisException, not CCE/NPE") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq((1, "some text")).toDF("id", "text")
    df.createOrReplaceTempView("mh_arg_check")
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sigs(text, id) FROM mh_arg_check").collect()
    }
    assert(nonFoldable.getMessage.contains("minhash_sigs"))
    val nullLit = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT packed_shingles(text, CAST(NULL AS INT)) FROM mh_arg_check").collect()
    }
    assert(nullLit.getMessage.contains("packed_shingles"))
  }

  test("signature stage explains with no shuffle below it") {
    val docs = Tables.table(spark, sfDir, "documents")
    val plan = TextDedup.minhashSignatures(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // the expression must appear exactly once (no per-column re-inline)
    assert(plan.sliding("minhash_sigs".length).count(_ == "minhash_sigs") === 1, plan)
  }
}
