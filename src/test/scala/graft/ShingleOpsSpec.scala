package graft

import graft.functions.Functions.normalizeText
import graft.operators.TextDedup
import graft.plans.GraftExtensions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The packed-long Jaccard path must be bit-identical to the string
  * formulation it replaced (the DuckDB oracle computes the latter).
  */
class ShingleOpsSpec extends SparkSpec {
  import spark.implicits._

  private def stringFormulation(df: org.apache.spark.sql.DataFrame,
                                threshold: Double) = {
    val prepared = df
      .withColumn("_norm", normalizeText(col("text")))
      .withColumn("_sh", TextDedup.shingleExpr("_norm", 5))
      .select(col("doc_id"), col("lang"), col("_sh"))
    val a = prepared.select(col("lang"), col("doc_id").as("id_1"), col("_sh").as("sh_1"))
    val b = prepared.select(col("lang"), col("doc_id").as("id_2"), col("_sh").as("sh_2"))
    a.join(b, Seq("lang")).filter(col("id_1") < col("id_2"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_1"), col("sh_2"))).cast("double") /
          size(array_union(col("sh_1"), col("sh_2"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_1", "id_2", "jaccard")
  }

  test("jaccard_sorted edge cases") {
    GraftExtensions.register(spark)
    val out = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),   // identical
      (Seq(1L, 2L), Seq(3L, 4L)),           // disjoint
      (Seq.empty[Long], Seq.empty[Long]),   // both empty
      (Seq.empty[Long], Seq(1L)),           // one empty
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L))) // half overlap: 2/6
      .toDF("a", "b").selectExpr("jaccard_sorted(a, b) AS j")
      .as[Double].collect().toSeq
    assert(out === Seq(1.0, 0.0, 1.0, 0.0, 2.0 / 6.0))
  }

  test("packed_shingles set size equals the distinct string-shingle count") {
    GraftExtensions.register(spark)
    val d = Seq("the quick brown fox", "aaaaa", "ab", "").toDF("t")
      .withColumn("n_packed", expr("size(packed_shingles(t, 5))"))
      .withColumn("n_str", size(array_distinct(TextDedup.shingleExpr("t", 5))))
    assert(d.filter(col("n_packed") =!= col("n_str")).count() === 0)
  }

  test("ngramJaccardPairs matches the string formulation bit-for-bit on real docs") {
    val d = Tables.table(spark, sfDir, "documents").select("doc_id", "text", "lang")
    val corpus = d.unionByName(d.select((col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" copy")).as("text"), col("lang")))
    val fast = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", "lang", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val slow = stringFormulation(corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(fast.nonEmpty && fast === slow)
  }
}
