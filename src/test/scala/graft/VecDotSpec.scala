package graft

import graft.plans.GraftExtensions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the HOF formulation bit-for-bit on float vectors") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings").limit(200)
      .select($"vec_id", $"embedding")
    val hof = aggregate(
      zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb
      .select(expr("vec_dot(embedding, embedding)").as("cg"), hof.as("hof"))
      .filter($"cg" =!= $"hof" || $"cg".isNull)
    assert(diff.count() === 0)
  }

  test("vec_dot null semantics match zip_with poisoning") {
    GraftExtensions.register(spark)
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(3.0, 4.0)),   // mixed float/double: 11.0
      (Array(1.0f), Array(1.0, 2.0))          // length mismatch: null
    ).toDF("a", "b")
    val out = rows.select(expr("vec_dot(a, b)").as("d")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    // null input array → null
    val nullIn = Seq((null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("a", "b")
      .select(expr("vec_dot(a, b)").as("d")).collect()
    assert(nullIn(0).isNullAt(0))
  }

  test("l2Norm and cosine build on vec_dot and stay self-consistent") {
    GraftExtensions.register(spark)
    val v = Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val out = v.select(
      Similarity.l2Norm($"a").as("n"),
      Similarity.cosine($"a", $"b").as("c")).collect()(0)
    assert(out.getDouble(0) === 5.0)
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-12)
  }
}
