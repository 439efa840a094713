package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** The Misra–Gries frequent-items sketch: the survival guarantee on a
  * planted skew with cardinality ≫ k, merge behavior across many
  * partitions, and the two-pass exact pattern it exists for.
  */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  test("freq_items: every item with freq > n/(k+1) survives, " +
    "across partitionings") {
    GraftExtensions.register(spark)
    // planted stream: 3 heavy items (3000/2500/2000 of n=10000) over
    // 2500 distinct light ids — cardinality 2503 ≫ k=8
    val heavy = Seq.fill(3000)(1L) ++ Seq.fill(2500)(2L) ++ Seq.fill(2000)(3L)
    val light = (0 until 2500).map(i => 100L + i)
    val stream = heavy ++ light
    val n = stream.length
    for (parts <- Seq(1, 7, 32)) {
      val got = stream.toDF("item").repartition(parts)
        .agg(expr("freq_items(item, 8)").as("c"))
        .select(expr("transform(c, x -> x.item)"))
        .as[Seq[Long]].head().toSet
      // the guarantee: freq > n/9 ⇒ survives (items 1 and 2; item 3
      // at 2000 > 10000/9 ≈ 1111 also qualifies)
      for (it <- Seq(1L, 2L, 3L)) {
        assert(got.contains(it), s"item $it lost at parts=$parts ($got)")
      }
      assert(got.size <= 8)
    }
  }

  test("freq_items: lower-bound counts never exceed true counts; " +
    "k ≥ cardinality degenerates to exact") {
    GraftExtensions.register(spark)
    val stream = Seq.fill(10)(1L) ++ Seq.fill(7)(2L) ++ Seq.fill(3)(3L)
    val got = stream.toDF("item").repartition(5)
      .agg(expr("freq_items(item, 16)").as("c"))
      .select(explode(col("c")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(Long, Long)].collect().toMap
    // no eviction ever happens with k=16 > 3 distinct → exact counts
    assert(got === Map(1L -> 10L, 2L -> 7L, 3L -> 3L))
    // under eviction pressure, counts are LOWER bounds
    val pressured = (stream ++ (100L to 120L)).toDF("item").repartition(3)
      .agg(expr("freq_items(item, 4)").as("c"))
      .select(explode(col("c")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(Long, Long)].collect().toMap
    pressured.foreach { case (it, c) =>
      val truth = (stream ++ (100L to 120L)).count(_ == it).toLong
      assert(c <= truth, s"item $it: sketch $c > true $truth")
    }
  }

  test("two-pass heavy hitters: candidates ⊇ the exact answer — " +
    "ta_heavy_tokens equals a direct exact computation") {
    GraftExtensions.register(spark)
    val direct = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val n = direct.agg(sum("cnt")).as[Long].head()
    val want = direct.filter(col("cnt") * 33 > n)
      .select("token", "cnt").as[(String, Long)].collect().toSet
    val got = SparkEntry.queries("ta_heavy_tokens")(spark, sfDir)
      .select("token", "cnt").as[(String, Long)].collect().toSet
    assert(got === want && want.nonEmpty)
  }
}
