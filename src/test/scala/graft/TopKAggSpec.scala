package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap topk_pairs aggregate: agreement with the window
  * formulation, heap semantics at the edges, and the plan shape that
  * justifies it (partial ObjectHashAggregate, no Window, no sort of
  * the fact).
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topk_pairs agrees with the window top-N on real data") {
    GraftExtensions.register(spark)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"),
        col("o_orderkey"))
    val viaAgg = orders.groupBy("o_custkey")
      .agg(expr("topk_pairs(cents, o_orderkey, 3)").as("top"))
      .select(col("o_custkey"), expr("explode(top)").as("p"))
      .select(col("o_custkey"), col("p.k").as("cents"), col("p.v").as("oid"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    val viaWin = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("cents"), col("o_orderkey").as("oid"))
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty)
  }

  test("topk_pairs: under-full groups, exact ties, null skipping, " +
    "and stable order in the result array") {
    GraftExtensions.register(spark)
    val df = Seq[(Int, java.lang.Long, java.lang.Long)](
      (1, 10L, 100L), (1, 10L, 99L), (1, 10L, 101L), (1, 7L, 50L),
      (2, 5L, 1L),                       // under-full group
      (3, null, 1L), (3, 2L, null), (3, 1L, 9L) // nulls skipped
    ).toDF("g", "key", "pay")
    val got = df.groupBy("g")
      .agg(expr("topk_pairs(key, pay, 3)").as("top"))
      .select(col("g"),
        expr("array_join(transform(top, p -> concat(p.k, ':', p.v)), ',')")
          .as("s"))
      .as[(Int, String)].collect().toMap
    // ties on key=10 keep the SMALLEST payloads, ordered payload asc
    assert(got(1) == "10:99,10:100,10:101")
    assert(got(2) == "5:1")
    assert(got(3) == "1:9")
  }

  test("topk_pairs: survives exchange serialization and repartitioning") {
    GraftExtensions.register(spark)
    // many partitions force partial buffers through serialize/merge
    val df = spark.range(0, 10000).repartition(17)
      .select((col("id") % 5).as("g"), (col("id") % 997).as("key"),
        col("id").as("pay"))
    val got = df.groupBy("g")
      .agg(expr("topk_pairs(key, pay, 4)").as("top"))
      .select(col("g"), expr("transform(top, p -> p.k)").as("ks"),
        expr("transform(top, p -> p.v)").as("vs"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(got.length == 5)
    got.foreach { case (g, ks, vs) =>
      assert(ks.length == 4)
      // per group: ids ≡ g (mod 5); key = id % 997. The max key is the
      // largest id%997 over ids ≡ g (mod 5) — verify against a local
      // recomputation.
      val local = (0L until 10000L).filter(_ % 5 == g)
        .map(id => (id % 997, id))
        .sortBy { case (k, v) => (-k, v) }.take(4)
      assert(ks == local.map(_._1) && vs == local.map(_._2),
        s"group $g mismatch: got ${ks.zip(vs)}, want $local")
    }
  }

  test("o07 plan: partial+final ObjectHashAggregate, no Window, no sort " +
    "below the exchange") {
    GraftExtensions.register(spark)
    val p = SparkEntry.queries("o07_topk_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) === 2, p)
    assert(!p.contains("Window"), p)
    // the only sort-ish operator allowed is inside eval (array order);
    // the physical plan must not sort the fact table
    assert(!p.contains("Sort "), p)
  }
}
