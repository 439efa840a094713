package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-benchmark: isolates the cost of implementation variants
  * (currently: the exact-decimal-sum determinism tax on the flagship
  * aggregation). Usage: tools/run.sh graft.Micro [sfDir]
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm file cache

    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-18s min=${runs.min}%.3fs runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    val grouped = li.filter(col("l_extendedprice") > 0)
      .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("d"))
    time("decimal30_sum") {
      grouped.agg(sum(col("l_extendedprice").cast("decimal(30,2)")).cast("double"))
        .write.format("noop").mode("overwrite").save()
    }
    time("double_sum") {
      grouped.agg(sum(col("l_extendedprice")))
        .write.format("noop").mode("overwrite").save()
    }
    time("cents_long_sum") {
      grouped.agg((sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0))
        .write.format("noop").mode("overwrite").save()
    }

    // vec_dot (codegen'd Expression) vs the aggregate(zip_with) HOF
    // formulation on an all-pairs scoring workload
    graft.plans.GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    emb.count()
    val q = broadcast(emb.limit(100)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")))
    val pairs = emb.crossJoin(q)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    time("dot_codegen") {
      pairs.select(sum(expr("vec_dot(embedding, qv)"))).write
        .format("noop").mode("overwrite").save()
    }
    time("dot_hof") {
      pairs.select(sum(hofDot(col("embedding"), col("qv")))).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
