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

    // dd_ngram_prefix stage breakdown (pass "ngram" as 2nd arg):
    // where does the prefix-join's wall-time actually go at scale?
    if (args.lift(1).contains("ngram")) {
      import graft.functions.Functions.normalizeText
      val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      val d = docsDf.select(col("doc_id"), col("text"), col("lang"))
        .unionByName(docsDf.select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" copy")).as("text"), col("lang")))
      d.count() // warm cache
      val threshold = 0.5
      val prepared = d
        .filter(col("text").isNotNull)
        .withColumn("_norm", normalizeText(col("text")))
        .withColumn("_sh", expr("packed_shingles(_norm, 5)"))
        .withColumn("_len", size(col("_sh")))
        .withColumn("_plen",
          (col("_len") - floor(lit(threshold) * col("_len")).cast("int") + 1))
        .select(col("doc_id"), col("lang"), col("_sh"), col("_len"), col("_plen"))
      val toks = prepared.select(
        col("doc_id"), col("lang"), col("_len"), col("_plen"),
        explode(col("_sh")).as("_tok"))
      val dfreq = toks.groupBy(col("lang"), col("_tok"))
        .agg(count(lit(1)).as("_df"))
      import org.apache.spark.sql.expressions.Window
      val byRarity = Window.partitionBy(col("doc_id"))
        .orderBy(col("_df").asc, col("_tok").asc)
      val prefixToks = toks.join(dfreq, Seq("lang", "_tok"))
        .withColumn("_rk", row_number().over(byRarity))
        .filter(col("_rk") <= col("_plen"))
        .select(col("doc_id"), col("lang"), col("_len"), col("_tok"))
      def side(n: Int) = prefixToks.select(
        col("lang"), col("_tok"),
        col("doc_id").as(s"id_$n"), col("_len").as(s"len_$n"))
      val candidates = side(1).join(side(2), Seq("lang", "_tok"))
        .filter(col("id_1") < col("id_2"))
        .filter(col("len_1").cast("double") >= lit(threshold) * col("len_2") &&
          col("len_2").cast("double") >= lit(threshold) * col("len_1"))
        .select("id_1", "id_2").dropDuplicates("id_1", "id_2")
      time("ng_prepared") {
        prepared.write.format("noop").mode("overwrite").save()
      }
      time("ng_toks_dfreq") {
        dfreq.write.format("noop").mode("overwrite").save()
      }
      time("ng_prefixToks") {
        prefixToks.write.format("noop").mode("overwrite").save()
      }
      time("ng_candidates") {
        candidates.write.format("noop").mode("overwrite").save()
      }
      time("ng_full") {
        graft.operators.TextDedup.ngramJaccardPairsPrefix(
          d, "doc_id", "text", "lang", threshold = 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      println(s"candidate pairs: ${candidates.count()}")
    }
    spark.stop()
  }
}
