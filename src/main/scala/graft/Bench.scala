package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline query set on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are materialized through the noop sink — count() lets
  * Spark's count-star shortcut skip projection work and would
  * under-measure; noop executes the full plan including expression
  * evaluation.
  */
object Bench {

  /** Headline set: one representative per operator family, ordered
    * roughly cheap → expensive.
    */
  val headline: Seq[String] = Seq(
    "daily_revenue",       // scan → filter → group agg
    "p01_cast_projection", // projection throughput
    "v01_rule_annotate",   // rule-engine projection
    "e2e_curated",         // validate + double broadcast join
    "a04_extended_metrics",// join + wide agg
    "j04_semi_exists",     // semi join
    "w01_latest_per_key",  // window dedupe
    "scd2_merge",          // SCD2 merge pipeline
    "mdm_match_pairs",     // blocked fuzzy self-join
    "ta_quality_scores",   // regex-heavy text projection
    "dd_minhash_pairs",    // shingle explode + LSH self-join
    "ann_topk",            // brute-force vector search
    "ta_rolling_hash",     // custom codegen'd expression
    "ev_window_agg",       // tumbling window agg
    "ev_sessions",         // gaps-and-islands windowing
    "ev_asof_join")        // as-of join

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warmup

    // BENCH_QUERIES overrides the set: "all" sweeps the entire
    // registry (catches expensive queries invisible in the headline
    // set — a 752s regression once hid there), or a comma-separated
    // name list for focused profiling. Unset → headline contract set.
    val selected: Seq[String] = sys.env.get("BENCH_QUERIES") match {
      case Some("all") => SparkEntry.queries.keys.toSeq.sorted
      case Some(list)  => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None        => headline
    }

    def runOnce(dir: String): Seq[(String, Double)] =
      selected.filter(SparkEntry.queries.contains).map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }

    // Warm per-query codegen at the smallest SF: generated classes are
    // cached by code shape, so a sub-second sf0.001 pass compiles every
    // headline plan and the timed runs measure execution, not Janino.
    val warmDir = new java.io.File(sfDir).getParent match {
      case null => sfDir
      case p if new java.io.File(s"$p/sf0.001").isDirectory => s"$p/sf0.001"
      case _ => sfDir
    }
    if (warmDir != sfDir) runOnce(warmDir)

    // Per-query minimum across iterations (steady state, GC-noise-free).
    // Default 3: a single contended iteration (concurrent JVM stealing
    // cores) can otherwise own the recorded number — the per-query min
    // across three runs defends the record at the cost of two extra
    // passes (~20s at sf0.1, cheap next to session startup).
    val repeat = sys.env.getOrElse("BENCH_REPEAT", "3").toInt max 1
    val runs = (1 to repeat).map(_ => runOnce(sfDir))
    val results = runs.head.map(_._1).map { name =>
      name -> runs.map(_.toMap.apply(name)).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
