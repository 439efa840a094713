package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for named queries (or the
  * default audit set) to check pushdown / broadcast / codegen spans.
  * Usage: tools/run.sh graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("daily_revenue", "e2e_curated", "j04_semi_exists", "mdm_match_pairs")
    // GraftSession, NOT a bare builder: the bench/verify path runs with
    // AQE + the engine extensions + the session shuffle-partition
    // shape, and a probe session missing those prints a DIFFERENT plan
    // than the one the bench executes (same lesson as Micro's header).
    val spark = GraftSession.local("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
