package graft

/** Dev audit: list registry query names with NO ScaleOracle check.
  * Any 10×-flagged name auto-joins the in-bench scale-oracle tier
  * (Bench.run), so a name listed here would surface as a
  * "no check registered" skip if it ever flagged — the r13 verdict's
  * ask is that this list stay EMPTY (law, twin, or named exclusion
  * for every registry name). Usage: tools/run.sh graft.OracleGap
  */
object OracleGap {
  def main(args: Array[String]): Unit = {
    val registry = SparkEntry.queries.keys.toSeq.sorted
    val missing = registry.filterNot(ScaleOracle.checks.contains)
    println(s"registry=${registry.size} checks=${ScaleOracle.checks.size} missing=${missing.size}")
    missing.foreach(println)
    val stale = ScaleOracle.checks.keys.toSeq.sorted
      .filterNot(SparkEntry.queries.contains)
    if (stale.nonEmpty) {
      println(s"stale checks (no such query): ${stale.size}")
      stale.foreach(n => println(s"  $n"))
    }
  }
}
