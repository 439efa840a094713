package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print each named query's output schema (all registered
  * queries when none are named) without executing it.
  * Usage: tools/run.sh graft.SchemaDump [sfDir] [query ...]
  */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val schema = try SparkEntry.queries(n)(spark, sfDir).schema
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      catch { case e: Exception => s"ERROR ${e.getMessage.take(80)}" }
      println(s"$n | $schema")
    }
    spark.stop()
  }
}
