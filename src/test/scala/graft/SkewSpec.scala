package graft

import graft.functions.Functions.exactSum
import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the unsalted aggregation exactly") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "l_extendedprice",
      distributeBy = col("l_orderkey"), factor = 8)
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy("l_returnflag")
      .agg(exactSum(col("l_extendedprice")).as("s"), count(lit(1)).as("c"))
      .orderBy("l_returnflag").collect()
    assert(salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ===
      plain.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq)
  }

  test("saltedJoin equals the plain join row-for-row") {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
    val supp = Tables.table(spark, sfDir, "supplier").select("s_suppkey", "s_name")
    val salted = Skew.saltedJoin(li, supp, "l_suppkey", "s_suppkey",
      distributeBy = col("l_orderkey"), factor = 4)
    val plain = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
    assert(salted.count() === plain.count())
    val a = salted.select("l_orderkey", "s_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = plain.select("l_orderkey", "s_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a === b)
  }
}
