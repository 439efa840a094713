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

  test("saltedRank reproduces the single-reducer window positions exactly") {
    import org.apache.spark.sql.expressions.Window
    // hot key 0 holds 60% of rows; keys 1..9 split the rest
    val df = (1 to 500).map(i => (if (i % 10 < 6) 0L else (i % 10).toLong, i.toLong))
      .toDF("k", "id")
    val plain = df.withColumn("pos",
      row_number().over(Window.partitionBy(col("k"))
        .orderBy(md5(concat(lit("s1"), col("id").cast("string"))), col("id")))
        .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val salted = Skew.saltedRank(df, Seq("k"), "id", seed = "s1")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(salted === plain)
    // partitioning-invariant (the determinism contract)
    val again = Skew.saltedRank(df.repartition(7), Seq("k"), "id", seed = "s1")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again === plain)
  }

  test("lshCandidatePairs drops an oversized bucket; lshOversizedBuckets reports it") {
    import graft.operators.TextDedup
    // bucket A: 5 docs (hot), bucket B: 2 docs (fine)
    val bands = ((1 to 5).map(i => (0, "A", i.toLong)) ++ Seq((0, "B", 10L), (0, "B", 11L)))
      .toDF("band_id", "band_hash", "doc_id")
    val pairs = TextDedup.lshCandidatePairs(bands, "doc_id", maxBucketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L))) // only the small bucket's pair survives
    val hot = TextDedup.lshOversizedBuckets(bands, maxBucketSize = 3).collect()
    assert(hot.length === 1 && hot.head.getString(1) === "A" && hot.head.getLong(2) === 5L)
  }

  test("lsh/mdm caps are not binding at test SF (results unchanged)") {
    import graft.operators.Mdm
    import graft.queries.MdmQueries
    val ents = Tables.table(spark, sfDir, "customer").select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_mktsegment").as("address"),
      col("c_nationkey").as("block_nation"), col("c_mktsegment").as("block_seg"))
    val capped = Mdm.candidatePairsCapped(ents, MdmQueries.schema)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = Mdm.candidatePairs(ents, MdmQueries.schema)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(capped === plain)
  }

  test("candidatePairsCapped routes a hot block out of the pair join") {
    import graft.operators.Mdm
    import graft.operators.Mdm.EntitySchema
    val sch = EntitySchema("id", "name", "address", Seq("blk"))
    val ents = ((1 to 6).map(i => (i.toLong, s"n$i", s"a$i", "hot")) ++
      Seq((10L, "x", "y", "cold"), (11L, "x", "y", "cold")))
      .toDF("id", "name", "address", "blk")
    val pairs = Mdm.candidatePairsCapped(ents, sch, maxBlockSize = 4)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L)))
    val (_, rejected) = Mdm.capBlocks(ents, sch, maxBlockSize = 4)
    assert(rejected.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      (1L to 6L).toSeq)
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

  test("AQE skew-join actually splits a skewed partition (the runtime re-plan path)") {
    // GraftSession runs with AQE on; this proves the skew-join branch
    // FIRES, not just that the conf is set. One key carries ~100k rows
    // vs ~10 rows for the rest; thresholds are lowered so local-mode
    // volumes qualify as skewed.
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 7 carries 200k rows; the rest of the key space holds
      // 10k singleton keys — the hot partition is ~40x the median
      val left = spark.range(210000).select(
        when($"id" < 10000, $"id").otherwise(lit(7L)).as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("pad"))
      val right = spark.range(1000).select($"id".as("k"), lit("dim").as("v"))
      // drive THIS dataset's QueryExecution (a write would re-plan a
      // fresh one and leave this plan un-executed/isFinalPlan=false)
      val joined = left.join(right, "k")
      // 1000 singleton matches (k<1000) + 200000 rows on hot key 7
      assert(joined.count() === 201000)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
