package graft

import graft.operators.Mdm
import graft.operators.Mdm.EntitySchema
import org.apache.spark.sql.functions._

class MdmSpec extends SparkSpec {
  import spark.implicits._

  private val schema = EntitySchema("id", "name", "address", Seq("state", "city"))

  private def vendors = Seq(
    (1, "Acme Corp", "123 Main St", "NY", "NYC"),
    (2, "ACME Corporation", "123 Main Street", "NY", "NYC"),
    (3, "Acme Corp", "123 Main St", "NY", "NYC"),       // exact dup of 1
    (4, "Globex", "9 Side Ave", "NY", "NYC"),
    (5, "Initech", "1 Office Park", "CA", "LA")          // different block
  ).toDF("id", "name", "address", "state", "city")

  test("blocking bounds the pair space to same-block pairs with id_1 < id_2") {
    val pairs = Mdm.candidatePairs(vendors, schema)
    // NY/NYC block has 4 entities → C(4,2)=6 pairs; CA block has 1 → 0
    assert(pairs.count() === 6)
    assert(pairs.filter($"id_1" >= $"id_2").count() === 0)
    assert(pairs.filter($"id_1" === 5 || $"id_2" === 5).count() === 0)
  }

  test("adaptive pairs: identical to coarse under the cap, refined key inside oversized blocks") {
    val refined = schema.copy(blockCols = schema.blockCols :+ "street")
    val withStreet = vendors.withColumn("street",
      substring(col("address"), -2, 2))
    val pairKey = (df: org.apache.spark.sql.DataFrame) =>
      df.select("id_1", "id_2").as[(Int, Int)].collect().toSet

    // cap not binding → exactly the coarse pair set
    val noBind = Mdm.candidatePairsAdaptive(withStreet, schema, refined,
      maxBlockSize = 100)
    assert(pairKey(noBind) === pairKey(Mdm.candidatePairs(vendors, schema)))

    // cap 3 → NY/NYC (4 entities) is oversized and re-blocks on
    // street: "St"→{1,3}, "et"→{2}, "ve"→{4} → only the (1,3) pair
    // survives; CA block (1 entity) stays coarse with 0 pairs
    val bind = Mdm.candidatePairsAdaptive(withStreet, schema, refined,
      maxBlockSize = 3)
    assert(pairKey(bind) === Set((1, 3)))
    // scorePairs composes over the adaptive stream (pre-tokenized path)
    val scored = Mdm.scorePairs(bind)
    assert(scored.filter($"governance_action" === "AUTO_MERGE").count() === 1)
  }

  test("scoring routes exact dups to AUTO_MERGE and near dups by threshold") {
    val scored = Mdm.scorePairs(Mdm.candidatePairs(vendors, schema))
    val p13 = scored.filter($"id_1" === 1 && $"id_2" === 3).collect()(0)
    assert(p13.getAs[Double]("final_score") === 100.0)
    assert(p13.getAs[String]("governance_action") === "AUTO_MERGE")
    val p14 = scored.filter($"id_1" === 1 && $"id_2" === 4).collect()(0)
    assert(p14.getAs[String]("confidence_bucket") === "LOW")
  }

  test("golden records apply longest-string survivorship") {
    val scored = Mdm.scorePairs(Mdm.candidatePairs(vendors, schema))
    val golden = Mdm.goldenRecords(scored).collect()
    assert(golden.nonEmpty)
    val g13 = golden.find(_.getAs[String]("source_ids") == "1,3").get
    assert(g13.getAs[String]("golden_name") === "Acme Corp")
  }

  test("scorecard ratios match the reference formulas") {
    val scored = Mdm.scorePairs(Mdm.candidatePairs(vendors, schema))
    val sc = Mdm.scorecard(5, scored).collect()(0)
    assert(sc.getAs[Long]("total_records") === 5)
    assert(sc.getAs[Long]("duplicate_candidate_pairs") === 6)
    assert(sc.getAs[Double]("duplicate_rate_percent") === 120.0) // 6/5*100
  }

  test("lifecycle transitions enforce the legal state machine") {
    val ts = graft.functions.Functions.utcTimestamp("2024-06-01 00:00:00")
    val master = Seq(("MV-00001", "PROPOSED"), ("MV-00002", "ACTIVE"))
      .toDF("master_id", "lifecycle_state")
      .withColumn("state_changed_at", lit(null).cast("timestamp"))
    val (updated, history) =
      Mdm.transition(master, "master_id", Seq("MV-00001"), "ACTIVE", "steward1", ts)
    assert(updated.filter($"master_id" === "MV-00001").collect()(0)
      .getAs[String]("lifecycle_state") === "ACTIVE")
    assert(history.collect()(0).getAs[String]("from_state") === "PROPOSED")
    // PROPOSED cannot retire directly
    intercept[IllegalArgumentException] {
      Mdm.transition(master, "master_id", Seq("MV-00001"), "RETIRED", "x", ts)
    }
    // RETIRED is terminal
    val retired = Seq(("MV-00003", "RETIRED")).toDF("master_id", "lifecycle_state")
      .withColumn("state_changed_at", lit(null).cast("timestamp"))
    intercept[IllegalArgumentException] {
      Mdm.transition(retired, "master_id", Seq("MV-00003"), "ACTIVE", "x", ts)
    }
  }

  test("lifecycle metrics count states and events") {
    val master = Seq(("a", "ACTIVE"), ("b", "RETIRED"), ("c", "ACTIVE"))
      .toDF("master_id", "lifecycle_state")
    val history = Seq(("a", "PROPOSED", "ACTIVE"), ("b", "DEPRECATED", "RETIRED"))
      .toDF("master_id", "from_state", "to_state")
    val m = Mdm.lifecycleMetrics(master, history).collect()(0)
    assert(m.getAs[Long]("total_master_records") === 3)
    assert(m.getAs[Long]("active_records") === 2)
    assert(m.getAs[Long]("retired_records") === 1)
    assert(m.getAs[Long]("lifecycle_events") === 2)
  }
}
