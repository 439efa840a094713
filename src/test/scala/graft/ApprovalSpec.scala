package graft

import graft.operators.{Scd2, Similarity}
import graft.operators.Scd2.Config
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ApprovalSpec extends SparkSpec {
  import spark.implicits._

  test("approveVersion stamps one version and emits the action record") {
    val conf = Config(Seq("id"), Seq("name", "city"), Seq("name"))
    val t0 = graft.functions.Functions.utcTimestamp("2024-01-01 00:00:00")
    val t1 = graft.functions.Functions.utcTimestamp("2024-02-01 00:00:00")
    val merged = Scd2.merge(
      Scd2.initialLoad(Seq((1, "acme", "nyc")).toDF("id", "name", "city"), conf, t0),
      Seq((1, "acme", "boston")).toDF("id", "name", "city"), conf, t1)

    val (updated, action) =
      Scd2.approveVersion(merged, conf, Seq(1), versionNo = 2, "steward1", t1)
    val v2 = updated.filter($"version_no" === 2).collect()(0)
    assert(v2.getAs[String]("approval_status") === "APPROVED")
    assert(v2.getAs[String]("approved_by") === "steward1")
    val v1 = updated.filter($"version_no" === 1).collect()(0)
    assert(v1.getAs[String]("approval_status") == null)
    val act = action.collect()(0)
    assert(act.getAs[String]("action") === "APPROVE")
    assert(act.getAs[Int]("version_no") === 2)
    // nonexistent version rejected
    intercept[IllegalArgumentException] {
      Scd2.approveVersion(merged, conf, Seq(1), versionNo = 9, "x", t1)
    }
  }

  test("auditRecord materializes a DESCRIBE-HISTORY-style row per write") {
    val rec = Scd2.auditRecord(spark, "MERGE", version = 2, rowCount = 115,
      graft.functions.Functions.utcTimestamp("2024-02-01 00:00:00")).collect()(0)
    assert(rec.getAs[Long]("table_version") === 2)
    assert(rec.getAs[String]("operation") === "MERGE")
    assert(rec.getAs[Long]("row_count") === 115)
  }

  test("IVF top-k scores exactly match brute force for shared candidates") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 3)
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 10,
      numCentroids = 8, nprobe = 1)
    assert(ivf.count() > 0)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1000)
      .select($"query_id", $"cand_id", $"cos_sim".as("bf"))
    val joined = ivf.join(brute, Seq("query_id", "cand_id"), "left")
    assert(joined.filter($"bf".isNull || $"cos_sim" =!= $"bf").count() === 0)
  }

  test("IVF nprobe widens recall monotonically") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 3)
    def n(p: Int) = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      k = 10, numCentroids = 8, nprobe = p).count()
    assert(n(2) >= n(1))
  }
}
