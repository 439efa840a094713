package graft

import graft.operators.{Mdm, Scd2, Validation}
import graft.operators.Mdm.EntitySchema
import graft.operators.Scd2.Config
import graft.operators.Validation._
import graft.sources.Tables
import org.apache.spark.sql.functions._

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("rulesFromJsonFile parses the reference rule-suite shape") {
    val dir = java.nio.file.Files.createTempDirectory("rules").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/rules.json"),
      """{"rules": [
        |  {"column": "vendorid", "check": "not_null", "severity": "ERROR"},
        |  {"column": "passenger_count", "check": "between", "min": 1, "max": 8,
        |   "severity": "WARN"},
        |  {"column": "state", "check": "allowed_values",
        |   "allowed_values": ["NY", "CA", "TX", "MA"], "severity": "ERROR"},
        |  {"column": "fare_amount", "check": "non_negative"}
        |]}""".stripMargin)
    val rules = Validation.rulesFromJsonFile(spark, s"$dir/rules.json")
    assert(rules.size === 4)
    assert(rules(0) === NotNull("vendorid", Error))
    assert(rules(1) === Between("passenger_count", 1, 8, Warn))
    assert(rules(2) === AllowedValues("state", Seq("NY", "CA", "TX", "MA"), Error))
    assert(rules(3) === GreaterThan("fare_amount", 0.0, orEqual = true, Error))

    // parsed rules drive the engine end-to-end
    val df = Seq((1, 4, "NY", 10.0), (2, 9, "ZZ", -1.0))
      .toDF("vendorid", "passenger_count", "state", "fare_amount")
    val (good, bad) = Validation.split(Validation.annotate(df, rules))
    assert(good.count() === 1 && bad.count() === 1)
  }

  test("rollbackVersion reverts to prior values as a new version") {
    val conf = Config(Seq("id"), Seq("name", "city"), Seq("name"))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val b0 = Seq((1, "acme", "nyc")).toDF("id", "name", "city")
    val b1 = Seq((1, "acme", "boston")).toDF("id", "name", "city")
    val merged = Scd2.merge(Scd2.initialLoad(b0, conf, t0), b1, conf, t1)
    val rolled = Scd2.rollbackVersion(merged, conf, Seq(1), t2)
    val cur = rolled.filter($"is_current").collect()
    assert(cur.length === 1)
    assert(cur(0).getAs[String]("city") === "nyc")   // reverted value
    assert(cur(0).getAs[Int]("version_no") === 3)    // history preserved
    assert(rolled.count() === 3)
    assert(Scd2.invariants(rolled, conf).filter(!$"passed").count() === 0)
    // rolling back version 1 is impossible
    intercept[IllegalArgumentException] {
      Scd2.rollbackVersion(Scd2.initialLoad(b0, conf, t0), conf, Seq(1), t1)
    }
  }

  test("capBlocks splits oversized blocks for skew control") {
    val schema = EntitySchema("id", "name", "addr", Seq("blk"))
    val ents = (1 to 10).map(i => (i, s"n$i", "a", "big")).toDF("id", "name", "addr", "blk")
      .unionByName(Seq((11, "x", "a", "small")).toDF("id", "name", "addr", "blk"))
    val (ok, rejected) = Mdm.capBlocks(ents, schema, maxBlockSize = 5)
    assert(ok.count() === 1)
    assert(rejected.count() === 10)
    assert(ok.columns.toSet === ents.columns.toSet)
  }

  test("writeManagedTable overwrites a named catalog table") {
    Tables.writeManagedTable(Seq((1, "a")).toDF("id", "v"), "t_managed")
    Tables.writeManagedTable(Seq((2, "b"), (3, "c")).toDF("id", "v"), "t_managed")
    assert(spark.table("t_managed").count() === 2)
    spark.sql("DROP TABLE t_managed")
  }

  test("lineage edges enforce the layer vocabulary and forward flow") {
    import graft.operators.Lineage
    val asOf = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ok = Lineage.edge("r1", "job", "raw", "curated", "a", "b", 10L, asOf)
    assert(ok.record_count === 10L && ok.target_layer === "curated")
    intercept[IllegalArgumentException] { // backwards flow
      Lineage.edge("r1", "job", "curated", "raw", "a", "b", 1L, asOf)
    }
    intercept[IllegalArgumentException] { // unknown layer
      Lineage.edge("r1", "job", "bronze", "curated", "a", "b", 1L, asOf)
    }
    // round-trips the S11 lineage sink
    val base = java.nio.file.Files.createTempDirectory("lineage").toString
    Lineage.write(Lineage.toDf(spark, Seq(ok)), base, "r1")
    val back = spark.read.json(s"$base/run_id=r1")
    assert(back.count() === 1)
    assert(back.columns.sorted.toSeq === Seq("job_name", "pipeline_run_id",
      "record_count", "run_timestamp", "source_layer", "source_object",
      "target_layer", "target_object"))
  }
}
