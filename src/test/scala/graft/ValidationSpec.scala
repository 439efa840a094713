package graft

import graft.operators.Validation
import graft.operators.Validation._
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, 10.0, "A"),              // valid
    (2, -5.0, "A"),              // fails positive
    (3, 10.0, "X"),              // fails allowed_values
    (4, 200.0, "N")              // fails between (WARN only)
  ).toDF("id", "amount", "flag")

  private val rules: Seq[Rule] = Seq(
    GreaterThan("amount", 0),
    AllowedValues("flag", Seq("A", "N", "R")),
    Between("amount", 0, 100, Warn))

  test("annotate flags failing rules in declaration order") {
    val rows = Validation.annotate(df, rules)
      .orderBy("id").collect()
    assert(rows.map(_.getAs[String]("failed_rules")).toSeq === Seq(
      "", "greater_than_amount,between_amount", "allowed_values_flag", "between_amount"))
    assert(rows.map(_.getAs[Boolean]("is_valid")).toSeq === Seq(true, false, false, true))
  }

  test("split partitions rows by is_valid without loss") {
    val (good, bad) = Validation.split(Validation.annotate(df, rules))
    assert(good.count() + bad.count() === df.count())
    assert(good.select("id").as[Int].collect().sorted === Array(1, 4))
  }

  test("metrics counts violations per rule and applies the gate") {
    val m = Validation.metrics(Validation.annotate(df, rules), rules,
      "r1", "job", maxErrorRate = 0.25).collect()(0)
    assert(m.getAs[Long]("records_read") === 4)
    assert(m.getAs[Long]("records_valid") === 2)
    assert(m.getAs[Long]("records_quarantined") === 2)
    assert(m.getAs[Long]("violations_greater_than_amount") === 1)
    assert(m.getAs[Long]("violations_between_amount") === 2)
    assert(m.getAs[String]("status") === "FAILED_GATE") // 0.5 > 0.25
  }

  test("unchanged-hash idempotence of the gate: error rate at threshold passes") {
    val m = Validation.metrics(Validation.annotate(df, rules), rules,
      "r1", "job", maxErrorRate = 0.5).collect()(0)
    assert(m.getAs[String]("status") === "SUCCESS")
  }

  test("freshnessCheck flags stale reference data") {
    val data = Seq(graft.functions.Functions.utcTimestamp("2024-01-01 12:00:00")).toDF("ts")
    val fresh = Validation.freshnessCheck(data, "ts", 7,
      graft.functions.Functions.utcTimestamp("2024-01-05 00:00:00")).collect()(0)
    assert(fresh.getAs[Long]("age_days") === 4)
    assert(fresh.getAs[Boolean]("fresh"))
    val stale = Validation.freshnessCheck(data, "ts", 7,
      graft.functions.Functions.utcTimestamp("2024-02-01 00:00:00")).collect()(0)
    assert(!stale.getAs[Boolean]("fresh"))
    // empty input → not fresh (null newest)
    val empty = Validation.freshnessCheck(data.filter($"ts".isNull), "ts", 7,
      graft.functions.Functions.utcTimestamp("2024-02-01 00:00:00")).collect()(0)
    assert(!empty.getAs[Boolean]("fresh"))
  }

  test("runId formats the injected instant as yyyyMMddHHmmss UTC") {
    assert(graft.functions.Functions.runId(
      graft.functions.Functions.utcTimestamp("2024-06-01 09:30:05")) === "20240601093005")
  }

  test("uniquenessCheck finds duplicate groups") {
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val r = Validation.uniquenessCheck(dup, Seq("k")).collect()(0)
    assert(r.getAs[Long]("duplicate_groups") === 1)
    assert(!r.getAs[Boolean]("passed"))
    val ok = Validation.uniquenessCheck(dup, Seq("k", "v")).collect()(0)
    assert(ok.getAs[Boolean]("passed"))
  }

  test("rulesFromYamlFile parses a suite into rules, uniqueness keys, thresholds") {
    val yaml =
      """suite_name: entity_master_quality
        |rules:
        |  - name: id_unique
        |    type: uniqueness
        |    column: id
        |    threshold: 1.0
        |  - name: flag_not_null
        |    type: not_null
        |    column: flag
        |    threshold: 1.0
        |  - name: flag_allowed
        |    type: allowed_values
        |    column: flag
        |    allowed: [A, N, R]
        |    threshold: 0.99
        |  - name: amount_positive
        |    type: positive
        |    column: amount
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("rules", ".yaml")
    java.nio.file.Files.writeString(f, yaml)
    val suite = Validation.rulesFromYamlFile(f.toString)
    assert(suite.suiteName === "entity_master_quality")
    assert(suite.uniquenessCols === Seq("id"))
    assert(suite.thresholds === Map(
      "id_unique" -> 1.0, "flag_not_null" -> 1.0, "flag_allowed" -> 0.99))
    assert(suite.rowRules.map(_.getClass.getSimpleName) ===
      Seq("NotNull", "AllowedValues", "GreaterThan"))
    // parsed rules drive the same annotate path as hand-built ones
    val annotated = Validation.annotate(df, suite.rowRules)
    assert(annotated.filter(col("is_valid")).count() === 2) // ids 1, 4
    // and the uniqueness keys drive the table-level check
    assert(Validation.uniquenessCheck(df, suite.uniquenessCols)
      .collect()(0).getAs[Boolean]("passed"))
  }
}
