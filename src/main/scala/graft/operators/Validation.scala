package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine.
  *
  * Re-expresses the reference's JSON/YAML rule suites
  * (`governance/data_quality_rules.json`, `data_quality_rules.json`,
  * `day5-infra/governance/data_quality/taxi_zone_rules.yaml`) and the
  * inline validity CASE WHEN (`nyc_raw_to_validated_etl.py:67-74`) as
  * a rule ADT compiled to Catalyst `Column` predicates — the whole
  * rule suite evaluates in ONE pass over the data inside
  * WholeStageCodegen, so rule count doesn't add scans.
  */
object Validation {

  sealed trait Severity
  case object Error extends Severity // row quarantined
  case object Warn extends Severity  // flagged, not quarantined

  /** Row-level rule: compiles to a pass/fail Column predicate. */
  sealed trait Rule {
    def name: String
    def severity: Severity
    /** Predicate that is TRUE when the row PASSES. */
    def passes: Column
  }

  /** not_null (ref data_quality_rules.json "NOT_NULL" → QUARANTINE). */
  final case class NotNull(column: String, severity: Severity = Error) extends Rule {
    val name = s"not_null_$column"
    def passes: Column = col(column).isNotNull
  }

  /** between lo..hi inclusive (ref governance rules: passenger_count 1-8). */
  final case class Between(column: String, lo: Double, hi: Double,
                           severity: Severity = Warn) extends Rule {
    val name = s"between_$column"
    def passes: Column = col(column).isNotNull && col(column) >= lo && col(column) <= hi
  }

  /** allowed_values / IN-set (ref taxi_zone_rules.yaml borough set). */
  final case class AllowedValues(column: String, values: Seq[String],
                                 severity: Severity = Error) extends Rule {
    val name = s"allowed_values_$column"
    def passes: Column = col(column).isin(values: _*)
  }

  /** strictly-positive / non-negative style bounds
    * (ref nyc_raw_to_validated_etl.py:70-71). */
  final case class GreaterThan(column: String, value: Double, orEqual: Boolean = false,
                               severity: Severity = Error) extends Rule {
    val name = s"greater_than_$column"
    def passes: Column =
      if (orEqual) col(column).isNotNull && col(column) >= value
      else col(column).isNotNull && col(column) > value
  }

  /** column-vs-column comparison (ref dropoff >= pickup at :72). */
  final case class ColumnGte(left: String, right: String,
                             severity: Severity = Error) extends Rule {
    val name = s"gte_${left}_$right"
    def passes: Column = col(left).isNotNull && col(right).isNotNull && col(left) >= col(right)
  }

  /** Annotated frame: input + per-rule flags, `failed_rules` (stable
    * rule-declaration order, comma-joined) and `is_valid` (no Error
    * rule failed). One projection, no shuffle.
    */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val failedList = concat_ws(",",
      rules.map(r => when(!r.passes, lit(r.name))): _*)
    val isValid = rules.filter(_.severity == Error)
      .map(_.passes).reduceOption(_ && _).getOrElse(lit(true))
    df.withColumn("failed_rules", failedList)
      .withColumn("is_valid", isValid)
  }

  /** Good/bad split over the annotated frame (ref :76-77). Caller
    * should cache `annotated` when materializing both branches — the
    * reference recomputes the plan per action; we don't.
    */
  def split(annotated: DataFrame): (DataFrame, DataFrame) =
    (annotated.filter(col("is_valid")), annotated.filter(!col("is_valid")))

  /** Single-pass run metrics (ref metrics record
    * `nyc_raw_to_validated_etl.py:106-113` + per-rule violation counts
    * in the transform_check.py convention): one aggregation job, one
    * output row.
    */
  def metrics(annotated: DataFrame, rules: Seq[Rule], runId: String,
              jobName: String, maxErrorRate: Double = 0.01): DataFrame = {
    val ruleCounts = rules.map(r =>
      sum(when(!r.passes, 1).otherwise(0)).cast("long").as(s"violations_${r.name}"))
    val aggCols = Seq(
      sum(when(col("is_valid"), 1).otherwise(0)).cast("long").as("records_valid"),
      sum(when(!col("is_valid"), 1).otherwise(0)).cast("long").as("records_quarantined")) ++
      ruleCounts
    val base = annotated.agg(count(lit(1)).as("records_read"), aggCols: _*)
    base
      .withColumn("run_id", lit(runId))
      .withColumn("job_name", lit(jobName))
      .withColumn("error_rate",
        round(col("records_quarantined").cast("double") / col("records_read"), 4))
      .withColumn("status",
        when(col("error_rate") <= maxErrorRate, "SUCCESS").otherwise("FAILED_GATE"))
  }

  /** Data-driven rule loading — parses the reference's declarative
    * rule-suite shape (`governance/data_quality_rules.json`:
    * `{"rules": [{"column", "check" | "type", "min"/"max",
    * "allowed_values", "severity"}]}`) into the rule ADT. Uses
    * spark.read.json so no JSON library dependency.
    */
  def rulesFromJsonFile(spark: org.apache.spark.sql.SparkSession,
                        path: String): Seq[Rule] = {
    val df = spark.read.option("multiLine", "true").json(path)
    val rulesDf =
      if (df.columns.contains("rules"))
        df.select(explode(col("rules")).as("r")).select("r.*")
      else df
    val cols = rulesDf.columns.toSet
    def opt(row: org.apache.spark.sql.Row, c: String): Option[Any] =
      if (cols.contains(c) && !row.isNullAt(row.fieldIndex(c)))
        Some(row.get(row.fieldIndex(c)))
      else None
    rulesDf.collect().toSeq.map { row =>
      val column = opt(row, "column").map(_.toString)
        .getOrElse(sys.error("rule missing 'column'"))
      val sev = opt(row, "severity").map(_.toString.toUpperCase) match {
        case Some("WARN") | Some("WARNING") => Warn
        case _ => Error
      }
      val check = opt(row, "check").orElse(opt(row, "type"))
        .map(_.toString.toLowerCase).getOrElse("not_null")
      check match {
        case "not_null" => NotNull(column, sev)
        case "between" | "range" =>
          Between(column,
            opt(row, "min").map(_.toString.toDouble).getOrElse(Double.MinValue),
            opt(row, "max").map(_.toString.toDouble).getOrElse(Double.MaxValue),
            sev)
        case "allowed_values" | "in" =>
          val vals = row.getAs[scala.collection.Seq[Any]](
            row.fieldIndex("allowed_values")).map(_.toString).toSeq
          AllowedValues(column, vals, sev)
        case "positive" | "greater_than" =>
          GreaterThan(column, opt(row, "min").map(_.toString.toDouble).getOrElse(0.0),
            orEqual = false, sev)
        case "non_negative" =>
          GreaterThan(column, 0.0, orEqual = true, sev)
        case other => sys.error(s"unknown rule check: $other")
      }
    }
  }

  /** A parsed YAML rule suite (ref `day5-infra/governance/
    * data_quality/taxi_zone_rules.yaml`): row-level rules plus
    * table-level uniqueness keys and per-rule pass-rate thresholds.
    */
  final case class RuleSuite(
      suiteName: String,
      rowRules: Seq[Rule],
      uniquenessCols: Seq[String],
      thresholds: Map[String, Double])

  /** YAML rule-suite loading — the reference's second rule format
    * (`suite_name` + `rules: [{name, type, column, threshold,
    * allowed}]`). Uses snakeyaml from Spark's own classpath; row
    * rules map onto the Rule ADT, `uniqueness` rules surface as key
    * columns for [[uniquenessCheck]].
    */
  def rulesFromYamlFile(path: String): RuleSuite = {
    import scala.jdk.CollectionConverters._
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val suiteName = Option(root.get("suite_name")).map(_.toString).getOrElse("suite")
    val ruleMaps = root.get("rules").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.toSeq.map(_.asScala.toMap)
    val thresholds = ruleMaps.flatMap { m =>
      m.get("threshold").map(t => m("name").toString -> t.toString.toDouble)
    }.toMap
    val (uniq, row) = ruleMaps.partition(_("type").toString == "uniqueness")
    val rowRules = row.map { m =>
      val column = m("column").toString
      m("type").toString match {
        case "not_null" => NotNull(column)
        case "allowed_values" =>
          AllowedValues(column,
            m("allowed").asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
        case "between" | "range" =>
          Between(column,
            m.get("min").map(_.toString.toDouble).getOrElse(Double.MinValue),
            m.get("max").map(_.toString.toDouble).getOrElse(Double.MaxValue))
        case "positive" => GreaterThan(column, 0.0, orEqual = false)
        case other => sys.error(s"unknown yaml rule type: $other")
      }
    }
    RuleSuite(suiteName, rowRules, uniq.map(_("column").toString), thresholds)
  }

  /** Reference-data freshness check (ref `lambda.py:21-28,95-108`:
    * staleness alert when newest record is older than the SLA).
    * Returns one row: (newest_ts, age_days, fresh). `asOf` injected
    * for determinism.
    */
  def freshnessCheck(df: DataFrame, tsCol: String, maxAgeDays: Int,
                     asOf: java.sql.Timestamp): DataFrame =
    df.agg(max(col(tsCol)).as("newest_ts"))
      .withColumn("age_days",
        datediff(lit(asOf), col("newest_ts").cast("date")).cast("long"))
      .withColumn("fresh",
        col("newest_ts").isNotNull && col("age_days") <= maxAgeDays)

  /** Uniqueness rule — table-level, needs an aggregation (ref
    * taxi_zone_rules.yaml uniqueness; verify_delta_vendors_job.py:57-62).
    * Returns one row: (rule_name, duplicate_groups, passed). The
    * groupBy shuffles only the key columns; at scale prefer running it
    * on the (much smaller) key projection, which Catalyst prunes to
    * automatically.
    */
  def uniquenessCheck(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .agg(count(lit(1)).as("duplicate_groups"))
      .select(
        lit(s"unique_${keyCols.mkString("_")}").as("rule_name"),
        col("duplicate_groups"),
        (col("duplicate_groups") === 0).as("passed"))
}
