package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Governance lineage + dataset metadata — the reference's
  * `governance/lineage_schema.json` contract and
  * `metadata_manifest.json` catalog record (built by `newpy.py:
  * create_metadata_manifest`), re-expressed as typed rows written
  * through the lake's JSON metrics sink (S11) instead of a Redshift
  * INSERT (`lambda/write_data_lineage/lambda_function.py:15-44`).
  */
object Lineage {

  /** Zone layers, ordered (lineage_schema.json `layers`). */
  val Layers: Seq[String] = Seq("raw", "validated", "curated", "analytics")

  /** One lineage edge — field set = lineage_schema.json
    * `required_fields`, exactly.
    */
  final case class DataLineage(
      pipeline_run_id: String,
      job_name: String,
      source_layer: String,
      target_layer: String,
      source_object: String,
      target_object: String,
      record_count: Long,
      run_timestamp: java.sql.Timestamp)

  /** Construct a lineage edge, enforcing the layer vocabulary and the
    * zone ordering (data may only flow toward more refined layers —
    * the schema's `layers` list is ordered).
    */
  def edge(runId: String, jobName: String,
           sourceLayer: String, targetLayer: String,
           sourceObject: String, targetObject: String,
           recordCount: Long, asOf: java.sql.Timestamp): DataLineage = {
    require(Layers.contains(sourceLayer), s"unknown layer $sourceLayer")
    require(Layers.contains(targetLayer), s"unknown layer $targetLayer")
    require(Layers.indexOf(sourceLayer) < Layers.indexOf(targetLayer),
      s"lineage must flow forward: $sourceLayer → $targetLayer")
    DataLineage(runId, jobName, sourceLayer, targetLayer,
      sourceObject, targetObject, recordCount, asOf)
  }

  def toDf(spark: SparkSession, edges: Seq[DataLineage]): DataFrame = {
    import spark.implicits._
    edges.toDF()
  }

  /** Append lineage rows to the audit path — single-file JSON per run
    * (S11), the lake-native analog of the lambda's warehouse INSERT.
    */
  def write(df: DataFrame, basePath: String, runId: String): Unit =
    Tables.writeJsonSingleFile(df, s"$basePath/run_id=$runId")

  /** Dataset metadata manifest (metadata_manifest.json /
    * newpy.py:152-170): ownership, classification, retention — the
    * "who owns this dataset" catalog record, one row per dataset.
    */
  def metadataManifest(spark: SparkSession, dataset: String, bucket: String,
                       owner: String, domain: String, classification: String,
                       createdOn: java.sql.Timestamp,
                       retentionPolicy: String,
                       zones: Seq[String]): DataFrame =
    spark.range(1).select(
      lit(dataset).as("dataset"),
      lit(bucket).as("bucket"),
      lit(owner).as("owner"),
      lit(domain).as("domain"),
      lit(classification).as("classification"),
      lit(createdOn).as("created_on"),
      lit(retentionPolicy).as("retention_policy"),
      array(zones.map(lit): _*).as("zones"))
}
