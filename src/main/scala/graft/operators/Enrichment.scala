package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension-enrichment operator — the Glue-2 curated-zone semantics
  * (`nyc_validated_to_curated_etl.py:103-155`, `day7_enrichment_final
  * .py:46-73`) re-expressed Spark-first.
  *
  * The same dimension can be joined multiple times under different
  * prefixes (the reference's pu_* / do_* zone joins). Dims are
  * broadcast by default: at 100 TB fact scale the join stays map-side
  * with zero fact shuffle; set `broadcastDim=false` only when the dim
  * itself is large (then Catalyst/AQE picks sort-merge).
  */
object Enrichment {

  /** Left-join `dim` onto `fact` with every non-key dim column renamed
    * to `prefix<col>` (P10 rename discipline), dropping the dim-side
    * key after the join.
    */
  def enrichWithDim(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String, prefix: String,
                    broadcastDim: Boolean = true): DataFrame = {
    val renamed = dim.columns.foldLeft(dim) { (d, c) =>
      if (c == dimKey) d else d.withColumnRenamed(c, s"$prefix$c")
    }
    val right = if (broadcastDim) broadcast(renamed) else renamed
    fact.join(right, fact(factKey) === right(dimKey), "left")
      .drop(right(dimKey))
  }

  /** Unknown-member fallback (ref `day16_zones.yml data_quality.
    * unknown_row`: `location_id: -1` "Fallback for unmapped zones"):
    * after a left enrichment, coalesce each dim attribute of
    * unmatched fact rows to the dimension's declared unknown-member
    * value, so downstream grouping never sees nulls and unmapped keys
    * roll up under one explicit member. Pure projection — no extra
    * join or shuffle.
    */
  def withUnknownMember(enriched: DataFrame, probeCol: String,
                        defaults: Map[String, Any]): DataFrame = {
    // Materialize the match test BEFORE rewriting any column: the
    // probe column may itself be a default target, and a rewritten
    // probe would make later defaults see "matched".
    val tagged = enriched.withColumn("_unmatched", col(probeCol).isNull)
    defaults.foldLeft(tagged) { case (df, (c, v)) =>
      df.withColumn(c, when(col("_unmatched"), lit(v)).otherwise(col(c)))
    }.drop("_unmatched")
  }

  /** Orphan guard (ref `nyc_validated_to_curated_etl.py:141-145`):
    * count of fact rows whose key found no dim match. Callers raise
    * when > 0 (fail-the-job semantics) or route to quarantine.
    */
  def orphanCount(enriched: DataFrame, probeCol: String): Long =
    enriched.filter(col(probeCol).isNull).count()

  /** Quarantine split by referential integrity (ref glue_mdm.py:33-44):
    * (matched, orphans) via semi/anti joins — the anti side preserves
    * ALL fact columns, unlike a null-probe filter after a left join.
    */
  def riSplit(fact: DataFrame, dim: DataFrame,
              factKey: String, dimKey: String): (DataFrame, DataFrame) = {
    val keys = broadcast(dim.select(col(dimKey).as(factKey)))
    // USING-joins hoist the key column to the front; restore the
    // fact's original column order.
    val order = fact.columns.map(col).toSeq
    (fact.join(keys, Seq(factKey), "left_semi").select(order: _*),
     fact.join(keys, Seq(factKey), "left_anti").select(order: _*))
  }

  /** Lineage/audit stamp (ref :151-155). `asOf` is injected rather
    * than current_timestamp() so runs are reproducible and
    * oracle-verifiable (SURVEY.md §7.5.2).
    */
  def addLineage(df: DataFrame, dataSource: String, runId: String,
                 asOf: java.sql.Timestamp): DataFrame =
    df.withColumn("data_source", lit(dataSource))
      .withColumn("run_id", lit(runId))
      .withColumn("curated_timestamp_utc", lit(asOf))
}
