package graft

import graft.operators.Enrichment
import org.apache.spark.sql.functions._

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq((1, 10, 5.0), (2, 20, 6.0), (3, 99, 7.0))
    .toDF("trip_id", "zone_id", "fare")
  private def dim = Seq((10, "Manhattan", "Midtown"), (20, "Queens", "Astoria"))
    .toDF("locationid", "borough", "zone")

  test("enrichWithDim renames dim columns under the prefix and left-joins") {
    val out = Enrichment.enrichWithDim(fact, dim, "zone_id", "locationid", "pu_")
    assert(out.columns.toSet === Set("trip_id", "zone_id", "fare", "pu_borough", "pu_zone"))
    val row = out.filter($"trip_id" === 1).collect()(0)
    assert(row.getAs[String]("pu_borough") === "Manhattan")
    // orphan keeps the fact row with nulls (left join)
    assert(out.filter($"trip_id" === 3).collect()(0).getAs[String]("pu_borough") == null)
  }

  test("same dim joins twice under different prefixes") {
    val f2 = fact.withColumnRenamed("zone_id", "pu_id").withColumn("do_id", lit(20))
    val once = Enrichment.enrichWithDim(f2, dim, "pu_id", "locationid", "pu_")
    val twice = Enrichment.enrichWithDim(once, dim, "do_id", "locationid", "do_")
    assert(twice.columns.count(_.endsWith("borough")) === 2)
  }

  test("orphanCount counts unmatched fact rows") {
    val out = Enrichment.enrichWithDim(fact, dim, "zone_id", "locationid", "pu_")
    assert(Enrichment.orphanCount(out, "pu_borough") === 1)
  }

  test("riSplit quarantines orphans with all fact columns intact") {
    val (matched, orphans) = Enrichment.riSplit(fact, dim, "zone_id", "locationid")
    assert(matched.count() === 2)
    assert(orphans.count() === 1)
    assert(orphans.columns.toSeq === fact.columns.toSeq)
    assert(orphans.select("trip_id").as[Int].collect() === Array(3))
  }

  test("withUnknownMember coalesces unmatched rows to the declared unknown member") {
    import org.apache.spark.sql.functions.col
    val dim = Seq((1, "Zone A", 10L), (2, "Zone B", 20L)).toDF("zone_id", "zone_name", "region")
    val facts = Seq((100, 1), (101, 2), (102, 99)).toDF("trip_id", "pu_zone") // 99 unmapped
    val enriched = Enrichment.enrichWithDim(facts, dim, "pu_zone", "zone_id", "z_")
    val out = Enrichment.withUnknownMember(enriched, "z_zone_name",
      Map("z_zone_name" -> "UNKNOWN", "z_region" -> -1L))
      .orderBy("trip_id").collect()
    assert(out.map(_.getAs[String]("z_zone_name")).toSeq === Seq("Zone A", "Zone B", "UNKNOWN"))
    assert(out.map(_.getAs[Long]("z_region")).toSeq === Seq(10L, 20L, -1L))
    // matched rows untouched
    assert(out(0).getAs[Int]("trip_id") === 100)
  }

  test("addLineage stamps deterministic audit columns") {
    val ts = graft.functions.Functions.utcTimestamp("2024-06-01 00:00:00")
    val out = Enrichment.addLineage(fact, "nyc_tlc", "r42", ts)
    val row = out.limit(1).collect()(0)
    assert(row.getAs[String]("data_source") === "nyc_tlc")
    assert(row.getAs[String]("run_id") === "r42")
    assert(row.getAs[java.sql.Timestamp]("curated_timestamp_utc") === ts)
  }
}
