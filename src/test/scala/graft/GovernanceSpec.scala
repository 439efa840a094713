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
    val t0 = graft.functions.Functions.utcTimestamp("2024-01-01 00:00:00")
    val t1 = graft.functions.Functions.utcTimestamp("2024-02-01 00:00:00")
    val t2 = graft.functions.Functions.utcTimestamp("2024-03-01 00:00:00")
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
    val asOf = graft.functions.Functions.utcTimestamp("2024-01-01 00:00:00")
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

  test("rbac: denied zones throw before any job, PII redacts for unprivileged roles") {
    import graft.operators.Governance
    import graft.operators.Governance._
    val base = java.nio.file.Files.createTempDirectory("rbac").toString
    val df = Seq((1L, "Alice Cooper", 10.0), (2L, "Bob Dylan", 20.0))
      .toDF("id", "name", "amount")
    // etl may write the curated zone
    Governance.writeZone(df, ReferenceRoles, "etl", "curated", s"$base/curated")
    // analyst may NOT write curated (read-only grant) — deny throws
    // driver-side, and nothing lands on disk
    intercept[Governance.AccessDeniedException] {
      Governance.writeZone(df.withColumn("amount", lit(0.0)),
        ReferenceRoles, "analyst", "curated", s"$base/curated2")
    }
    assert(!new java.io.File(s"$base/curated2").exists())
    // analyst may NOT read raw at all
    intercept[Governance.AccessDeniedException] {
      Governance.readZone(spark, ReferenceRoles, "analyst", "raw", s"$base/curated")
    }
    // unknown zone denies by default
    intercept[Governance.AccessDeniedException] {
      Governance.checkRead(ReferenceRoles, "etl", "secret")
    }
    // analyst CAN read curated, but PII columns come back redacted —
    // referentially stable (equal names → equal hashes), values gone
    val analystView = Governance.readZone(spark, ReferenceRoles, "analyst",
      "curated", s"$base/curated", piiCols = Set("name"))
    val names = analystView.select("name").collect().map(_.getString(0))
    assert(names.forall(_.matches("[0-9a-f]{64}")))
    // steward has governance read → sees raw PII
    val stewardView = Governance.readZone(spark, ReferenceRoles, "steward",
      "curated", s"$base/curated", piiCols = Set("name"))
    assert(stewardView.select("name").collect().map(_.getString(0)).sorted
      === Array("Alice Cooper", "Bob Dylan"))
  }

  test("rbac: the reference csv matrix round-trips through the parser") {
    import graft.operators.Governance
    val dir = java.nio.file.Files.createTempDirectory("rbaccsv").toString
    // the reference's rbac_matrix.csv shape (quoted description field)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/rbac_matrix.csv"),
      """role_name,raw_zone,validated_zone,curated_zone,governance_zone,description
        |etl-role,read_write,read_write,read_write,read,"ETL jobs ingest, validate, and curate data"
        |analyst-role,no_access,read,read,no_access,Analysts consume curated data
        |""".stripMargin)
    val roles = Governance.rolesFromCsv(spark, s"$dir/rbac_matrix.csv")
    assert(roles.map(_.name) === Seq("etl-role", "analyst-role"))
    assert(roles(0).grants("raw") === Governance.ReadWrite)
    assert(roles(0).grants("governance") === Governance.ReadOnly)
    assert(roles(1).grants("raw") === Governance.NoAccess)
    val m = Governance.permissionMatrix(spark, roles)
    assert(m.count() === 8)
    assert(m.filter(col("can_write")).count() === 3)
  }

  test("data dictionary derives columns, rules, and sensitivity from the schema") {
    import graft.operators.Governance
    val schema = Seq((1L, "n", 2.5)).toDF("id", "name", "score").schema
    val dict = Governance.dataDictionary(spark, "t", schema,
      rules = Seq(NotNull("id"), Between("score", 0, 5), NotNull("score")),
      piiCols = Set("name")).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(dict.keySet === Set("id", "name", "score"))
    assert(dict("id").getString(2) === "bigint")
    assert(dict("score").getString(4) === "between_score,not_null_score")
    assert(dict("name").getBoolean(5) && dict("name").getString(6) === "Confidential")
    assert(!dict("id").getBoolean(5) && dict("id").getString(6) === "Internal")
  }

  test("dictionary-driven redaction: a dictionary edit changes the governed projection") {
    import graft.operators.Governance
    import graft.operators.Governance._
    val base = java.nio.file.Files.createTempDirectory("rbacdict").toString
    val df = Seq((1L, "Alice Cooper", 10.0), (2L, "Bob Dylan", 20.0))
      .toDF("id", "name", "amount")
    Governance.writeZone(df, ReferenceRoles, "etl", "curated", s"$base/curated")
    def view(role: String, dict: org.apache.spark.sql.DataFrame) =
      Governance.readZoneGoverned(spark, ReferenceRoles, role, "curated",
        s"$base/curated", dict, "curated")
    val hex64 = "[0-9a-f]{64}"

    val dict1 = Governance.dataDictionary(spark, "curated", df.schema,
      rules = Nil, piiCols = Set("name"))
    val v1 = view("analyst", dict1)
    assert(v1.select("name").collect().map(_.getString(0)).forall(_.matches(hex64)))
    assert(v1.select("amount").collect().map(_.getDouble(0)).sorted === Array(10.0, 20.0))

    // flipping a column's is_pii flag in the dictionary redacts it in
    // the next governed read — no call-site PII list to update
    val dict2 = Governance.dataDictionary(spark, "curated", df.schema,
      rules = Nil, piiCols = Set("name", "amount"))
    val v2 = view("analyst", dict2)
    assert(v2.select("amount").collect().map(_.getString(0)).forall(_.matches(hex64)))

    // raw PII is an explicit capability, not governance readability:
    // etl READS the governance zone but is redacted like any other
    // role; only the steward capability sees raw values
    assert(ReferenceRoles.find(_.name == "etl").exists(r =>
      r.grants("governance").canRead && !r.rawPii))
    val etlView = view("etl", dict1)
    assert(etlView.select("name").collect().map(_.getString(0)).forall(_.matches(hex64)))
    val stewardView = view("steward", dict1)
    assert(stewardView.select("name").collect().map(_.getString(0)).sorted
      === Array("Alice Cooper", "Bob Dylan"))
  }

  test("storage lifecycle: archive renames, delete removes, audit records, re-run is a no-op") {
    import graft.operators.Governance
    val base = java.nio.file.Files.createTempDirectory("lifecycle").toString
    val zone = s"$base/raw"
    val archive = s"$base/glacier"
    // three daily partitions: fresh, archivable, expired (vs asOf)
    Seq(("2024-06-01", 1L), ("2024-04-01", 2L), ("2023-01-01", 3L))
      .toDF("d", "v").write.partitionBy("d").parquet(zone)
    val asOf = java.sql.Date.valueOf("2024-06-10")
    val policy = Governance.StoragePolicy(archiveAfterDays = 30, deleteAfterDays = 365)

    val plan = Governance.lifecyclePlan(spark, zone, "d", policy, asOf)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(plan("2024-06-01") === ((9, "HOT")))
    assert(plan("2024-04-01") === ((70, "ARCHIVE")))
    assert(plan("2023-01-01") === ((526, "DELETE")))

    val audit = Governance.lifecycleApply(spark, zone, archive, "d", policy, asOf)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(audit === Map("2024-06-01" -> "KEPT",
      "2024-04-01" -> "MOVED", "2023-01-01" -> "DELETED"))
    // the hot partition is still readable in place; the archived one
    // is readable at the archive tier (a metadata move, not a rewrite)
    assert(new java.io.File(s"$zone/d=2024-06-01").isDirectory)
    assert(!new java.io.File(s"$zone/d=2024-04-01").exists())
    assert(!new java.io.File(s"$zone/d=2023-01-01").exists())
    assert(spark.read.parquet(s"$archive/d=2024-04-01").count() === 1)
    // idempotent: re-applying plans only the remaining hot partition
    val rerun = Governance.lifecycleApply(spark, zone, archive, "d", policy, asOf)
      .collect().map(r => (r.getString(0), r.getString(3)))
    assert(rerun.toSeq === Seq(("2024-06-01", "KEPT")))

    // a partition whose value can't parse as a date (stray dir, or
    // Spark's null-key __HIVE_DEFAULT_PARTITION__) is surfaced as
    // UNPARSEABLE and never touched — not silently classified HOT,
    // and no NPE in the apply collect
    new java.io.File(s"$zone/d=notadate").mkdirs()
    val plan2 = Governance.lifecyclePlan(spark, zone, "d", policy, asOf)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(plan2("notadate") === "UNPARSEABLE")
    val audit2 = Governance.lifecycleApply(spark, zone, archive, "d", policy, asOf)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(audit2("notadate") === "SKIPPED")
    assert(new java.io.File(s"$zone/d=notadate").isDirectory)
  }

  test("forgetKey is SURGICAL: only files holding the key are rewritten") {
    import graft.operators.Governance
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("forget").toString
    // 100 rows spread over multiple files; every user_id unique
    (0L until 100L).map(i => (i, i + 1000L))
      .toDF("id", "user_id")
      .repartition(10, $"id")
      .write.mode("overwrite").parquet(lake)
    val dir = new java.io.File(lake)
    def partFiles = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(partFiles.length > 3) // a genuinely multi-file lake

    // derive the EXPECTED affected set from metadata, then forget the
    // users whose rows live in exactly one known file
    def filesOf(keys: Seq[Long]): Set[String] =
      spark.read.parquet(lake).filter($"user_id".isin(keys: _*))
        .select(col("_metadata.file_path")).distinct()
        .collect().map(r => new java.io.File(new java.net.URI(r.getString(0))).getName)
        .toSet
    val someFile = partFiles.head.getName
    val victimIds = spark.read.parquet(lake)
      .withColumn("f", col("_metadata.file_path"))
      .filter($"f".endsWith(someFile))
      .select($"user_id").as[Long].collect().toSeq.sorted
    assert(victimIds.size >= 2)
    val partial = victimIds.tail // leave one row → rewrite, not delete
    val before = partFiles.map(f => f.getName -> f.lastModified()).toMap

    val audit = Governance.forgetKey(spark, lake, "user_id", partial)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // exactly the one file rewritten, every other file byte-untouched
    assert(audit.map(_._1).toSet === Set(someFile))
    assert(audit.head._4 === "REWRITTEN")
    assert(audit.head._2 === victimIds.size.toLong)
    assert(audit.head._3 === partial.size.toLong)
    val after = partFiles.map(f => f.getName -> f.lastModified()).toMap
    val untouched = before.keySet - someFile
    assert(untouched.forall(k => after(k) == before(k)),
      s"non-matching files were rewritten: ${untouched.filter(k => after(k) != before(k))}")

    // content: exactly those rows gone
    val back = spark.read.parquet(lake)
    assert(back.count() === 100L - partial.size)
    assert(back.filter($"user_id".isin(partial: _*)).count() === 0)

    // idempotent: nothing left to forget
    assert(Governance.forgetKey(spark, lake, "user_id", partial).count() === 0)

    // full-file match deletes the file instead of writing an empty one
    val a3 = Governance.forgetKey(spark, lake, "user_id", Seq(victimIds.head))
      .collect().map(r => r.getString(3)).toSeq
    assert(a3 === Seq("FILE_DELETED"))
    assert(filesOf(victimIds) === Set.empty)
    assert(spark.read.parquet(lake).count() === 100L - victimIds.size)
  }

  test("vacuum: expired swap debris and old versions go, young debris and current version stay") {
    import graft.operators.Governance
    import graft.sources.VersionedTable
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vac").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def touch(p: String, modMs: Long): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      fs.mkdirs(hp); fs.setTimes(hp, modMs, -1)
    }
    val now = 1700000000000L
    val hourMs = 3600 * 1000L
    // swap debris: one expired, one inside the retention window
    touch(s"$root/tables/dim.staging", now - 10 * hourMs)
    touch(s"$root/tables/fact.backup", now - 1 * hourMs)
    // versioned table with three versions; v1/v2 aged out, v3 current
    val base = s"$root/versioned"
    (1 to 3).foreach { i =>
      VersionedTable.write(Seq((i.toLong, s"op$i")).toDF("id", "name"),
        base, s"load$i", graft.functions.Functions.utcTimestamp(s"2024-01-0$i 00:00:00"))
    }
    Seq(1, 2).foreach(i =>
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$base/v=$i"),
        now - 20 * hourMs, -1))
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$base/v=3"),
      now - 20 * hourMs, -1) // current version is old too - must STAY
    val audit = Governance.vacuum(spark, root, retainMs = 4 * hourMs,
      nowMs = now, keepVersions = 1)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(3)))).toMap
    assert(audit("tables/dim.staging") === (("swap_debris", "DELETED")))
    assert(audit("tables/fact.backup") === (("swap_debris", "RETAINED")))
    assert(audit("versioned/v=1") === (("expired_version", "DELETED")))
    assert(audit("versioned/v=2") === (("expired_version", "DELETED")))
    assert(audit("versioned/v=3") === (("version", "RETAINED")))
    // physical state: debris gone, young debris intact, current readable
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tables/dim.staging")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/tables/fact.backup")))
    assert(VersionedTable.read(spark, base).as[(Long, String)].collect()
      .toSeq === Seq((3L, "op3")))
    // history follows the data: only the retained version's manifest
    assert(VersionedTable.history(spark, base).select("version")
      .collect().map(_.get(0).toString).toSeq === Seq("3"))
    // idempotent: a second vacuum finds nothing new to delete
    val again = Governance.vacuum(spark, root, retainMs = 4 * hourMs,
      nowMs = now, keepVersions = 1)
      .collect().map(_.getString(3)).toSet
    assert(again === Set("RETAINED"))
  }

  test("tableChecksum: multiset-safe and invariant to row order + partitioning") {
    import graft.operators.Governance
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = Governance.tableChecksum(df, Seq("v")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // the XOR fold's certain-collision class (ADVICE r10): equal row
    // counts, every row at even multiplicity except one shared value —
    // h(A)⊕h(A)=0 made {A,A,B} ≡ {B,C,C}; modular addition must not
    val s1 = sig(Seq("A", "A", "B").toDF("v"))
    val s2 = sig(Seq("B", "C", "C").toDF("v"))
    assert(s1._1 === 3L && s2._1 === 3L)
    assert(s1 !== s2, "duplicate-pair corruption must shift the signature")
    // duplicate multiplicity itself must register (not cancel)
    val once = sig(Seq("A", "B").toDF("v"))
    val thrice = sig(Seq("A", "A", "A", "B").toDF("v"))
    assert(once._2 !== thrice._2)
    // equal content ⇒ equal signature under ANY order/partitioning
    val perm = sig(Seq("B", "A", "A").toDF("v").repartition(7))
    assert(perm === s1)
    // the scheme VERSION travels in the output row: signatures are
    // stored durably and compared across builds, so a digest-chain or
    // combine-rule change must read as a scheme mismatch, not as
    // phantom corruption — this pin forces the bump to be deliberate
    val row = Governance.tableChecksum(Seq("A").toDF("v"), Seq("v")).collect()(0)
    assert(row.getAs[String]("sig_scheme") === "md5x15-madd60-v2")
  }
}
