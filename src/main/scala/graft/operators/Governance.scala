package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Zone-level access control + column-level data dictionary — the two
  * governance artifacts of the reference the engine didn't yet model:
  * `rbac_matrix.csv:1-4` (role × zone read/write grants) and
  * `data_dictionary.csv:1-7` (per-column stewardship, sensitivity,
  * quality rule).
  *
  * Spark has no built-in row/column security in the open-source
  * engine, so the idiomatic rendition is VIEW COMPILATION: a role's
  * effective permissions compile into what its DataFrames can contain
  * — a denied zone read throws before any job is submitted (driver-
  * side, zero data touched), and PII columns are REDACTED in the
  * projection (sha2) for roles without governance access, so the
  * physical plan a restricted role executes cannot leak the values.
  * All control-plane: grants are a handful of rows, never data.
  */
object Governance {

  // ───────────────────────────── RBAC ─────────────────────────────

  /** Zone grant lattice (rbac_matrix.csv cell vocabulary). */
  sealed abstract class Grant(val name: String, val canRead: Boolean,
                              val canWrite: Boolean)
  case object NoAccess  extends Grant("no_access", false, false)
  case object ReadOnly  extends Grant("read", true, false)
  case object ReadWrite extends Grant("read_write", true, true)

  def parseGrant(s: String): Grant = s.trim.toLowerCase match {
    case "no_access" | "none" => NoAccess
    case "read"               => ReadOnly
    case "read_write" | "rw"  => ReadWrite
    case other => throw new IllegalArgumentException(s"unknown grant: $other")
  }

  /** One role's grants across zones (a parsed rbac_matrix.csv row).
    * `rawPii` is an EXPLICIT capability, deliberately separate from
    * governance-zone readability: "may read governance metadata" and
    * "may see raw PII values" are different privileges (the etl role
    * reads governance configs but must never receive unredacted PII),
    * and conflating them silently widened PII exposure.
    */
  final case class Role(name: String, grants: Map[String, Grant],
                        description: String = "", rawPii: Boolean = false)

  /** The reference's own matrix (`rbac_matrix.csv:1-4`), as shipped:
    * ETL reads/writes every data zone, analysts read only trusted
    * zones, stewards read data and own the governance zone. Only the
    * steward role — the PII owner managing golden records — carries
    * the raw-PII capability.
    */
  val ReferenceRoles: Seq[Role] = Seq(
    Role("etl",
      Map("raw" -> ReadWrite, "validated" -> ReadWrite,
          "curated" -> ReadWrite, "governance" -> ReadOnly),
      "ETL jobs ingest, validate, and curate data"),
    Role("analyst",
      Map("raw" -> NoAccess, "validated" -> ReadOnly,
          "curated" -> ReadOnly, "governance" -> NoAccess),
      "Analysts consume trusted curated data only"),
    Role("steward",
      Map("raw" -> ReadOnly, "validated" -> ReadOnly,
          "curated" -> ReadOnly, "governance" -> ReadWrite),
      "Data stewards manage quality rules, golden records, approvals",
      rawPii = true))

  /** Parse a wide rbac_matrix.csv (`role_name,<zone>_zone...,description`)
    * into roles — the melt of the reference's matrix shape.
    */
  def rolesFromCsv(spark: SparkSession, path: String): Seq[Role] = {
    val df = graft.sources.Tables.csv(spark, path)
    val zoneCols = df.columns.filter(_.endsWith("_zone"))
    val hasPiiCol = df.columns.contains("raw_pii")
    df.collect().toSeq.map { r =>
      Role(
        r.getAs[String]("role_name"),
        zoneCols.map(z =>
          z.stripSuffix("_zone") -> parseGrant(r.getAs[String](z))).toMap,
        Option(r.getAs[String]("description")).getOrElse(""),
        rawPii = hasPiiCol &&
          Option(r.getAs[String]("raw_pii")).exists(_.trim.toLowerCase == "true"))
    }
  }

  /** Effective-permissions matrix: one row per (role, zone) with the
    * grant and its derived read/write bits — the query surface a
    * governance dashboard reads.
    */
  def permissionMatrix(spark: SparkSession, roles: Seq[Role]): DataFrame = {
    import spark.implicits._
    roles.flatMap { role =>
      role.grants.toSeq.sortBy(_._1).map { case (zone, g) =>
        (role.name, zone, g.name, g.canRead, g.canWrite)
      }
    }.toDF("role_name", "zone", "permission", "can_read", "can_write")
  }

  final class AccessDeniedException(role: String, zone: String, op: String)
    extends RuntimeException(s"role '$role' may not $op zone '$zone'")

  private def grantOf(roles: Seq[Role], role: String, zone: String): Grant =
    roles.find(_.name == role)
      .getOrElse(throw new IllegalArgumentException(s"unknown role: $role"))
      .grants.getOrElse(zone, NoAccess) // unknown zone = deny by default

  /** Gate a zone read. Throws BEFORE any Spark job runs — access
    * control is a plan-construction concern, not a runtime filter.
    */
  def checkRead(roles: Seq[Role], role: String, zone: String): Unit =
    if (!grantOf(roles, role, zone).canRead)
      throw new AccessDeniedException(role, zone, "read")

  def checkWrite(roles: Seq[Role], role: String, zone: String): Unit =
    if (!grantOf(roles, role, zone).canWrite)
      throw new AccessDeniedException(role, zone, "write")

  /** Role-scoped zone read: deny throws; allowed roles WITHOUT the
    * explicit raw-PII capability get PII columns redacted in the
    * projection (sha2 — referentially stable: joins/groupBys on the
    * redacted column still work, values don't leak). The redaction is
    * part of the compiled view, so no plan the role can build from
    * the returned frame recovers the raw values.
    *
    * `piiCols` defaulting to empty is a quiet-failure shape for an
    * access-control API (a caller omitting it hands raw PII to any
    * role) — production reads should go through [[readZoneGoverned]],
    * which sources the set from the data dictionary; the explicit
    * parameter exists for bootstrap and tests.
    */
  def readZone(spark: SparkSession, roles: Seq[Role], role: String,
               zone: String, path: String,
               piiCols: Set[String] = Set.empty): DataFrame = {
    checkRead(roles, role, zone)
    val df = spark.read.parquet(path)
    val privileged = roles.find(_.name == role).exists(_.rawPii)
    if (privileged || piiCols.isEmpty) df
    else df.columns.foldLeft(df) { (acc, c) =>
      if (piiCols.contains(c))
        acc.withColumn(c, sha2(col(c).cast("string"), 256))
      else acc
    }
  }

  /** The table's PII column set from a [[dataDictionary]] frame —
    * control-plane collect (|columns| rows). */
  def piiColsFromDictionary(dictionary: DataFrame, table: String): Set[String] =
    dictionary
      .filter(col("table_name") === table && col("is_pii"))
      .select("column_name").collect().map(_.getString(0)).toSet

  /** [[readZone]] with the PII set sourced from the data dictionary —
    * the two governance artifacts COMPOSE: flipping a column's
    * `is_pii` flag in the dictionary changes every governed read's
    * projection, with no per-call-site PII lists to drift.
    */
  def readZoneGoverned(spark: SparkSession, roles: Seq[Role], role: String,
                       zone: String, path: String,
                       dictionary: DataFrame, table: String): DataFrame =
    readZone(spark, roles, role, zone, path,
      piiColsFromDictionary(dictionary, table))

  /** Role-scoped zone write (deny throws; no data touched). */
  def writeZone(df: DataFrame, roles: Seq[Role], role: String,
                zone: String, path: String): Unit = {
    checkWrite(roles, role, zone)
    df.write.mode("overwrite").parquet(path)
  }

  // ─────────────────────── storage lifecycle ──────────────────────

  /** Age thresholds (days) for partition tiering: older than
    * `archiveAfterDays` → ARCHIVE tier, older than `deleteAfterDays`
    * → expired. The offline rendition of the reference's S3 bucket
    * lifecycle rule (`newpy.py:89-98` — raw/ objects transition to
    * GLACIER after 30 days): in a filesystem lake the unit of tiering
    * is the PARTITION DIRECTORY, the "storage class" is a cheaper
    * root, and the transition is a metadata rename — no data rewrite,
    * which is what makes this runnable nightly over a 100 TB zone.
    */
  final case class StoragePolicy(archiveAfterDays: Int,
                                 deleteAfterDays: Int = Int.MaxValue) {
    require(archiveAfterDays >= 0 && deleteAfterDays >= archiveAfterDays,
      s"need 0 <= archiveAfterDays <= deleteAfterDays, got ($archiveAfterDays, $deleteAfterDays)")
  }

  /** Dry-run lifecycle plan for a `partitionCol=value`-laid-out zone:
    * one row per partition with its age at `asOf` and the action the
    * policy assigns (HOT | ARCHIVE | DELETE). Listing is driver-side
    * (partition counts are control-plane by definition — a date
    * column has one directory per day); classification runs through
    * Spark column functions so an engine re-deriving the plan from
    * the partition values (the DuckDB oracle does) agrees exactly.
    * `partDate` maps the partition's string value to a date — pass
    * e.g. `v => to_date(concat(v, lit("-01")))` for month partitions.
    * The default uses `try_to_date` (ANSI `to_date` THROWS on a
    * malformed value): an unparseable partition yields a null age and
    * surfaces as action UNPARSEABLE instead of killing the sweep.
    */
  def lifecyclePlan(spark: SparkSession, path: String, partitionCol: String,
                    policy: StoragePolicy, asOf: java.sql.Date,
                    partDate: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                      c => try_to_date(c)): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val prefix = s"$partitionCol="
    val parts =
      if (!fs.exists(p)) Seq.empty[String]
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(_.getPath.getName.stripPrefix(prefix)).sorted
    parts.toDF("partition")
      .withColumn("age_days",
        datediff(lit(asOf), partDate(col("partition"))).cast("int"))
      // a value partDate can't parse (a stray dir, or Spark's
      // __HIVE_DEFAULT_PARTITION__ for null keys) yields a null age;
      // it must surface as its own action — the otherwise-branch would
      // silently call it HOT and the apply collect would NPE on the
      // null primitive
      .withColumn("action",
        when(col("age_days").isNull, "UNPARSEABLE")
          .when(col("age_days") >= policy.deleteAfterDays, "DELETE")
          .when(col("age_days") >= policy.archiveAfterDays, "ARCHIVE")
          .otherwise("HOT"))
  }

  /** Execute a [[lifecyclePlan]]: ARCHIVE partitions are RENAMED under
    * `archivePath` (metadata move — same filesystem, no rewrite),
    * DELETE partitions are removed, HOT untouched. Returns the audit
    * frame (partition, age_days, action, status) — the T2
    * union-append artifact a governance log keeps. Idempotent: moved
    * partitions no longer list under `path`, so a re-run plans them
    * HOT-nothing. The plan collect is bounded control-plane
    * (|partitions| rows).
    */
  def lifecycleApply(spark: SparkSession, path: String, archivePath: String,
                     partitionCol: String, policy: StoragePolicy,
                     asOf: java.sql.Date,
                     partDate: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                       c => try_to_date(c)): DataFrame = {
    import spark.implicits._
    val plan = lifecyclePlan(spark, path, partitionCol, policy, asOf, partDate)
      .collect().toSeq
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getString(2)))
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val arch = new org.apache.hadoop.fs.Path(archivePath)
    val audit = plan.map { case (part, age, action) =>
      val src = new org.apache.hadoop.fs.Path(root, s"$partitionCol=$part")
      val status = action match {
        case "ARCHIVE" =>
          if (!fs.exists(arch)) fs.mkdirs(arch)
          val dst = new org.apache.hadoop.fs.Path(arch, s"$partitionCol=$part")
          if (fs.rename(src, dst)) "MOVED" else "RENAME_FAILED"
        case "DELETE" =>
          if (fs.delete(src, true)) "DELETED" else "DELETE_FAILED"
        case "UNPARSEABLE" => "SKIPPED" // never touch what we can't age
        case _ => "KEPT"
      }
      (part, age, action, status)
    }
    audit.toDF("partition", "age_days", "action", "status")
  }

  /** GDPR right-to-be-forgotten: surgically delete every row whose
    * `keyCol` is in `keys` from a parquet lake, rewriting ONLY the
    * files that contain a match — O(affected files), never O(lake).
    *
    * 1. ONE metadata-augmented scan finds affected files
    *    (`_metadata.file_path` grouped under the key predicate);
    *    parquet row-group pruning means unaffected files cost little
    *    more than footer reads.
    * 2. Each affected file is rewritten individually without the key
    *    rows: the replacement is written COMPLETELY to a dot-prefixed
    *    staging path (invisible to readers) before the two-metadata-op
    *    swap, so no reader ever sees a torn file; a crash inside the
    *    swap window leaves the durable `.forget_*` staging file as
    *    the recovery artifact. A file whose every row matches is
    *    DELETED outright.
    * 3. Returns the audit frame (file, rows_before, rows_removed,
    *    status) a compliance log keeps.
    *
    * The affected-file collect is bounded by the number of files
    * holding the key — the true control-plane bound of any surgical
    * delete (a subject's rows live in a handful of files; the other
    * 100 TB are never read row-wise, never written). Idempotent:
    * re-running with the same keys finds zero affected files.
    */
  def forgetKey(spark: SparkSession, path: String, keyCol: String,
                keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    require(keys.nonEmpty, "keys must be non-empty")
    val lake = spark.read.parquet(path)
    val affected = lake
      .filter(col(keyCol).isin(keys: _*))
      .select(col("_metadata.file_path").as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val conf = spark.sessionState.newHadoopConf()
    val audit = affected.map { case (uri, nMatch) =>
      val target = new org.apache.hadoop.fs.Path(new java.net.URI(uri))
      val fs = target.getFileSystem(conf)
      val one = spark.read.parquet(target.toString)
      val before = one.count()
      val status =
        if (before == nMatch) { // nothing survives: drop the file
          if (fs.delete(target, false)) "FILE_DELETED" else "DELETE_FAILED"
        } else {
          val tmp = new org.apache.hadoop.fs.Path(
            target.getParent, s".forget_${target.getName}")
          one.filter(!col(keyCol).isin(keys: _*))
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = fs.globStatus(
            new org.apache.hadoop.fs.Path(tmp, "part-*.parquet")).head.getPath
          fs.delete(target, false)
          val ok = fs.rename(part, target)
          fs.delete(tmp, true)
          if (ok) "REWRITTEN" else "RENAME_FAILED"
        }
      (target.getName, before, nMatch, status)
    }
    audit.toDF("file", "rows_before", "rows_removed", "status")
  }

  /** Lake VACUUM — the Delta `VACUUM table RETAIN n HOURS` analog for
    * this lake's two physical conventions, deleting exactly the two
    * classes of storage a crash or retention policy strands:
    *
    *  - **swap debris**: `*.staging` / `*.backup` directories left by
    *    a [[Scd2.writeAtomic]] interrupted between its rename steps.
    *    Younger than `retainMs` they are RETAINED (a concurrent
    *    writer may be mid-swap — the same live-writer race Delta's
    *    retention window exists for); older, deleted.
    *  - **expired versions**: [[graft.sources.VersionedTable]] `v=N`
    *    directories beyond the newest `keepVersions`, older than
    *    `retainMs` — time travel past the retention horizon is
    *    traded for storage, exactly Delta's trade. The matching
    *    `_history/v=N` manifest rides along, so history never points
    *    at missing data; retained versions keep their manifests.
    *
    * Everything else is untouched — live data files are referenced by
    * definition in this layout (a directory IS its table), so unlike
    * Delta there is no unreferenced-file scan to get wrong. `nowMs`
    * is injected (never wall-clock) so runs are deterministic and
    * testable; ages come from filesystem modification times. Returns
    * the audit frame `(path, kind, age_ms, action)`, one row per
    * inspected candidate — every deletion is accounted for, every
    * retention visible.
    *
    * Scale: a pure control-plane directory walk (O(entries) driver
    * metadata, no data reads) — the same budget as a lake listing.
    */
  def vacuum(spark: SparkSession, root: String, retainMs: Long,
             nowMs: Long, keepVersions: Int = 1): DataFrame = {
    import spark.implicits._
    require(retainMs >= 0, s"retainMs must be >= 0, got $retainMs")
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    val audit =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, String)]
    val rootStr = rootP.toUri.getPath
    def rel(p: org.apache.hadoop.fs.Path): String =
      p.toUri.getPath.stripPrefix(rootStr).stripPrefix("/")
    def walk(dir: org.apache.hadoop.fs.Path): Unit = {
      val children = fs.listStatus(dir).toSeq
      val names = children.map(_.getPath.getName).toSet
      val versioned =
        names.contains("_history") && names.exists(_.startsWith("v="))
      children.filter(_.isDirectory).foreach { st =>
        val name = st.getPath.getName
        val age = nowMs - st.getModificationTime
        if (name.endsWith(".staging") || name.endsWith(".backup")) {
          if (age > retainMs) {
            val ok = fs.delete(st.getPath, true)
            audit += ((rel(st.getPath), "swap_debris", age,
              if (ok) "DELETED" else "DELETE_FAILED"))
          } else audit += ((rel(st.getPath), "swap_debris", age, "RETAINED"))
        } else if (versioned && name.startsWith("v=")) {
          () // judged below against the version order, not per-entry
        } else if (name != "_history") walk(st.getPath)
      }
      if (versioned) {
        val vs = children
          .filter(c => c.isDirectory && c.getPath.getName.startsWith("v="))
          .sortBy(_.getPath.getName.stripPrefix("v=").toInt)
        val cut = vs.length - keepVersions
        vs.zipWithIndex.foreach { case (st, i) =>
          val age = nowMs - st.getModificationTime
          if (i < cut && age > retainMs) {
            val ok = fs.delete(st.getPath, true)
            val manifest = new org.apache.hadoop.fs.Path(
              new org.apache.hadoop.fs.Path(dir, "_history"),
              st.getPath.getName)
            if (fs.exists(manifest)) fs.delete(manifest, true)
            audit += ((rel(st.getPath), "expired_version", age,
              if (ok) "DELETED" else "DELETE_FAILED"))
          } else audit += ((rel(st.getPath), "version", age, "RETAINED"))
        }
      }
    }
    if (fs.exists(rootP)) walk(rootP)
    audit.sortBy(r => (r._1, r._2)).toSeq
      .toDF("path", "kind", "age_ms", "action")
  }

  // ──────────────────────── data dictionary ───────────────────────

  /** Columns a row-level rule constrains (for rule → column listing). */
  private def ruleColumns(r: Validation.Rule): Seq[String] = r match {
    case Validation.NotNull(c, _)              => Seq(c)
    case Validation.Between(c, _, _, _)        => Seq(c)
    case Validation.AllowedValues(c, _, _)     => Seq(c)
    case Validation.GreaterThan(c, _, _, _)    => Seq(c)
    case Validation.ColumnGte(l, rr, _)        => Seq(l, rr)
  }

  /** Column-level data dictionary generated FROM the schema and the
    * rule suite (`data_dictionary.csv:1-7` re-expressed as a derived
    * artifact instead of a hand-maintained file — it can never drift
    * from the table it describes). One row per column: type/nullable
    * from the StructType, quality rules joined from the suite,
    * sensitivity derived from the PII set.
    */
  def dataDictionary(spark: SparkSession, table: String, schema: StructType,
                     rules: Seq[Validation.Rule],
                     piiCols: Set[String] = Set.empty,
                     owner: String = "Data Engineering",
                     retention: String = "7 years"): DataFrame = {
    import spark.implicits._
    val byCol: Map[String, Seq[String]] = rules
      .flatMap(r => ruleColumns(r).map(_ -> r.name))
      .groupBy(_._1).map { case (c, rs) => c -> rs.map(_._2).distinct.sorted }
    schema.fields.toSeq.map { f =>
      (table, f.name, f.dataType.catalogString, f.nullable,
        byCol.getOrElse(f.name, Nil).mkString(","),
        piiCols.contains(f.name),
        if (piiCols.contains(f.name)) "Confidential" else "Internal",
        owner, retention)
    }.toDF("table_name", "column_name", "data_type", "nullable",
      "quality_rules", "is_pii", "sensitivity", "data_steward",
      "retention_policy")
  }

  /** Order-independent table content checksum — one row: (n_rows,
    * sig1, sig2). Rows digest to 60-bit integers (md5 → 15 hex
    * chars) and combine by MODULAR ADDITION (sum mod 2⁶⁰ over a
    * DECIMAL accumulator) — commutative and associative, so the
    * signature is invariant to partitioning, file layout, and row
    * order, and, unlike XOR, MULTISET-SAFE: a row with even
    * multiplicity adds 2·h instead of cancelling to zero, so
    * duplicate-pair corruption (the {A,A,B} vs {B,C,C} class, which
    * an XOR fold passes with certainty) shifts the signature. For
    * random corruption the two independently-salted channels
    * collide with probability ~2⁻¹²⁰. The per-column digests are
    * fixed-width with disjoint NULL/value domains (the
    * [[Incremental.snapshotDiff]] recipe — separator schemes let
    * values shift field boundaries).
    *
    * Scale shape: pure scan-side projection + ONE all-combinable
    * aggregate — no shuffle carries anything but 3 longs per mapper.
    * This is the cross-replica integrity check (same-content audit
    * after migration/backfill/replication) done in one pass per side.
    *
    * Caller contract: `cols` must cast to string identically in any
    * comparing engine — strings/integers/dates are safe; raw doubles
    * are not (format drift), cast them to decimals first.
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    // The combine rule changed once (r11: XOR → modular addition), so
    // identical content can carry different signatures across builds.
    // Signatures are meant to be stored durably and compared across
    // replicas/engines — the scheme VERSION therefore travels in the
    // output row: a cross-build compare sees a scheme mismatch, not
    // phantom corruption. Bump the tag whenever the digest chain or
    // combine rule changes.
    val scheme = "md5x15-madd60-v2"
    def colDigest(c: String) = md5(
      when(col(c).isNull, lit("n"))
        .otherwise(concat(lit("v"), col(c).cast("string"))))
    val rowStr = concat(cols.map(colDigest): _*)
    // DECIMAL(28,0) per-row digests sum into Spark's DECIMAL(38,0)
    // accumulator: exact through ~8.6·10¹⁹ rows (no silent BIGINT
    // wrap), and DuckDB's HUGEINT sum reproduces it bit-for-bit
    def sig(salt: String) =
      conv(substring(md5(concat(lit(salt), rowStr)), 1, 15), 16, 10)
        .cast("decimal(28,0)")
    val mod = lit(1152921504606846976L) // 2^60
    df.select(sig("1").as("_s1"), sig("2").as("_s2"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("_s1")) % mod).cast("long").as("sig1"),
        (sum(col("_s2")) % mod).cast("long").as("sig2"))
      .withColumn("sig_scheme", lit(scheme))
  }
}
