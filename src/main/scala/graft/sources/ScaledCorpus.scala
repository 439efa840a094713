package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BENCH-ONLY derived scale-up of the driver's testdata.
  *
  * The driver ships sf0.001 / sf0.01 / sf0.1; the scale sweep needs a
  * larger corpus to expose superlinear operators that correctness
  * checks can't see. This builds an sfN-equivalent directory by
  * unioning `copies` key-shifted replicas of a source sf dir:
  *
  *  - Every key domain (order/part/supp/cust/event/user/doc/vec keys)
  *    is shifted by `copy · Stride`, and FOREIGN keys shift with their
  *    parent, so referential integrity and join selectivity are
  *    preserved exactly: each replica joins only within itself, the
  *    way 10× more real data would.
  *  - Dimension tables (region, nation) stay single-copy — they are
  *    conformed dimensions; real datasets grow facts, not geography.
  *  - `documents.text` is perturbed per copy (a vowel/consonant
  *    `translate` rotation) so replicas are NOT near-duplicates of
  *    each other: without this every doc would gain 9 exact twins and
  *    dedup operators would measure a synthetic 100× pair blow-up
  *    instead of 10× more data. n_chars stays valid (translate is
  *    length-preserving).
  *  - `events.ts` passes through unchanged in the source's own
  *    encoding (µs timestamp, or legacy nanos via
  *    `Tables.readParquetAutoNanos`), and user_id shifts per
  *    copy: the user POPULATION grows 10×, per-user event counts stay
  *    constant — how traffic actually scales out.
  *
  * This data is for THROUGHPUT measurement only; correctness always
  * runs against the driver's own parquet (TESTDATA.md).
  */
object ScaledCorpus {

  /** Key shift per replica — far above any key in the driver's data,
    * far below anything that overflows downstream arithmetic.
    */
  val Stride = 100000000L

  /** Key columns to shift per table (parents and their foreign keys
    * shift together; Nil = conformed dimension, single copy).
    */
  val keyCols: Map[String, Seq[String]] = Map(
    "region"     -> Nil,
    "nation"     -> Nil,
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Length-preserving per-copy text perturbation: rotate the 7 most
    * frequent English letters among themselves. Rotation 1..6 (never
    * identity), so every replica's shingle/minhash/simhash profile
    * diverges from every other's while token structure, length, and
    * language statistics stay realistic.
    */
  private val Freq = "etaoins"
  private def rotated(i: Int): String = {
    val r = (i - 1) % (Freq.length - 1) + 1
    Freq.drop(r) + Freq.take(r)
  }

  private def marker(outDir: String, copies: Int) =
    new org.apache.hadoop.fs.Path(outDir, s"_SCALED_OK_x$copies")

  /** Build (idempotent: a marker file records a completed build at
    * this copy count; re-invocations return immediately).
    */
  def build(spark: SparkSession, baseDir: String, outDir: String,
            copies: Int): Unit = {
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val m = marker(outDir, copies)
    val fs = m.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(m)) return
    // a rebuild at a DIFFERENT copy count must invalidate the old
    // marker, or a later request for that count would silently accept
    // this build's data (markers otherwise accumulate)
    val dir = new org.apache.hadoop.fs.Path(outDir)
    if (fs.exists(dir))
      fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("_SCALED_OK_x"))
        .foreach(p => fs.delete(p, false))
    // event ts round-trips verbatim in whatever encoding the source
    // carries: Tables.readParquetAutoNanos only escalates the legacy
    // nanos conf when a footer actually needs it, and Tables.events
    // dispatches on the decoded schema either way.
    keyCols.foreach { case (table, keys) =>
      val df = Tables.readParquetAutoNanos(spark, s"$baseDir/$table.parquet")
      val out: DataFrame =
        if (keys.isEmpty) df
        else (0 until copies).map { i =>
          val shifted = keys.foldLeft(df) { (d, k) =>
            d.withColumn(k, col(k) + lit(Stride * i))
          }
          if (table == "documents" && i > 0)
            shifted.withColumn("text", translate(col("text"), Freq, rotated(i)))
          else shifted
        }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }
    fs.create(m, true).close()
  }
}
