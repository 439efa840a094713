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
  *  - `documents.text` is perturbed per copy (a per-copy-unique
  *    letter `translate` permutation, see [[permuted]]) so replicas
  *    are NOT duplicates of each other: without this every doc would
  *    gain copies−1 exact twins and dedup operators would measure a
  *    synthetic pair blow-up instead of N× more data. n_chars stays
  *    valid (translate is length-preserving).
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

  /** Length-preserving per-copy text perturbation: a per-copy-unique
    * permutation of ALL 26 lowercase letters (deterministic
    * Fisher–Yates driven by a splitmix64 stream seeded with the copy
    * index).
    *
    * Why a full-alphabet random permutation and not something
    * gentler — the r14 adjudication, in two steps:
    *
    *  1. The original scheme rotated the 7 most frequent letters,
    *     which has only 6 non-identity classes: at 100 copies every
    *     doc had ~16 EXACT cross-replica twins and the LSH pair
    *     output measured ×4551 at 100× (45× superlinear) — a corpus
    *     artifact masquerading as an operator cliff.
    *  2. A banded replacement (affine maps within two 7-letter
    *     frequency bands, 1764 classes) killed the exact twins but
    *     kept STRUCTURED near-collisions: the synthetic docs draw
    *     from a small vocabulary of common-letter words, and a
    *     within-band permutation often maps a vocab word onto
    *     another vocab word (anagram effect), so replicas still
    *     band-collided — 30× pair output stayed ×130 and the
    *     triangle-census wedge count hit ×1849.
    *
    * A uniform-random permutation of the full alphabet scatters word
    * images across all 26 letters, so the image of one replica's
    * vocabulary almost never intersects another's (expected fixed
    * points of T_j∘T_i⁻¹ ≈ 1 letter; a 4+-letter word surviving into
    * the vocabulary has probability ≈ 26^-4 per word pair). Within a
    * replica the map is a character bijection, so shingle-set
    * jaccard, token histograms, text length, and char entropy are
    * preserved EXACTLY — each replica carries the 1× corpus's
    * near-dup structure and nothing else. Cross-replica independence
    * is statistical, not algebraic — ScaledCorpusSpec pins mapping
    * uniqueness, non-identity, and displacement through 1000 copies.
    */
  private val Letters = "abcdefghijklmnopqrstuvwxyz"
  // splitmix64 finalizer: deterministic, platform-independent mixer
  private def mix64(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private[graft] def permuted(i: Int): (String, String) = {
    // Seed = the copy index run through the finalizer ONCE (ADVICE
    // r14): seeding the raw counter with GOLDEN*(i+1) made copy i+1's
    // draw stream copy i's shifted one step (24 of the 25 Fisher–Yates
    // draws shared, at offset positions) — independence held only
    // empirically. Finalized seeds start each copy's stream at a
    // pseudo-random state far from every other copy's, so the streams
    // are disjoint by construction.
    var state = mix64(0x9E3779B97F4A7C15L * (i + 1))
    def next(): Long = {
      state += 0x9E3779B97F4A7C15L
      mix64(state)
    }
    val arr = Letters.toCharArray
    for (k <- arr.length - 1 to 1 by -1) {
      val j = (math.floorMod(next(), k + 1)).toInt
      val t = arr(k); arr(k) = arr(j); arr(j) = t
    }
    val to = new String(arr)
    // identity is astronomically unlikely (1/26!) but would silently
    // produce exact replica twins — fall back to a rotation
    if (to == Letters) (Letters, Letters.tail + Letters.head)
    else (Letters, to)
  }

  /** Generation tag baked into the completion marker: bump whenever
    * the generator's OUTPUT changes (key scheme, perturbation, seed
    * derivation), so scaled dirs cached from an earlier generation
    * rebuild instead of being silently reused under a stale marker.
    * g2 = finalizer-seeded per-copy permutation streams (r15).
    */
  private val Generation = 2
  private def marker(outDir: String, copies: Int) =
    new org.apache.hadoop.fs.Path(outDir, s"_SCALED_OK_g${Generation}_x$copies")

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
        .filter(_.getName.startsWith("_SCALED_OK"))
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
          if (table == "documents" && i > 0) {
            val (from, to) = permuted(i)
            shifted.withColumn("text", translate(col("text"), from, to))
          } else shifted
        }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }
    fs.create(m, true).close()
  }
}
