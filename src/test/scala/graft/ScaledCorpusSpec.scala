package graft

import graft.sources.ScaledCorpus
import org.apache.spark.sql.functions._

class ScaledCorpusSpec extends SparkSpec {

  test("scaled corpus: exact k× counts, FK integrity, unique keys, diverged replicas") {
    val out = java.nio.file.Files.createTempDirectory("scaled").toString
    ScaledCorpus.build(spark, sfDir, out, copies = 3)

    // every fact table is exactly 3×; conformed dims stay single-copy
    ScaledCorpus.keyCols.foreach { case (table, keys) =>
      val n0 = graft.sources.Tables.readParquetAutoNanos(
        spark, s"$sfDir/$table.parquet").count()
      val n = graft.sources.Tables.readParquetAutoNanos(
        spark, s"$out/$table.parquet").count()
      assert(n === (if (keys.isEmpty) n0 else 3 * n0), table)
    }

    // referential integrity survives the key shift: no orphan lineitems,
    // no orphan orders — each replica joins only within itself
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .count() === 0)
    assert(ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")
      .count() === 0)

    // shifted keys stay unique
    assert(cust.select("c_custkey").distinct().count() === cust.count())

    // replica documents are NOT near-duplicates: same length (translate
    // is length-preserving, n_chars stays valid), different content
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val texts = docs
      .filter(col("doc_id") % ScaledCorpus.Stride === 7)
      .orderBy("doc_id").select("text").collect().map(_.getString(0))
    assert(texts.length === 3)
    assert(texts.distinct.length === 3, "replica text must diverge per copy")
    assert(texts.map(_.length).distinct.length === 1, "perturbation must preserve length")

    // idempotent: the marker short-circuits a rebuild (files untouched)
    val f = new java.io.File(s"$out/lineitem.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val mtime = f.lastModified()
    ScaledCorpus.build(spark, sfDir, out, copies = 3)
    assert(f.lastModified() === mtime, "rebuild must be a no-op under the marker")

    // the per-copy letter mapping is UNIQUE through ≥1000 copies,
    // never the identity, and displaces nearly every letter — both
    // against the 1× text AND between any two copies (spot-checked):
    // the r13-era rotation cycled with period 6 (≈16 exact
    // cross-replica twins per doc at 100 copies, LSH pair output
    // ×4551 = 45× superlinear), and a banded-affine replacement kept
    // structured anagram collisions on the small synthetic vocabulary
    // (30× pair output ×130, wedge count ×1849) — both corpus
    // artifacts that read as operator cliffs.
    val maps = (1 to 1000).map(ScaledCorpus.permuted)
    assert(maps.distinct.size === 1000, "per-copy mapping must be unique")
    maps.zip(1 to 1000).foreach { case ((from, to), i) =>
      assert(from.length === to.length, s"copy $i: length-preserving")
      assert(to.toSet === from.toSet, s"copy $i: permutation of the same letters")
      val fixed = from.zip(to).count { case (a, b) => a == b }
      assert(fixed <= 8, s"copy $i: mapping must displace most letters " +
        s"($fixed fixed points)")
    }
    // pairwise displacement on a sample: T_j∘T_i⁻¹ near-identity would
    // make two replicas near-duplicates of each other
    for (i <- 1 to 50; j <- i + 1 to 50) {
      // letters on which the two copies' maps AGREE survive as shared
      // shingle content between the replicas
      val shared = maps(i - 1)._2.zip(maps(j - 1)._2)
        .count { case (a, b) => a == b }
      assert(shared <= 10,
        s"copies $i,$j: mappings too similar ($shared agreeing letters)")
    }

    // a rebuild at a DIFFERENT copy count invalidates the old marker:
    // requesting 3 copies again afterwards must really rebuild, not
    // accept the 2-copy data under the stale x3 marker
    ScaledCorpus.build(spark, sfDir, out, copies = 2)
    assert(spark.read.parquet(s"$out/customer.parquet").count() ===
      2 * spark.read.parquet(s"$sfDir/customer.parquet").count())
    ScaledCorpus.build(spark, sfDir, out, copies = 3)
    assert(spark.read.parquet(s"$out/customer.parquet").count() ===
      3 * spark.read.parquet(s"$sfDir/customer.parquet").count(),
      "stale marker must not mask a different-count rebuild")
  }
}
