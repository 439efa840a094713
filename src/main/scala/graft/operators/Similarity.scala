package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (exact, O(nq·n)). Scale path:
  * random-hyperplane LSH bucketing — candidates only within matching
  * buckets, turning the cross join into an equi-join. All arithmetic
  * is promoted to double BEFORE multiplication so results are
  * engine-reproducible (float×float differs from double×double in the
  * last ulp).
  */
object Similarity {

  /** dot(a, b) with per-element double promotion, left-to-right sum. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact brute-force top-k: for each query vector, the k nearest
    * candidates by cosine. Queries are broadcast (the small side);
    * cosine is rounded to 6 dp before ranking so rank order is
    * deterministic cross-engine, with id tiebreak.
    */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are O(n + q), computed below the join — only the dot
    // product is per-pair work
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", l2Norm(col("q_vec"))))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", l2Norm(col("c_vec")))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim",
        round(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos_sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim d): ±1 from one md5-derived hex digit. Reproducible in any
    * engine with md5.
    */
  private def planeSign(j: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j|$d".getBytes("UTF-8"))
    if ((hex(0) & 1) == 0) 1.0 else -1.0
  }

  /** LSH bucket id: sign bits of dots with `numPlanes` ±1 hyperplanes.
    * Vectors in the same bucket are ANN candidates.
    */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { j =>
      val planeLit = array((0 until dim).map(d => lit(planeSign(j, d))): _*)
      when(dot(vec, planeLit) >= 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: exact cosine ranking, but only within the query's
    * LSH bucket — the scale path (equi-join on bucket id instead of a
    * cross join). Recall < 100% by construction; increase planes ↔
    * recall tradeoff.
    */
  def lshTopK(candidates: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, dim: Int, k: Int,
              numPlanes: Int = 8): DataFrame = {
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
      .withColumn("bucket", lshBucket(col("c_vec"), dim, numPlanes))
      .withColumn("c_norm", l2Norm(col("c_vec")))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("bucket", lshBucket(col("q_vec"), dim, numPlanes))
      .withColumn("q_norm", l2Norm(col("q_vec"))))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim",
        round(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos_sim", "rank")
  }

  /** Deterministic spherical k-means (Lloyd) for IVF centroids:
    * init = first-k vectors by id (deterministic, no RNG), a FIXED
    * number of iterations, cosine-argmax assignment (matching how IVF
    * probes cells). Per iteration: one broadcast of k centroids, one
    * argmax pass, one two-level mean agg (groupBy (cell, dim) then
    * reassembly) — O(iters) scans, no quadratic work. The k×dim
    * centroid matrix is collected to the driver each round: that is
    * index-build control plane (a few KB), not data.
    *
    * Deterministic CROSS-ENGINE, not just cross-run: assignment
    * scores are rounded to 6 dp (centroid-id tiebreak) and cell means
    * go through an exact decimal sum (FP addition is not associative
    * — a parallel double mean is partitioning-dependent), so an
    * engine re-running the same recipe sequentially (the DuckDB
    * oracle does, unrolled) reproduces every centroid bit-for-bit.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: every Lloyd iteration runs two jobs (argmax assign +
    // means) over this frame — uncached, an iters=5 build would
    // re-execute the source scan + cast lineage ~10×
    val vecs = df.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Seq[(Int, Seq[Double])] =
      vecs.orderBy(col("vid")).limit(k).collect().toSeq
        .zipWithIndex.map { case (r, i) => i -> r.getSeq[Double](1) }
    try for (_ <- 1 to iters) {
      val cDf = broadcast(centroids.toDF("centroid_id", "centroid_vec")
        .withColumn("centroid_norm", l2Norm(col("centroid_vec"))))
      val scored = vecs
        .withColumn("_norm", l2Norm(col("v")))
        .crossJoin(cDf)
        .withColumn("_cos",
          round(dot(col("v"), col("centroid_vec")) /
            (col("_norm") * col("centroid_norm")), 6))
      val w = Window.partitionBy(col("vid"))
        .orderBy(col("_cos").desc, col("centroid_id").asc)
      val cells = scored.withColumn("_r", row_number().over(w))
        .filter(col("_r") === 1)
        .select(col("centroid_id"), col("v"))
      val means = cells
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg((sum(col("x").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      // empty cells keep their previous centroid
      centroids = centroids.map { case (cid, old) => cid -> byCell.getOrElse(cid, old) }
    } finally vecs.unpersist(blocking = false)
    centroids.toDF("centroid_id", "centroid_vec")
  }

  /** IVF (inverted-file) ANN: candidates are assigned to their
    * nearest centroid once (the "index build" — one pass), queries
    * probe only their own cell. Default centroids are the
    * deterministic first-k vectors (oracle-expressible); pass
    * `centroids = Some(kmeansCentroids(...))` for data-adaptive cells
    * — the plan shape (broadcast centroids, argmax assignment,
    * equi-join on cell) is identical either way. Versus LSH: cells
    * adapt to the data distribution, and probing more cells
    * (`nprobe`) trades recall for cost without rebuilding.
    */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numCentroids: Int = 8,
              nprobe: Int = 1,
              centroidsOverride: Option[DataFrame] = None): DataFrame = {
    val centroids = broadcast(
      centroidsOverride.getOrElse(
        candidates.orderBy(col(idCol)).limit(numCentroids)
          .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec")))
        .withColumn("centroid_norm", l2Norm(col("centroid_vec"))))

    def assign(df: DataFrame, id: String, vec: String, topN: Int): DataFrame = {
      val scored = df
        .withColumn("_norm", l2Norm(col(vec)))
        .crossJoin(centroids)
        .withColumn("_c_cos",
          round(dot(col(vec), col("centroid_vec")) /
            (col("_norm") * col("centroid_norm")), 6))
      val w = Window.partitionBy(col(id))
        .orderBy(col("_c_cos").desc, col("centroid_id").asc)
      scored.withColumn("_crank", row_number().over(w))
        .filter(col("_crank") <= topN)
        .drop("centroid_vec", "centroid_norm", "_c_cos", "_crank")
    }

    val cells = assign(
      candidates.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec")),
      "cand_id", "c_vec", topN = 1)
      .withColumnRenamed("_norm", "c_norm")
    val probes = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec", topN = nprobe)
      .withColumnRenamed("_norm", "q_norm")

    val scored = cells.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim",
        round(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos_sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, blocked
    * by LSH bucket (exact within bucket).
    */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double,
                        numPlanes: Int = 8): DataFrame = {
    // shuffle-hash on the bucket key, repartitioned by explicit num —
    // same pair-explosion rationale as Mdm.candidatePairs (AQE only
    // sees the small input; output is quadratic per bucket)
    val n = graft.functions.Functions.numShufflePartitions(df.sparkSession)
    val v = df.select(col(idCol), col(vecCol))
      .withColumn("bucket", lshBucket(col(vecCol), dim, numPlanes))
      .withColumn("_norm", l2Norm(col(vecCol)))
      .repartition(n, col("bucket"))
    val a = v.select(col("bucket"), col(idCol).as("id_1"),
      col(vecCol).as("v_1"), col("_norm").as("n_1")).hint("shuffle_hash")
    val b = v.select(col("bucket"), col(idCol).as("id_2"),
      col(vecCol).as("v_2"), col("_norm").as("n_2")).hint("shuffle_hash")
    a.join(b, Seq("bucket"))
      .filter(col("id_1") < col("id_2"))
      .withColumn("cos_sim",
        round(dot(col("v_1"), col("v_2")) / (col("n_1") * col("n_2")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_1", "id_2", "cos_sim")
  }
}
