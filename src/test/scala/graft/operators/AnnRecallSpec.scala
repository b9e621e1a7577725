package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Retrieval-QUALITY probe for the approximate ANN entries — the one
  * property the DuckDB oracle cannot see. The oracle pins that each
  * bucketed computation is exact GIVEN its candidate set (same
  * centroids, same probes ⇒ same rows); this spec pins that the
  * candidate sets are GOOD, against the exact brute-force top-k:
  *
  *  1. recall@k climbs monotonically as probes widen, and at
  *     nprobe = nlist the IVF search recovers brute force EXACTLY
  *     (probing every cluster must degrade to the exact search — the
  *     property a broken assignment or probe list loses first);
  *  2. at the catalog entries' pinned nprobe, recall beats the
  *     scanned-corpus-fraction baseline with clear margin (the test
  *     embeddings are near-random, so recall tracks scanned fraction;
  *     an index that only matched the fraction would be adding zero
  *     signal over sampling).
  *
  * Measured curve on the fixture (nlist=16): nprobe 2→0.36, 4→0.52,
  * 8→0.74, 12→0.88, 16→1.00; trained KMeans (nlist=8, nprobe=2,
  * scanned fraction 0.25) → 0.50.
  */
class AnnRecallSpec extends SparkSpec {

  /** recall@k, micro-averaged over queries: |approx ∩ exact| / |exact|
    * on (query_id, neighbor_id) pairs.
    */
  private def recallVsBruteAt(dir: String, approx: DataFrame): Double = {
    val exact = EmbeddingQueries.annBruteForce(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val hit = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "inner").count()
    hit.toDouble / exact.count()
  }

  private def recallVsBrute(approx: DataFrame): Double =
    recallVsBruteAt(sf0001, approx)

  /** CLUSTERED fixture (VERDICT r11 #3): the driver's embeddings are
    * near-random, which caps recall at ~the scanned fraction — a real
    * retrieval-quality regression is invisible against them. This
    * fixture has honest cluster structure: 16 deterministic unit
    * centers (seeded Gaussians), vectors = center + σ=0.02 noise,
    * cluster membership hash-SCATTERED over vec_id so both the strided
    * IVF seeds (`vec_id % stride == 0`) and the `vec_id < 10` query
    * set land across clusters rather than inside one. On data like
    * this a correct IVF/KMeans index puts each query's whole
    * neighborhood in the query's first-probed cell, so recall@k at the
    * pinned nprobe must be near-perfect — an absolute bar, not a
    * beats-sampling bar. Same schema as `embeddings.parquet`
    * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
    */
  private lazy val clusteredDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ann_clustered")
    val nClusters = 16; val n = 512; val dim = 64
    val centers = Array.tabulate(nClusters) { c =>
      val r = new scala.util.Random(0xC0FFEE + c)
      val v = Array.fill(dim)(r.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    // stride ids (the IVF seed set, ceil(512/16)=32) cover every
    // cluster exactly once — a cluster with no seed would scatter its
    // members over nearly-equidistant foreign cells and cap recall
    // below the bar for index-quality reasons the fixture, not the
    // index, created; everything else hash-scatters
    def clusterOf(id: Long): Int =
      if (id % 32 == 0) ((id / 32) % nClusters).toInt
      else ((id * 2654435761L).toInt & 0x7fffffff) % nClusters
    val rows = (0L until n.toLong).map { id =>
      val c = clusterOf(id)
      val r = new scala.util.Random(31L * id + 7L)
      val v = centers(c).map(x => x + 0.02f * r.nextGaussian().toFloat)
      (id, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding",
        "CAST(label AS INT) AS label")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("IVF recall climbs with nprobe and is exact at full probe") {
    val curve = Seq(2, 8, 16).map(np =>
      np -> recallVsBrute(EmbeddingQueries.annIvfTopkAt(spark, sf0001, np)))
    curve.sliding(2).foreach { case Seq((npA, a), (npB, b)) =>
      assert(a <= b,
        f"recall must not fall as probes widen: nprobe=$npA → $a%.3f, " +
          f"nprobe=$npB → $b%.3f")
    }
    val full = curve.last._2
    assert(full === 1.0,
      f"nprobe = nlist must recover brute force exactly, got $full%.3f")
    // entry-pinned operating point (nprobe=2 of nlist=16): scanned
    // fraction is 0.125; require ≥2× that so the index provably adds
    // signal over random sampling (measured 0.36)
    val pinned = curve.head._2
    assert(pinned >= 0.25,
      f"ann_ivf_topk recall at pinned nprobe collapsed to $pinned%.3f")
  }

  test("trained-KMeans recall beats its scanned-fraction baseline") {
    // nlist=8, nprobe=2 → fraction 0.25; measured 0.50 (2× lift)
    val r = recallVsBrute(EmbeddingQueries.annKmeansTopk(spark, sf0001))
    assert(r >= 0.4,
      f"ann_kmeans_topk recall collapsed to $r%.3f (baseline 0.25)")
  }

  test("clustered fixture: recall@k ≥ 0.9 at the pinned nprobe for " +
    "both the strided-seed IVF and the trained-KMeans index") {
    // scanned fraction at nprobe=2/nlist=16 is 0.125 — on clustered
    // data a correct index must be nowhere near it
    val ivf = recallVsBruteAt(clusteredDir,
      EmbeddingQueries.annIvfTopkAt(spark, clusteredDir, 2))
    assert(ivf >= 0.9,
      f"IVF recall on clustered data collapsed to $ivf%.3f — the " +
        "index is not putting neighborhoods in probed cells")
    val km = recallVsBruteAt(clusteredDir,
      EmbeddingQueries.annKmeansTopk(spark, clusteredDir))
    assert(km >= 0.9,
      f"trained-KMeans recall on clustered data collapsed to $km%.3f")
  }
}
