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
  private def recallVsBrute(approx: DataFrame): Double = {
    val exact = EmbeddingQueries.annBruteForce(spark, sf0001)
      .select(col("query_id"), col("neighbor_id"))
    val hit = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "inner").count()
    hit.toDouble / exact.count()
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
}
