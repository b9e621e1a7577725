package graft.operators

import graft.SparkSpec

/** Pins the n-gram-Jaccard candidate-pair budget
  * ([[DedupQueries.JaccardPairBudgetConf]]): under budget the operator
  * runs the exact inverted-list expansion; past budget it must fall
  * back to MinHash-LSH candidates with exact re-scoring — a RECALL
  * change only, never a score change. The budget exists because
  * duplicate density (not corpus size) multiplies the candidate set:
  * at 10× replicated text the exact path's pair set grows 40.8×
  * (51.6 M) while the natural 10× density is 1.27 M.
  */
class NgramJaccardBudgetSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), Double] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("past-budget fallback keeps exact scores, loses at most recall, " +
       "and the default budget clears natural harness density") {
    // child sessions: the budget conf must never leak into the shared
    // suite session (other suites run this operator via the catalog)
    val exactS = spark.newSession()
    // guard the guard: the default budget must not trip on natural
    // density — an sf0.01 run under the DEFAULT conf must take the
    // exact path, which this spec detects by result identity with an
    // explicitly-unbounded run
    val exact = pairs(DedupQueries.dedupNgramJaccard(exactS, sf001))
    val unboundedS = spark.newSession()
    unboundedS.conf.set(DedupQueries.JaccardPairBudgetConf,
      Long.MaxValue.toString)
    assert(pairs(DedupQueries.dedupNgramJaccard(unboundedS, sf001))
      === exact, "default budget tripped on natural sf0.01 density")
    assert(exact.nonEmpty)

    val fbS = spark.newSession()
    fbS.conf.set(DedupQueries.JaccardPairBudgetConf, "0")
    val fallback = pairs(DedupQueries.dedupNgramJaccard(fbS, sf001))
    // every fallback pair is an exact-path pair with the IDENTICAL
    // exact Jaccard — the fallback may only shrink the candidate set
    fallback.foreach { case (p, j) =>
      assert(exact.contains(p), s"fallback invented pair $p")
      assert(exact(p) == j, s"fallback changed score of $p")
    }
    // recall floor: the harness near-dups are all J ≥ 0.9, where the
    // 4-band × 4-row LSH miss probability is ≤ (1−0.9⁴)⁴ ≈ 1.4% per
    // pair — the deterministic hash family must find nearly all of
    // them (and exactly the same ones on every run)
    assert(fallback.size >= exact.size * 9 / 10,
      s"fallback recall ${fallback.size}/${exact.size} below floor")
    val fb2S = spark.newSession()
    fb2S.conf.set(DedupQueries.JaccardPairBudgetConf, "0")
    assert(pairs(DedupQueries.dedupNgramJaccard(fb2S, sf001)) === fallback,
      "fallback not deterministic")
  }
}
