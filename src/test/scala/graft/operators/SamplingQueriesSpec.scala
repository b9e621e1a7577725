package graft.operators

import graft.SparkSpec

class SamplingQueriesSpec extends SparkSpec {

  test("split assignment covers the corpus and is heavily train-weighted") {
    val rows = SamplingQueries.splitAssign(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(rows.values.sum === 500L)
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    assert(rows("train") > rows.getOrElse("val", 0L) &&
           rows("train") > rows.getOrElse("test", 0L))
  }

  test("hash sample is reproducible and roughly 1/16 of the corpus") {
    val a = SamplingQueries.sampleHash(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).sorted
    val b = SamplingQueries.sampleHash(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).sorted
    assert(a.sameElements(b), "sample not reproducible")
    // binomial(500, 1/16): mean ~31, keep a wide band
    assert(a.length > 10 && a.length < 80, s"sample size ${a.length}")
  }

  test("stratified sample takes exactly 10 docs from every source") {
    val per = SamplingQueries.sampleStratified(spark, sf0001).collect()
      .groupBy(_.getString(0)).map { case (src, rs) => src -> rs.length }
    val nSources = graft.core.Tables.documents(spark, sf0001)
      .select("source").distinct().count()
    assert(per.size === nSources)
    assert(per.values.forall(_ === 10), s"uneven strata: $per")
  }

  test("stratified sample prunes to k per group before the shuffle") {
    val plan = SamplingQueries.sampleStratified(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$plan")
  }

  test("shuffle_positions: exact permutation 1..N, partition-invariant") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val n = docs.count()
    val rows = SamplingQueries.shufflePositions(spark, sf0001).collect()
    // bijection: positions are exactly 1..N, doc ids are exactly the corpus
    assert(rows.map(_.getLong(0)).sorted.toSeq === (1L to n))
    assert(rows.map(_.getLong(1)).toSet ===
      docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    // the distributed prefix-sum rank must not depend on physical layout
    val g = SamplingQueries.shufflePositions(spark, sf0001)
    assert(g.repartition(13).collect().toSet === rows.toSet)
  }

  test("pack_sequences: conserves docs and tokens, contiguous seq ids") {
    val seqs = SamplingQueries.packSequences(spark, sf0001).collect()
    val docs = graft.core.Tables.documents(spark, sf0001)
    val nDocs = docs.count()
    val totalToks = graft.core.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.expr(
        "sum(size(split(trim(text), '\\\\s+')))")).head().getLong(0)
    assert(seqs.map(_.getLong(1)).sum === nDocs)           // every doc packed once
    assert(seqs.map(_.getLong(2)).sum === totalToks)       // every token counted
    val ids = seqs.map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until ids.length))            // no gaps
    // id ranges of consecutive sequences must not interleave (packing
    // follows the global doc_id order)
    val byId = seqs.sortBy(_.getLong(0))
    byId.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) < b.getLong(3),
        s"sequences ${a.getLong(0)} and ${b.getLong(0)} interleave")
      case _ => ()
    }
  }
}
