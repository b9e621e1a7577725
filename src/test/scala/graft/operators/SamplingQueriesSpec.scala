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
}
