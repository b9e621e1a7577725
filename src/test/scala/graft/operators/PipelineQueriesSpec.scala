package graft.operators

import graft.SparkSpec

/** Sanity + invariance specs for the LLM-pipeline operators (dedup,
  * text analysis, similarity search). Exact value parity vs DuckDB is
  * the driver's gate (tools/check_oracle.py); these specs pin the
  * structural properties that must hold at any scale.
  */
class PipelineQueriesSpec extends SparkSpec {

  test("all pipeline queries execute and return rows at sf0.001") {
    val mods = Seq(DedupQueries.queries, TextQueries.queries,
      EmbeddingQueries.queries)
    for (qs <- mods; (name, fn) <- qs) {
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("dedup_incremental equals the cross-slice subset of the LSH pairs") {
    // The persisted-index incremental path must agree exactly with the
    // from-scratch full-corpus pairing restricted to batch×base pairs:
    // persistence and the bucketed join are semantically invisible.
    val inc = DedupQueries.queries("dedup_incremental")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_base"),
        r.getAs[Long]("n_bands"))).toSet
    val expected = DedupQueries.queries("dedup_minhash_lsh")(spark, sf0001)
      .collect().flatMap { r =>
        val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
        val n = r.getAs[Long]("n_bands")
        (a % 5 == 0, b % 5 == 0) match {
          case (true, false) => Some((a, b, n))
          case (false, true) => Some((b, a, n))
          case _             => None
        }
      }.toSet
    assert(inc === expected)
    assert(inc.nonEmpty)
  }

  test("streaming_incremental_dedup equals the batch twin exactly") {
    // arrival order and micro-batch boundaries must be invisible: the
    // streamed batch slice joined to the persisted index must produce
    // the same (doc_new, doc_base, n_bands) set as the batch operator
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_base"),
        r.getAs[Long]("n_bands"))).toSet
    val streamed =
      rows(SourceQueries.queries("streaming_incremental_dedup")(spark, sf0001))
    val batch = rows(DedupQueries.queries("dedup_incremental")(spark, sf0001))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("ann_int8_rerank: sims are exact cosines, ranks ordered, recall high") {
    val res = EmbeddingQueries.queries("ann_int8_rerank")(spark, sf0001)
      .collect()
    val bf = EmbeddingQueries.queries("ann_brute_force")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("sim")).toMap
    // the rerank is EXACT on its candidates: any (query, neighbor) the
    // exact brute force also returned must carry a bit-identical sim
    var overlap = 0
    res.foreach { r =>
      bf.get((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .foreach { s =>
          assert(s === r.getAs[Double]("sim")); overlap += 1
        }
    }
    // deterministic recall@5 of the coarse int8 tier vs exact search
    assert(overlap >= bf.size * 4 / 5, s"recall too low: $overlap/${bf.size}")
    // per-query ranks follow sim descending
    res.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("corpus_mix: allocations sum to the budget exactly") {
    val rows = TextQueries.corpusMix(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum === 1000000L)
    // proportionality: every allocation within 1 of its exact quota
    val totTok = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    rows.foreach { r =>
      val quota = 1000000L * r.getAs[Long]("n_tokens") / totTok
      val alloc = r.getAs[Long]("alloc_tokens").toDouble
      assert(math.abs(alloc - quota) <= 1.0,
        s"${r.getAs[String]("source")}: alloc=$alloc quota=$quota")
    }
  }

  test("pii_scrub: every injected doc is detected, nothing else fires") {
    val rows = TextQueries.piiScrub(spark, sf0001).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nPii = rows.map(_.getAs[Long]("n_pii_docs")).sum
    val nEmails = rows.map(_.getAs[Long]("n_emails")).sum
    val nPhones = rows.map(_.getAs[Long]("n_phones")).sum
    // injection hits doc_id % 11 == 0; the corpus has no natural PII,
    // so detection must equal injection exactly — one email + one
    // phone per injected doc
    val injected = graft.core.Tables.documents(spark, sf0001)
      .filter("doc_id % 11 = 0").count()
    assert(nDocs === 500L)
    assert(nPii === injected)
    assert(nEmails === injected && nPhones === injected)
  }

  test("dedup_exact: canonical ids are minimal and copies cover the corpus") {
    val rows = DedupQueries.dedupExact(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_copies")).sum
    assert(total === 500L)
    assert(rows.forall(_.getAs[Long]("n_copies") >= 1L))
  }

  test("minhash LSH candidates are a superset of high-jaccard pairs") {
    // Pairs with true Jaccard >= 0.5 that LSH misses should be rare;
    // with 4x4 bands, J=0.5 collides with p = 1-(1-0.5^4)^4 ~ 0.23 per
    // pair, but every EXACT duplicate pair (J=1) must be found.
    val lsh = DedupQueries.dedupMinhashLsh(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupQueries.dedupNgramJaccard(spark, sf0001)
      .filter("jaccard >= 0.9999").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh),
      s"LSH missed exact-duplicate pairs: ${exact -- lsh}")
  }

  test("simhash fingerprints are 32-bit strings, stable across partitions") {
    val a = DedupQueries.dedupSimhash(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = DedupQueries.dedupSimhash(spark, sf0001).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("jaccard scores are within (0, 1]") {
    val sims = DedupQueries.dedupNgramJaccard(spark, sf0001)
      .collect().map(_.getAs[Double]("jaccard"))
    assert(sims.forall(j => j > 0.0 && j <= 1.0))
  }

  test("ann_brute_force: k neighbors per query, descending similarity") {
    val rows = EmbeddingQueries.annBruteForce(spark, sf0001).collect()
    val perQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQ.size === 10)
    perQ.values.foreach { ns =>
      assert(ns.length === 5)
      val sims = ns.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.sameElements(sims.sortBy(-_)), "not sorted by sim desc")
      assert(sims.forall(s => s >= -1.0000001 && s <= 1.0000001))
    }
  }

  test("lsh top-k neighbors are true-similarity-ranked within candidates") {
    val rows = EmbeddingQueries.annLshTopk(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { ns =>
      val byRank = ns.sortBy(_.getAs[Long]("rank"))
      val sims = byRank.map(_.getAs[Double]("sim"))
      assert(sims.sameElements(sims.sortBy(-_)), "not sorted by sim desc")
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ===
        (1L to byRank.length).toSeq)
    }
  }

  test("ivf top-k is the pruned subset of brute force (recall sanity)") {
    val bf = EmbeddingQueries.annBruteForce(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = EmbeddingQueries.annIvfTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe=2 of 5 clusters: expect meaningful but imperfect recall
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall > 0.2, s"IVF recall suspiciously low: $recall")
    assert(ivf.size <= bf.size + 50)
  }

  test("kmeans training: every vector assigned, digests stable per run") {
    val rows = EmbeddingQueries.annKmeansCentroids(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables.embeddings(spark, sf0001).count()
    // every corpus vector belongs to exactly one surviving cluster
    assert(rows.map(_.getAs[Long]("n_members")).sum === total)
    rows.foreach(r => assert(r.getAs[Long]("cnorm") > 0L))
    // deterministic: a second run reproduces the digests exactly
    val again = EmbeddingQueries.annKmeansCentroids(spark, sf0001).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      .sameElements(
        again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)))
  }

  test("lang_id confusion matrix covers every document") {
    val n = TextQueries.langId(spark, sf0001)
      .collect().map(_.getAs[Long]("n_docs")).sum
    assert(n === 500L)
  }

  test("text_stats ratios are in-range and quality score in 0..3") {
    val rows = TextQueries.textStats(spark, sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0.0 &&
             r.getAs[Double]("punct_ratio") <= 1.0)
      assert(r.getAs[Double]("stopword_ratio") >= 0.0 &&
             r.getAs[Double]("stopword_ratio") <= 1.0)
      val q = r.getAs[Long]("quality_score")
      assert(q >= 0L && q <= 3L)
    }
  }

  test("doc_repetition: only repetitive docs, ratio strictly inside (0,1)") {
    val rows = TextQueries.docRepetition(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") < r.getAs[Long]("n_grams"))
      val ratio = r.getAs[Double]("distinct_ratio")
      assert(ratio > 0.0 && ratio < 1.0)
    }
  }

  test("contamination: eval docs excluded; exact eval copies score 1.0") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        md5(trim(regexp_replace(lower(col("text")), "[^\\p{L}]+", " ")))
          .as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evalSources = docs.filter(_._2 == "src0")
    val evalHashes = evalSources.map(_._3).toSet
    val rows = TextQueries.contaminationNgram(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_grams"))
      val c = r.getAs[Double]("contamination")
      assert(c > 0.0 && c <= 1.0)
    }
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("contamination")).toMap
    // no eval-set doc may appear in the training-side report
    assert(evalSources.map(_._1).toSet.intersect(byId.keySet).isEmpty)
    // a training doc whose normalized text exactly equals an eval doc's
    // shares every 4-gram with the eval set: contamination must be 1.0
    // (no such pair exists at sf0.001 — the check arms at larger SFs)
    docs.filter(d => d._2 != "src0" && evalHashes(d._3)).foreach {
      case (id, _, _) =>
        assert(byId.get(id).contains(1.0),
          s"doc $id should be fully contaminated")
    }
  }
}
