package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("stub decoder is deterministic and normalized") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val a = MultimodalQueries.stubDecode(bytes)
    val b = MultimodalQueries.stubDecode(bytes)
    assert(a.sameElements(b))
    assert(a.length === MultimodalQueries.FeatureDim)
    assert(math.abs(a.sum - 1.0f) < 1e-5f, "histogram should sum to 1")
    assert(MultimodalQueries.stubDecode(Array.empty[Byte]).forall(_ == 0f))
  }

  test("media table: payload bytes match document text, kinds cycle") {
    val rows = MultimodalQueries.mediaTable(spark, sf0001).collect()
    assert(rows.length === 500)
    assert(rows.map(_.kind).toSet === Set("image", "audio", "video"))
    rows.foreach { m =>
      assert(m.kind === Seq("image", "audio", "video")((m.doc_id % 3).toInt))
      assert(m.payload.nonEmpty)
      assert(m.width >= 16 && m.height >= 16 && m.n_frames >= 1)
    }
  }

  test("mediaFeatures: one row per doc, features normalized") {
    val rows = MultimodalQueries.mediaFeatures(spark, sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { f =>
      assert(f.features.length === MultimodalQueries.FeatureDim)
      assert(math.abs(f.features.sum - 1.0f) < 1e-4f)
      assert(f.n_bytes > 0)
    }
  }

  test("frameSample: only video rows, every 2nd frame index") {
    val media = MultimodalQueries.mediaTable(spark, sf0001).collect()
      .filter(_.kind == "video").map(m => m.doc_id -> m.n_frames).toMap
    val frames = MultimodalQueries.frameSample(spark, sf0001).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.keySet === media.keySet)
    byDoc.foreach { case (docId, fs) =>
      val expected = (0 until media(docId) by 2).toSet
      assert(fs.map(_.frame_idx).toSet === expected)
    }
  }

  test("feature stats aggregate is partition-count invariant") {
    val a = MultimodalQueries.multimodalFeatureStats(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = MultimodalQueries.multimodalFeatureStats(spark, sf0001)
        .collect().map(_.toSeq).sortBy(_.mkString).toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("shuffle in feature stats does not carry payload bytes") {
    val plan = MultimodalQueries.multimodalFeatureStats(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the exchange comes after featurization: payload never shuffles
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0)
    assert(!plan.substring(0, exchangeIdx).contains("payload"),
      s"payload column crosses the shuffle:\n$plan")
  }
}
