package graft.mr

import graft.SparkSpec
import graft.core.Tables
import graft.operators.CorpusQueries

class MapReduceJobSpec extends SparkSpec {
  import spark.implicits._

  // Micro corpus from FIXTURES.md §2a: multi-case, digits-inside-words,
  // apostrophes, accents, cross-document words, empty doc.
  val micro: Seq[(String, String)] = Seq(
    ("d1", "The cat saw the CAT. don't ab1cd café"),
    ("d2", "cat café; the end"),
    ("d3", ""))

  def corpus = spark.createDataset(micro)

  test("tokenizer: reference unicode.IsLetter semantics") {
    assert(Apps.tokenize("don't") === Array("don", "t"))
    assert(Apps.tokenize("ab1cd") === Array("ab", "cd"))
    assert(Apps.tokenize("café") === Array("café"))
    assert(Apps.tokenize("") === Array.empty[String])
    assert(Apps.tokenize("  ,,  ") === Array.empty[String])
    assert(Apps.tokenize("The CAT") === Array("The", "CAT")) // case preserved
  }

  test("wc via MR core matches hand-computed golden") {
    val got = MapReduceJob.runOnCorpus(corpus, Apps.WordCount.map,
      Apps.WordCount.reduce).collect().map(kv => kv.key -> kv.value).toMap
    val expected = Map(
      "The" -> "1", "cat" -> "2", "saw" -> "1", "the" -> "2",
      "CAT" -> "1", "don" -> "1", "t" -> "1", "ab" -> "1", "cd" -> "1",
      "café" -> "2", "end" -> "1")
    assert(got === expected)
  }

  test("wc foldable (map-side partial agg) equals holistic wc") {
    val holistic = MapReduceJob.runOnCorpus(corpus, Apps.WordCount.map,
      Apps.WordCount.reduce).collect().map(kv => kv.key -> kv.value).toMap
    val folded = MapReduceJob.runFoldable(corpus, Apps.WordCount.map,
      Apps.WordCount.zero, Apps.WordCount.fold, Apps.WordCount.merge,
      Apps.WordCount.finish).collect().map(kv => kv.key -> kv.value).toMap
    assert(folded === holistic)
  }

  test("inverted index via MR core matches golden") {
    val got = MapReduceJob.runOnCorpus(corpus, Apps.Indexer.map,
      Apps.Indexer.reduce).collect().map(kv => kv.key -> kv.value).toMap
    assert(got("cat") === "2 d1,d2")
    assert(got("café") === "2 d1,d2")
    assert(got("The") === "1 d1")
    assert(got("the") === "2 d1,d2")
  }

  test("kv_concat reducer sorts values then space-joins") {
    val got = MapReduceJob.runOnCorpus(corpus, Apps.KvConcat.map,
      Apps.KvConcat.reduce).collect().map(kv => kv.key -> kv.value).toMap
    assert(got("a") === "d1 d2 d3")
    assert(got("d") === "xyzzy xyzzy xyzzy")
  }

  test("file_count is one count per input document") {
    val got = MapReduceJob.runOnCorpus(corpus, Apps.FileCount.map,
      Apps.FileCount.reduce).collect().map(kv => kv.key -> kv.value).toMap
    assert(got === Map("d1" -> "1", "d2" -> "1", "d3" -> "1"))
  }

  test("MR wc over documents == DataFrame-first wc (self-consistency)") {
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("CAST(doc_id AS STRING)", "text").as[(String, String)]
    val viaMr = MapReduceJob.runOnCorpus(docs, Apps.WordCount.map,
      Apps.WordCount.reduce).collect().map(kv => kv.key -> kv.value.toLong).toMap
    val viaDf = CorpusQueries.wc(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMr === viaDf)
  }

  test("partition invariance: result identical across repartitionings") {
    val base = MapReduceJob.runOnCorpus(corpus, Apps.WordCount.map,
      Apps.WordCount.reduce).collect().map(kv => kv.key -> kv.value).toMap
    for (n <- Seq(1, 3, 7)) {
      val got = MapReduceJob.runOnCorpus(corpus.repartition(n),
        Apps.WordCount.map, Apps.WordCount.reduce)
        .collect().map(kv => kv.key -> kv.value).toMap
      assert(got === base, s"mismatch at $n partitions")
    }
  }

  test("whole-file scan + text sink round-trip (reference E1/E10 shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.txt"), "hop hop step")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/b.txt"), "step")
    val out = MapReduceJob.run(spark, Seq(s"$dir/a.txt", s"$dir/b.txt"),
      Apps.WordCount.map, Apps.WordCount.reduce)
    val got = out.collect().map(kv => kv.key -> kv.value).toMap
    assert(got === Map("hop" -> "2", "step" -> "2"))
    MapReduceJob.saveText(out, s"$dir/out")
    val lines = spark.read.text(s"$dir/out").collect().map(_.getString(0))
    assert(lines.sorted === Array("hop 2", "step 2"))
  }
}
