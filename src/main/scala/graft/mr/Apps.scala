package graft.mr

/** The reference's pluggable applications (mrapps/wc.go, indexer.go,
  * crash.go, nocrash.go, early_exit.go), as Scala
  * map/reduce function pairs for [[MapReduceJob]]. These preserve exact
  * reference semantics; the DataFrame-first equivalents used by the
  * verified query catalog live in [[graft.operators.CorpusQueries]].
  */
object Apps {

  /** Reference tokenizer: maximal runs of Unicode letters
    * (mrapps/wc.go:21-24, `strings.FieldsFunc` + `unicode.IsLetter`).
    */
  def tokenize(text: String): Array[String] =
    text.split("[^\\p{L}]+").filter(_.nonEmpty)

  /** wc — word count (mrapps/wc.go:19-40): map emits `(word, "1")` per
    * occurrence; reduce counts occurrences.
    */
  object WordCount {
    val map: MapReduceJob.MapF =
      (_, contents) => tokenize(contents).map(w => (w, "1"))
    val reduce: MapReduceJob.ReduceF =
      (_, values) => values.size.toString
    // Foldable form for the scalable path (count is a sum).
    val zero = 0L
    val fold: (Long, String) => Long = (b, _) => b + 1L
    val merge: (Long, Long) => Long = _ + _
    val finish: Long => String = _.toString
  }

  /** indexer — inverted index (mrapps/indexer.go:20-39): map emits
    * each *distinct* word of a document paired with the document name;
    * reduce emits `"<count> <sorted,comma,joined,docs>"`.
    */
  object Indexer {
    val map: MapReduceJob.MapF =
      (doc, contents) => tokenize(contents).distinct.map(w => (w, doc))
    val reduce: MapReduceJob.ReduceF = (_, values) => {
      val docs = values.distinct.sorted
      s"${docs.size} ${docs.mkString(",")}"
    }
  }

  /** crash/nocrash query semantics (mrapps/crash.go:45-55, minus the
    * fault injection — Spark task retry owns that concern): reduce
    * sorts the value list and joins with a space.
    */
  object KvConcat {
    val map: MapReduceJob.MapF = (doc, contents) =>
      Seq(("a", doc), ("b", doc.length.toString),
          ("c", contents.length.toString), ("d", "xyzzy"))
    val reduce: MapReduceJob.ReduceF =
      (_, values) => values.sorted.mkString(" ")
  }

  /** early_exit query semantics (mrapps/early_exit.go:19-36): one
    * emission per file keyed by filename; reduce counts them.
    */
  object FileCount {
    val map: MapReduceJob.MapF = (doc, _) => Seq((doc, "1"))
    val reduce: MapReduceJob.ReduceF = (_, values) => values.size.toString
  }
}
