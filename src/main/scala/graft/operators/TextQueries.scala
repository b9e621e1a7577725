package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Checkpoint.CheckpointOps
import graft.functions._

/** Text-analysis operators over `documents` — language ID, quality
  * scoring, token counting — the per-document feature extraction stage of
  * an LLM-data pipeline.
  *
  * Everything is narrow (per-row map over pruned columns, zero shuffles
  * until the final small aggregate), built from codegen'd string/array
  * builtins — at 100 TB these queries are pure scan-throughput, which is
  * exactly what you want feature extraction to be. All ratios divide
  * exact integer counts as the final step, so results are bit-identical
  * to the DuckDB oracles.
  */
object TextQueries {

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Order of `LangPriority` is the deterministic tie-break.
    */
  private val StopEn = Seq("the", "of", "and", "to", "a", "in", "is", "it",
    "for", "on", "with", "as")
  private val StopEs = Seq("el", "la", "de", "que", "y", "en", "un", "una",
    "los", "las", "del", "por")
  private val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "eine",
    "nicht", "mit", "den", "von", "zu")
  private val StopFr = Seq("le", "la", "les", "de", "des", "et", "un", "une",
    "est", "dans", "pour", "que")

  private def lowToks(c: Column): Column = tokens(lower(c))

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  private def sqlStopHits(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(
      "len(list_filter(toks, t -> t IN (", ", ", ")))")

  /** Per-doc language-prediction CTE chain (…, lang_pred) shared by the
    * lang_id confusion matrix and the keep/drop pipeline oracle; caller
    * prepends `WITH `.
    */
  private lazy val langPredSql =
    s"""scored AS (
       |  SELECT doc_id, lang,
       |    ${sqlStopHits(StopEn)} AS s_en,
       |    ${sqlStopHits(StopEs)} AS s_es,
       |    ${sqlStopHits(StopDe)} AS s_de,
       |    ${sqlStopHits(StopFr)} AS s_fr,
       |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))
       |      AS n_han
       |  FROM (SELECT doc_id, lang, text,
       |          list_filter(regexp_split_to_array(lower(text),
       |              '[^\\p{L}]+'), t -> t <> '') AS toks
       |        FROM documents)),
       |lang_pred AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN n_han > 0 THEN 'zh'
       |         WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
       |         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |         WHEN s_de >= s_fr THEN 'de'
       |         ELSE 'fr' END AS pred_lang
       |  FROM scored)""".stripMargin

  /** Per-document statistics + a simple integer quality score:
    * +1 each for (a) healthy average token length [3,12], (b) some
    * non-trivial length (≥20 tokens), (c) moderate punctuation (<20%).
    * The score is a deterministic integer; ratios are exact divisions.
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).as("len"),
      size(tokens(col("text"))).as("n_toks"),
      // pieces = separator matches + 1 exactly (`\s+` can never match
      // empty, and a trimmed string has no edge separators), so the
      // fused counter replaces the split ARRAY the builtin would build
      (graft.plans.GraftExtensions
        .countMatches(s, trim(col("text")), "\\s+") + 1).as("n_ws_toks"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")))
        .as("n_punct"),
      stopHits(lowToks(col("text")), StopEn).as("n_stop"))
    d.select(
      col("doc_id"), col("len").cast("long").as("n_chars"),
      col("n_toks").cast("long").as("n_tokens"),
      col("n_ws_toks").cast("long").as("n_ws_tokens"),
      (col("len").cast("double") / col("n_toks")).as("avg_tok_len"),
      (col("n_punct").cast("double") / col("len")).as("punct_ratio"),
      (col("n_stop").cast("double") / col("n_toks")).as("stopword_ratio"),
      (when(col("len").cast("double") / col("n_toks") >= 3.0 &&
            col("len").cast("double") / col("n_toks") <= 12.0, 1)
        .otherwise(0) +
       when(col("n_toks") >= 20, 1).otherwise(0) +
       when(col("n_punct").cast("double") / col("len") < 0.2, 1)
        .otherwise(0)).cast("long").as("quality_score"))
  }

  /** Language identification by stopword-hit argmax (CJK presence short-
    * circuits to `zh`; zero hits ⇒ `und`; ties break en>es>de>fr). The
    * output is the lang × predicted-lang confusion matrix — small enough
    * to collect at any scale, per-doc work is map-only.
    *
    * Hot-path shape: ONE codegen'd `regexp_extract_all` pass extracts
    * just the stopword occurrences (the lookarounds make a match ≡ a full
    * Unicode-letter token equal to the word — same counts as filtering
    * the token array), so the per-language tallies then run over a
    * tiny hits array instead of four interpreted filters over every
    * token. Han detection is `rlike` (boolean find) rather than
    * rebuilding the string with regexp_replace. ~8× faster, identical
    * values.
    */
  /** Per-document language prediction (doc_id, lang, pred_lang) — the
    * shared front end of the confusion matrix and the keep/drop filter.
    */
  def langPred(s: SparkSession, dir: String): DataFrame = {
    val union = (StopEn ++ StopEs ++ StopDe ++ StopFr).distinct
      .sortBy(w => (-w.length, w))
    val hitPat = union.mkString("(?<![\\p{L}])(?:", "|", ")(?![\\p{L}])")
    val withHits = Tables.documents(s, dir).select(
      col("doc_id"), col("lang"),
      regexp_extract_all(lower(col("text")), lit(hitPat), lit(0)).as("hits"),
      col("text").rlike("[\\x{4e00}-\\x{9fff}]").as("has_han"))
    val sEn = stopHits(col("hits"), StopEn)
    val sEs = stopHits(col("hits"), StopEs)
    val sDe = stopHits(col("hits"), StopDe)
    val sFr = stopHits(col("hits"), StopFr)
    val pred =
      when(col("has_han"), "zh")
        .when(size(col("hits")) === 0, "und")
        .when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
        .when(sEs >= sDe && sEs >= sFr, "es")
        .when(sDe >= sFr, "de")
        .otherwise("fr")
    withHits.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
  }

  def langId(s: SparkSession, dir: String): DataFrame =
    langPred(s, dir)
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))

  /** Token counting per source: whitespace tokens vs a BPE-ish regex
    * tokenization (letter runs | digit runs | single other non-space) —
    * the standard pre-tokenizer shape. Counts are exact integers.
    */
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    val bpe = "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"
    Tables.documents(s, dir)
      .select(col("source"),
        // matches + 1, not a split array — see textStats' n_ws_toks
        (graft.plans.GraftExtensions
          .countMatches(s, trim(col("text")), "\\s+") + 1)
          .cast("long").as("ws"),
        size(regexp_extract_all(col("text"), lit(bpe), lit(0))).cast("long")
          .as("bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("ws")).as("n_ws_tokens"),
           sum(col("bpe")).as("n_bpe_tokens"))
  }

  /** Term statistics for TF-IDF: for the 50 highest-document-frequency
    * terms, the document frequency and total term frequency. All counts
    * are exact integers (the IDF log is left to the consumer — keeping
    * the operator integer-only makes it engine-exact); the tf explode
    * feeds ONE partial-aggregated groupBy(term), and top-k by (df, term)
    * is a total order.
    */
  def docTermStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(lowToks(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      .orderBy(col("df").desc, col("term"))
      .limit(50)

  /** Top-50 word bigrams (with multiplicity) over lowercased letter
    * tokens — the n-gram language-model counting shape. Bigram emission
    * is a typed kernel (string concat per position, no interpreted HOF);
    * one partial-aggregated groupBy(bigram) and a total-order top-k
    * (count desc, bigram asc) follow.
    */
  def ngramFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(split(trim(regexp_replace(lower(col("text")), TokenSep, " ")),
        " ").as("t"))
      .filter(size(col("t")) >= 2)
      .as[Array[String]]
      .flatMap { toks =>
        val out = new Array[String](toks.length - 1)
        var i = 0
        while (i < toks.length - 1) {
          out(i) = toks(i) + " " + toks(i + 1)
          i += 1
        }
        out
      }
      .toDF("bigram")
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(50)
  }

  /** Per-document fluency under a corpus-trained bigram language model —
    * the LM-scoring stage of a data pipeline (perplexity filtering a la
    * CCNet/Gopher), made ENGINE-EXACT: instead of summed log
    * probabilities (libm `ln` differs across engines in the last ulp),
    * each bigram occurrence scores the maximum-likelihood transition
    * probability P(w2|w1) = c(w1,w2)/c(w1·) as `floor(1e6 · c12/c1)`
    * parts-per-million — one IEEE double multiply + divide + floor,
    * bit-identical in any engine — and the per-doc aggregate is an
    * exact integer sum. Low mean transition probability = the least
    * "predictable" documents (gibberish, boilerplate-free rare text,
    * OCR noise); the entry returns the bottom 20.
    *
    * Scale shape: the model IS two partial-aggregated groupBys over the
    * bigram stream (context counts derive from the bigram counts — no
    * second corpus pass), and scoring is ONE shuffle join of occurrences
    * against the model on the bigram key — every stage key-partitioned,
    * nothing driver-mediated, no data-sized window. Self-scoring means
    * every query bigram exists in the model (c12 ≥ 1), so the join is
    * inner and smoothing-free by construction.
    */
  def docLmScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE corpus pass: tokenize + per-(doc, bigram) occurrence counts,
    // CHECKPOINTED — the typed flatMap subtree does not canonicalize
    // for exchange reuse (measured: the r9 per-occurrence shape scanned
    // the corpus 3×; routing both consumers through this aggregate
    // still left 2×), so the aggregate is materialized once and the
    // model build + scoring join both read it. The materialization is
    // the DEDUPLICATED (doc, bigram) table — strictly smaller than the
    // bigram shuffle the groupBy already pays — so at 100 TB this
    // trades a full corpus re-scan + re-tokenize for a block-manager
    // read of data the job shuffled anyway. `DocLmLineageSpec` pins
    // the single corpus scan.
    import graft.core.Checkpoint.CheckpointOps
    val docBi = Tables.documents(s, dir)
      .select(col("doc_id"),
        split(trim(regexp_replace(lower(col("text")), TokenSep, " ")), " ")
          .as("t"))
      .filter(size(col("t")) >= 2)
      .as[(Long, Array[String])]
      .flatMap { case (id, toks) =>
        (0 until toks.length - 1).iterator.map(i => (id, toks(i), toks(i + 1)))
      }
      .toDF("doc_id", "w1", "w2")
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("c"))
      .sharedCheckpoint()
    val big = docBi.groupBy("w1", "w2").agg(sum(col("c")).as("c12"))
    val model = big
      .join(big.groupBy("w1").agg(sum(col("c12")).as("c1")), "w1")
      .select(col("w1"), col("w2"),
        floor(lit(1e6) * col("c12") / col("c1")).cast("bigint").as("ppm"))
    docBi.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("ppm")).as("ppm_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        floor(col("ppm_sum") / col("n_bigrams")).cast("bigint").as("avg_ppm"))
      .orderBy(col("avg_ppm").asc, col("doc_id"))
      .limit(20)
  }

  /** First K byte-pair-encoding merges trained on the corpus — the
    * vocabulary-induction stage of a tokenizer pipeline (Sennrich et
    * al.'s BPE), shaped for scale: after ONE corpus pass builds the
    * frequency-weighted word vocabulary, every round operates on the
    * VOCAB (distinct words × their symbol strings), which is bounded
    * regardless of corpus size — at 100 TB the corpus pass is one
    * partial-aggregated groupBy and each merge round is a vocab-sized
    * pair count plus a map-only rewrite. The driver holds exactly one
    * row per round (the argmax pair — the same scalar class as the ann
    * query vectors). Ties break deterministically (count desc, pair
    * asc), and the merge-apply is defined as the engines' shared
    * left-to-right non-overlapping string `replace` on the
    * space-sentineled symbol string — bit-identical in Spark and
    * DuckDB, so the oracle replays the K rounds as staged CTEs.
    */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Checkpoint.CheckpointOps
    val rounds = 3
    val chars = expr(
      "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))")
    // the vocab is CHECKPOINTED after the corpus aggregate and after each
    // round's rewrite: every round ends in a `.head()` action, and without
    // the cut each action would replay the full lineage — the documents
    // scan + tokenize + groupBy plus all prior rounds' rewrites, i.e. K
    // corpus passes for K merges instead of the documented one
    // (`BpeLineageSpec` pins the corpus parquet read to round 1 only)
    var vocab = Tables.documents(s, dir)
      .select(explode(lowToks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), concat_ws(" ", chars), lit(" ")).as("syms"),
        col("freq"))
      .sharedCheckpoint()
    val picked = (1 to rounds).map { r =>
      val best = vocab
        .select(col("freq"), split(trim(col("syms")), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(t) - 2), i -> " +
            "concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
          .as("p"))
        .groupBy("p").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("p")).limit(1)
        .head()
      val (pair, cnt) = (best.getString(0), best.getLong(1))
      // tokens are letter-only, so the pair embeds safely in a SQL literal
      vocab = vocab.withColumn("syms",
        expr(s"replace(syms, ' $pair ', ' ${pair.replace(" ", "")} ')"))
      // the last round's rewrite has no consumer — don't materialize it
      if (r < rounds) vocab = vocab.sharedCheckpoint()
      (r, pair, cnt)
    }
    import s.implicits._
    picked.toDF("rank", "pair", "cnt")
      .select(col("rank").cast("int").as("rank"), col("pair"), col("cnt"))
  }

  /** The APPLY half of the tokenizer lifecycle: encode the corpus with
    * the [[bpeMerges]]-trained merge list and report per-source token
    * statistics (the words-per-token compression audit a tokenizer
    * change ships with). Scale shape: the merge list is K driver
    * strings (the same scalar class as the ann query vectors), merge
    * APPLICATION runs once per DISTINCT WORD (vocab-sized map-only
    * work, bounded regardless of corpus bytes), and the per-word token
    * counts join back to the occurrence stream on the word key — one
    * shuffle, no corpus-sized string rewriting. Encoding semantics are
    * the shared left-to-right non-overlapping `replace` on the
    * space-sentineled symbol string, exactly as trained, so the oracle
    * replays train + encode as staged CTEs.
    */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(s, dir).orderBy("rank").collect()
      .map(_.getString(1))
    val occurrences = Tables.documents(s, dir)
      .select(col("source"), explode(lowToks(col("text"))).as("w"))
    val chars = expr(
      "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))")
    var wsyms = occurrences.select(col("w")).distinct()
      .select(col("w"),
        concat(lit(" "), concat_ws(" ", chars), lit(" ")).as("syms"))
    merges.foreach { p =>
      wsyms = wsyms.withColumn("syms",
        expr(s"replace(syms, ' $p ', ' ${p.replace(" ", "")} ')"))
    }
    val wcount = wsyms.select(col("w"),
      size(split(trim(col("syms")), " ")).as("n"))
    occurrences.join(wcount, "w")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n")).cast("bigint").as("n_tokens"))
  }

  /** The END-TO-END training-data keep/drop filter — the query the whole
    * pipeline exists for: a document survives iff it is (a) the
    * canonical copy of its normalized-text hash group (exact dedup),
    * (b) quality_score ≥ 2, and (c) its predicted language matches its
    * label. Composes the dedup, quality, and language stages as three
    * map-only scans + one hash-group join — no stage sees another's full
    * output, so the composition scales exactly like its parts.
    */
  def pipelineKeptDocs(s: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), TokenSep, " "))
    val hashed = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), md5(norm).as("h"))
    val canon = hashed.groupBy("h").agg(min(col("doc_id")).as("canonical_id"))
    val quality = textStats(s, dir).select(col("doc_id"), col("quality_score"))
    hashed.join(canon, "h")
      .filter(col("doc_id") === col("canonical_id"))
      .join(quality, "doc_id")
      .filter(col("quality_score") >= 2)
      .join(langPred(s, dir).select(col("doc_id"),
        col("pred_lang")), "doc_id")
      .filter(col("pred_lang") === col("lang"))
      .select(col("doc_id"), col("lang"), col("quality_score"))
  }

  /** Within-document repetition score: positional word 3-grams counted
    * against distinct 3-grams, per document. High duplication (boiler-
    * plate, scraper loops, degenerate generations) is a standard
    * training-data drop signal. One map-only pass — both counts come out
    * of a single per-doc hash set in the kernel, so the query is pure
    * scan throughput with ZERO shuffle at any scale; only documents with
    * internal repetition are emitted.
    */
  def docRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        split(trim(regexp_replace(lower(col("text")), TokenSep, " ")), " ")
          .as("t"))
      .filter(size(col("t")) >= 3)
      .as[(Long, Array[String])]
      .map { case (id, toks) =>
        val seen = new java.util.HashSet[String]()
        var n = 0L; var nd = 0L; var i = 0
        while (i < toks.length - 2) {
          if (seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)))
            nd += 1
          n += 1
          i += 1
        }
        (id, n, nd)
      }
      .toDF("doc_id", "n_grams", "n_distinct")
      .filter(col("n_grams") > col("n_distinct"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_grams"))
          .as("distinct_ratio"))
  }

  /** The source treated as the held-out benchmark for the contamination
    * check — any doc from every OTHER source sharing a 4-gram with this
    * set is flagged.
    */
  private val EvalSource = "src0"

  /** Benchmark-contamination check: for every training document, the
    * fraction of its distinct word 4-grams that appear anywhere in the
    * eval set ([[EvalSource]]) — the standard n-gram decontamination
    * pass run before training. Scale shape: eval sets are small by
    * nature, so their gram set is BROADCAST (no shuffle of the 100 TB
    * side); per-doc distinct grams are computed inside the flatMap
    * kernel (map-side, no (doc, gram) dedup shuffle); the final
    * groupBy(doc_id) partial-aggregates rows that are already
    * doc-contiguous, so the one real shuffle carries one row per doc.
    */
  def contaminationNgram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def docGrams(of: DataFrame): DataFrame = of
      .select(col("doc_id"),
        split(trim(regexp_replace(lower(col("text")), TokenSep, " ")), " ")
          .as("t"))
      .filter(size(col("t")) >= 4)
      .as[(Long, Array[String])]
      .flatMap { case (id, toks) =>
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        var i = 0
        while (i < toks.length - 3) {
          seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2) + " " +
            toks(i + 3))
          i += 1
        }
        seen.iterator.map(g => (id, g))
      }
      .toDF("doc_id", "g")
    val docs = Tables.documents(s, dir)
    val evalGrams = docGrams(docs.filter(col("source") === EvalSource))
      .select(col("g")).distinct().withColumn("hit", lit(1))
    docGrams(docs.filter(col("source") =!= EvalSource))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .filter(col("n_hit") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_grams")).as("contamination"))
  }

  /** BM25 constants (k1=1.2, b=0.75) and a fixed corpus query. */
  private val Bm25Terms = Seq("hash", "join", "vector")
  private val Bm25K = 10

  /** RANKED RETRIEVAL: top-10 documents for a term query under a
    * BM25-family score — the "find training docs like this" primitive.
    * Deterministic variant: the classic `ln`-based idf is replaced by
    * its log-free rational core `(N - df + 0.5) / (df + 0.5)` (a
    * monotone transform of it), because `ln` is not guaranteed
    * correctly-rounded and would differ in the last ulp across engines.
    * Every per-(doc,term) contribution is a fixed IEEE expression over
    * exact integer inputs (tf, df, dl, N) quantized to a 1e-6 BIGINT;
    * the per-doc score is then an order-independent integer sum — fully
    * hash-verifiable.
    *
    * Plan at 100 TB: one explode of the (pruned) token arrays filtered
    * to the query terms BEFORE the shuffle (so only matching (doc,term)
    * rows move), df and corpus stats are broadcast scalars, and the
    * final top-k is TakeOrderedAndProject (per-partition heap, k-row
    * driver merge — never a global sort).
    */
  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), lowToks(col("text")).as("toks"))
    // narrow (doc_id, dl) checkpointed: corpus-stats agg and the scoring
    // join both read these 16 bytes/doc instead of re-tokenizing the
    // corpus (2 scans total — tf and dl — not 3)
    val dls = toks.select(col("doc_id"), size(col("toks")).as("dl"))
      .sharedCheckpoint()
    val stats = dls.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(Bm25Terms))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfs), "term")
      .join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("tfc",
        col("tf").cast("double") * lit(2.2) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) +
              lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
      .withColumn("contrib",
        round(col("idf") * col("tfc") * lit(1000000.0)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
           sum(col("contrib")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
      .limit(Bm25K)
  }

  /** Count-min sketch shape: 4 hash rows x 256 counters. */
  private val CmsRows = 4
  private val CmsWidth = 256
  private val CmsTopK = 20

  /** COUNT-MIN SKETCH heavy hitters over document words — the
    * point-query counting sketch next to the KMV distinct sketch
    * (`sketch_distinct_users`): word frequencies are folded into a
    * 4×256 counter grid (hash family = md5 of `row:word`, pinned, so
    * both engines bucket identically), and a word's estimate is the min
    * of its 4 counters — ≥ the true count by construction, equal when
    * no collision survives the min. The report lists the true top-20
    * words with exact and estimated counts side by side, so the oracle
    * hash pins the whole sketch content.
    *
    * At 100 TB: the counter grid is 1024 rows built by partial-agg from
    * per-word counts (the raw corpus never shuffles), candidates come
    * from TakeOrderedAndProject, and point estimates are a broadcast
    * join against the tiny grid — the sketch answers "how often is
    * word w" without retaining the unbounded word table.
    */
  def sketchHeavyWords(s: SparkSession, dir: String): DataFrame = {
    val wcounts = Tables.documents(s, dir)
      .select(explode(lowToks(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .sharedCheckpoint() // feeds grid, candidates, and the estimate join
    val rows = (0 until CmsRows).map(lit(_))
    val hashed = wcounts
      .select(col("word"), col("cnt"), explode(array(rows: _*)).as("r"))
      .withColumn("c",
        conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col("word"))), 1, 8), 16, 10).cast("long") % CmsWidth)
    val grid = hashed.groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("counter"))
    val top = wcounts.orderBy(col("cnt").desc, col("word")).limit(CmsTopK)
    hashed.join(broadcast(top.select(col("word"))), "word")
      .join(broadcast(grid), Seq("r", "c"))
      .groupBy(col("word"))
      .agg(min(col("counter")).as("cms_est"))
      .join(broadcast(top), "word")
      .select(col("word"), col("cnt").as("exact_cnt"), col("cms_est"))
  }

  private val EmailRe = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
  private val PhoneRe = "\\d{3}-\\d{4}"

  /** PII detection + redaction — the scrub pass a pretraining corpus
    * runs before tokenization: find emails/phone numbers, count them,
    * and measure what redaction removes. The harness corpus contains no
    * natural PII, so every 11th document gets a deterministic synthetic
    * email + phone appended first (the `source_json_corrupt` trick: the
    * INJECTION is part of the query and the oracle recomputes the
    * expectation from the clean table, so the detection and redaction
    * behavior is itself what's verified — a missed or over-eager match
    * hash-mismatches). Map-only regex passes (codegen'd builtins) until
    * the final per-source rollup: at 100 TB this is pure scan
    * throughput, the right shape for a scrub stage. Both regexes stay
    * in the ASCII subset where Java and RE2 semantics coincide.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val injected = when(col("doc_id") % 11 === 0,
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"),
        lit("@mail.example.com or call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text"))
    val scrubbed = regexp_replace(
      regexp_replace(col("text2"), EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), injected.as("text2"))
      .select(col("source"),
        length(col("text2")).as("len_raw"),
        size(regexp_extract_all(col("text2"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text2"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        length(scrubbed).as("len_scrubbed"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("n_emails") + col("n_phones") > 0, 1L)
             .otherwise(0L)).as("n_pii_docs"),
           sum(col("n_emails")).as("n_emails"),
           sum(col("n_phones")).as("n_phones"),
           sum((col("len_raw") - col("len_scrubbed")).cast("long"))
             .as("chars_redacted"))
  }

  /** Corpus-mixing allocation: split a fixed training-token budget
    * (1M here) across sources proportionally to their token mass using
    * the LARGEST-REMAINDER (Hamilton) method, entirely in exact integer
    * arithmetic: floor(B·nᵢ/N) per source, then one extra token to the
    * (B − Σfloor) largest remainders, ties broken by source name —
    * Σalloc == B exactly, bit-identical in both engines. Wide products
    * ride decimal(38,0) (HUGEINT in the oracle): at 100 TB, B·nᵢ
    * overflows a long. Shape: one narrow scan + per-source aggregate;
    * the unpartitioned windows are safe BECAUSE they run
    * post-aggregation over ≤ dozens of source rows at any data scale.
    */
  def corpusMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bpe = "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"
    val all = Window.partitionBy(lit(1))
    Tables.documents(s, dir)
      .select(col("source"),
        size(regexp_extract_all(col("text"), lit(bpe), lit(0)))
          .cast("long").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("total", sum(col("n_tokens")).over(all))
      .withColumn("prod",
        expr("CAST(1000000 AS DECIMAL(38,0)) * CAST(n_tokens AS DECIMAL(38,0))"))
      .withColumn("floor_alloc",
        expr("CAST(prod div CAST(total AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("rem", expr("prod % CAST(total AS DECIMAL(38,0))"))
      .withColumn("deficit", lit(1000000L) - sum(col("floor_alloc")).over(all))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("source"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("floor_alloc") +
          when(col("rnk") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /** Vocabulary-coverage audit: build the top-[[VocabSize]] token
    * vocabulary by global frequency (ties broken lexicographically, so
    * the cut is total-ordered and deterministic in both engines), then
    * measure each source's out-of-vocabulary token rate — the standard
    * "how much of this corpus does my tokenizer's vocab cover" check
    * before committing to a training mix.
    *
    * Scale: token explode is narrow; the vocab is a groupBy(token)
    * aggregate (bounded by vocabulary size, not corpus size) topped by
    * `TakeOrderedAndProject` (per-partition top-k, never a global sort),
    * and the OOV probe is a broadcast LEFT ANTI join against that
    * constant-sized vocab — the corpus-sized side never shuffles on
    * token.
    */
  private val VocabSize = 16
  def vocabOovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(VocabSize)
      .select("tok")
    val perSrc = toks.groupBy("source").agg(count(lit(1)).as("n_tokens"))
    val oov = toks.join(broadcast(vocab), Seq("tok"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_oov"))
    perSrc.join(oov, Seq("source"), "left")
      .select(col("source"), col("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        (coalesce(col("n_oov"), lit(0L)).cast("double") / col("n_tokens"))
          .as("oov_rate"))
  }

  /** Equi-depth length histogram without a global sort: pass 1 computes
    * the 7 octile boundaries of `n_chars` in ONE grouping-free aggregate
    * (Spark's exact interpolated `percentile`; fractions k/8 are dyadic,
    * so `lo + (hi−lo)·frac` over integer lengths is exactly
    * representable and bit-identical to DuckDB's `quantile_cont` — the
    * `percentile_brand_prices` determinism argument, see
    * OlapQueries.scala), pass 2 broadcasts that 1-row boundary array and
    * bins every document with a strict `boundary < n_chars` count. The
    * naive equi-depth shape — `ntile(8) OVER (ORDER BY n_chars)` — is a
    * corpus-sized unpartitioned window, exactly what PlanLintSpec
    * forbids; this two-scan form keeps both passes full-parallel at any
    * corpus size (the percentile buffer is bounded by DISTINCT lengths,
    * not rows).
    */
  def lengthOctiles(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("n_chars"))
    val bounds = docs.agg(percentile(col("n_chars"),
      lit((1 to 7).map(_ / 8.0).toArray)).as("qs"))
    docs.crossJoin(broadcast(bounds))
      .withColumn("bin",
        size(filter(col("qs"), q => q < col("n_chars").cast("double")))
          .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
           min("n_chars").as("min_chars"),
           max("n_chars").as("max_chars"))
  }

  /** The MONITORING plane: `Dataset.observe` rides data-quality
    * metrics (row count, null-language count, exact char sum, id
    * bounds) on the SAME single scan that computes the real
    * per-source aggregate — zero extra passes, the production
    * pattern for pipeline health checks (Spark's `CollectMetrics`
    * node; Delta Live Tables' expectations are this shape). The
    * metrics surface through `queryExecution.observedMetrics` after
    * the action and are appended to every output row, so the oracle
    * verifies BOTH planes — a metric that drifted from the data
    * (dropped rows, a second scan seeing different state) would
    * hash-mismatch. The collect is bounded by source cardinality
    * (the per-source aggregate's own output), not data size.
    */
  def observeScanMetrics(s: SparkSession, dir: String): DataFrame = {
    val observed = Tables.documents(s, dir)
      .observe("scan_quality",
        count(lit(1)).as("n_docs"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
        sum(col("n_chars").cast("decimal(30,0)")).cast("long")
          .as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
    val perSource = observed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_source"),
        sum(col("n_chars").cast("decimal(30,0)")).cast("long")
          .as("chars_source"))
    val rows = perSource.collect() // the one action; observe rides it
    val m = perSource.queryExecution.observedMetrics("scan_quality")
    s.createDataFrame(java.util.Arrays.asList(rows: _*), perSource.schema)
      .withColumn("n_docs", lit(m.getAs[Long]("n_docs")))
      .withColumn("n_null_lang", lit(m.getAs[Long]("n_null_lang")))
      .withColumn("sum_chars", lit(m.getAs[Long]("sum_chars")))
      .withColumn("min_doc", lit(m.getAs[Long]("min_doc")))
      .withColumn("max_doc", lit(m.getAs[Long]("max_doc")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "observe_scan_metrics" -> observeScanMetrics _,
    "vocab_oov_rate" -> vocabOovRate _,
    "length_octiles" -> lengthOctiles _,
    "corpus_mix"     -> corpusMix _,
    "pii_scrub"      -> piiScrub _,
    "sketch_heavy_words" -> sketchHeavyWords _,
    "text_stats"     -> textStats _,
    "lang_id"        -> langId _,
    "token_count"    -> tokenCount _,
    "doc_term_stats" -> docTermStats _,
    "ngram_freq"     -> ngramFreq _,
    "doc_repetition" -> docRepetition _,
    "contamination_ngram" -> contaminationNgram _,
    "doc_lm_score"   -> docLmScore _,
    "bpe_merges"     -> bpeMerges _,
    "bpe_encode"     -> bpeEncode _,
    "bm25_search"    -> bm25Search _,
    "pipeline_kept_docs" -> pipelineKeptDocs _)

  private[operators] lazy val textStatsSql =
    s"""WITH d AS (
         |  SELECT doc_id, length(text) AS len,
         |    len(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
         |        t -> t <> '')) AS n_toks,
         |    len(string_split_regex(trim(text), '\\s+')) AS n_ws_toks,
         |    length(text) - length(regexp_replace(text,
         |        '[\\p{L}\\p{N}\\s]', '', 'g')) AS n_punct,
         |    len(list_filter(
         |        list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'),
         |                    t -> t <> ''),
         |        t -> t IN (${StopEn.map(w => s"'$w'").mkString(", ")})))
         |      AS n_stop
         |  FROM documents)
         |SELECT doc_id, CAST(len AS BIGINT) AS n_chars,
         |  CAST(n_toks AS BIGINT) AS n_tokens,
         |  CAST(n_ws_toks AS BIGINT) AS n_ws_tokens,
         |  CAST(len AS DOUBLE) / n_toks AS avg_tok_len,
         |  CAST(n_punct AS DOUBLE) / len AS punct_ratio,
         |  CAST(n_stop AS DOUBLE) / n_toks AS stopword_ratio,
         |  CAST((CASE WHEN CAST(len AS DOUBLE) / n_toks >= 3.0
         |              AND CAST(len AS DOUBLE) / n_toks <= 12.0
         |             THEN 1 ELSE 0 END) +
         |       (CASE WHEN n_toks >= 20 THEN 1 ELSE 0 END) +
         |       (CASE WHEN CAST(n_punct AS DOUBLE) / len < 0.2
         |             THEN 1 ELSE 0 END) AS BIGINT) AS quality_score
         |FROM d""".stripMargin

  val oracles: Map[String, String] = Map(
    "observe_scan_metrics" ->
      """WITH g AS (
        |  SELECT COUNT(*) AS n_docs,
        |    COUNT(*) FILTER (WHERE lang IS NULL) AS n_null_lang,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |    MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |  FROM documents)
        |SELECT d.source, COUNT(*) AS n_docs_source,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS chars_source,
        |  g.n_docs, g.n_null_lang, g.sum_chars, g.min_doc, g.max_doc
        |FROM documents d, g
        |GROUP BY d.source, g.n_docs, g.n_null_lang, g.sum_chars,
        |  g.min_doc, g.max_doc""".stripMargin,
    "vocab_oov_rate" ->
      raw"""WITH toks AS (
           |  SELECT source,
           |    unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS tok
           |  FROM documents),
           |t AS (SELECT source, tok FROM toks WHERE tok <> ''),
           |vocab AS (
           |  SELECT tok FROM (
           |    SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok)
           |  ORDER BY freq DESC, tok LIMIT 16),
           |tot AS (SELECT source, COUNT(*) AS n_tokens FROM t
           |        GROUP BY source),
           |oov AS (SELECT source, COUNT(*) AS n_oov FROM t
           |        WHERE tok NOT IN (SELECT tok FROM vocab)
           |        GROUP BY source)
           |SELECT tot.source, tot.n_tokens,
           |  COALESCE(oov.n_oov, 0) AS n_oov,
           |  CAST(COALESCE(oov.n_oov, 0) AS DOUBLE) / tot.n_tokens
           |    AS oov_rate
           |FROM tot LEFT JOIN oov ON tot.source = oov.source""".stripMargin,
    "length_octiles" ->
      """WITH qs AS (
        |  SELECT [quantile_cont(n_chars, 0.125),
        |          quantile_cont(n_chars, 0.25),
        |          quantile_cont(n_chars, 0.375),
        |          quantile_cont(n_chars, 0.5),
        |          quantile_cont(n_chars, 0.625),
        |          quantile_cont(n_chars, 0.75),
        |          quantile_cont(n_chars, 0.875)] AS qs
        |  FROM documents)
        |SELECT CAST(len(list_filter(qs.qs, x -> x < d.n_chars)) AS BIGINT)
        |    AS bin,
        |  COUNT(*) AS n_docs, MIN(d.n_chars) AS min_chars,
        |  MAX(d.n_chars) AS max_chars
        |FROM documents d, qs GROUP BY 1""".stripMargin,
    "corpus_mix" ->
      raw"""WITH t AS (
           |  SELECT source, COUNT(*) AS n_docs,
           |    CAST(SUM(len(regexp_extract_all(text,
           |        '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]'))) AS BIGINT)
           |      AS n_tokens
           |  FROM documents GROUP BY source),
           |a AS (
           |  SELECT source, n_docs, n_tokens,
           |    CAST(1000000 AS HUGEINT) * CAST(n_tokens AS HUGEINT) AS prod,
           |    SUM(CAST(n_tokens AS HUGEINT)) OVER () AS total
           |  FROM t),
           |b AS (
           |  SELECT source, n_docs, n_tokens,
           |    CAST(prod // total AS BIGINT) AS floor_alloc,
           |    prod % total AS rem
           |  FROM a),
           |c AS (
           |  SELECT *, 1000000 - SUM(floor_alloc) OVER () AS deficit,
           |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk
           |  FROM b)
           |SELECT source, n_docs, n_tokens,
           |  CAST(floor_alloc + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END
           |    AS BIGINT) AS alloc_tokens
           |FROM c""".stripMargin,
    "pii_scrub" ->
      raw"""WITH inj AS (
           |  SELECT doc_id, source,
           |    CASE WHEN doc_id % 11 = 0 THEN
           |      text || ' contact user' || CAST(doc_id AS VARCHAR)
           |        || '@mail.example.com or call 555-'
           |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |    ELSE text END AS text2
           |  FROM documents),
           |f AS (
           |  SELECT source, length(text2) AS len_raw,
           |    len(regexp_extract_all(text2,
           |        '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+')) AS n_emails,
           |    len(regexp_extract_all(text2, '\d{3}-\d{4}')) AS n_phones,
           |    length(regexp_replace(regexp_replace(text2,
           |        '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
           |        '\d{3}-\d{4}', '<PHONE>', 'g')) AS len_scrubbed
           |  FROM inj)
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_pii_docs,
           |  CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           |  CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           |  CAST(SUM(len_raw - len_scrubbed) AS BIGINT) AS chars_redacted
           |FROM f GROUP BY source""".stripMargin,
    "sketch_heavy_words" ->
      raw"""WITH wc AS (
           |  SELECT word, count(*) AS cnt FROM (
           |    SELECT unnest(list_filter(
           |      regexp_split_to_array(lower(text), '[^\p{L}]+'),
           |      t -> t <> '')) AS word
           |    FROM documents)
           |  GROUP BY word),
           |hashed AS (
           |  SELECT word, cnt, r,
           |    CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || word),
           |                        1, 8) AS BIGINT) % 256 AS c
           |  FROM wc, unnest(generate_series(0, 3)) AS g(r)),
           |grid AS (
           |  SELECT r, c, CAST(sum(cnt) AS BIGINT) AS counter
           |  FROM hashed GROUP BY r, c),
           |top AS (SELECT word, cnt FROM wc
           |        ORDER BY cnt DESC, word LIMIT 20)
           |SELECT h.word, max(t.cnt) AS exact_cnt,
           |  CAST(min(g.counter) AS BIGINT) AS cms_est
           |FROM hashed h
           |JOIN top t USING (word)
           |JOIN grid g ON g.r = h.r AND g.c = h.c
           |GROUP BY h.word""".stripMargin,
    "bm25_search" ->
      raw"""WITH toks AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
           |                t -> t <> '') AS toks
           |  FROM documents),
           |dls AS (SELECT doc_id, len(toks) AS dl FROM toks),
           |stats AS (SELECT count(*) AS n_docs,
           |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls),
           |tf AS (
           |  SELECT doc_id, term, count(*) AS tf
           |  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
           |  WHERE term IN ('hash', 'join', 'vector')
           |  GROUP BY doc_id, term),
           |dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           |scored AS (
           |  SELECT tf.doc_id,
           |    CAST(round(
           |      ((CAST(n_docs - df AS DOUBLE) + 0.5) /
           |        (CAST(df AS DOUBLE) + 0.5)) *
           |      ((CAST(tf AS DOUBLE) * 2.2) /
           |        (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
           |          (CAST(dl AS DOUBLE) /
           |            (CAST(sum_dl AS DOUBLE) / n_docs))))) *
           |      1000000.0) AS BIGINT) AS contrib
           |  FROM tf JOIN dfs USING (term) JOIN dls USING (doc_id),
           |       stats)
           |SELECT doc_id, count(*) AS n_terms,
           |  CAST(sum(contrib) AS BIGINT) AS score_scaled
           |FROM scored GROUP BY doc_id
           |ORDER BY score_scaled DESC, doc_id LIMIT 10""".stripMargin,
    "doc_repetition" ->
      raw"""WITH toks AS (
           |  SELECT doc_id,
           |    string_split(trim(regexp_replace(lower(text),
           |        '[^\p{L}]+', ' ', 'g')), ' ') AS t
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, t[i]||' '||t[i+1]||' '||t[i+2] AS g
           |  FROM toks, unnest(generate_series(1, len(t)-2)) AS u(i)
           |  WHERE len(t) >= 3),
           |per AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           |    CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct
           |  FROM g GROUP BY doc_id)
           |SELECT doc_id, n_grams, n_distinct,
           |  CAST(n_distinct AS DOUBLE) / n_grams AS distinct_ratio
           |FROM per WHERE n_grams > n_distinct""".stripMargin,
    "bpe_merges" ->
      raw"""WITH toks AS (
           |  SELECT unnest(list_filter(
           |    regexp_split_to_array(lower(text), '[^\p{L}]+'),
           |    t -> t <> '')) AS w
           |  FROM documents),
           |vocab AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
           |v0 AS (
           |  SELECT ' ' || array_to_string(regexp_split_to_array(w, ''),
           |    ' ') || ' ' AS syms, freq
           |  FROM vocab),
           |p1 AS (
           |  SELECT t[i] || ' ' || t[i+1] AS p,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(trim(syms), ' ') AS t, freq FROM v0),
           |    unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2 GROUP BY 1),
           |b1 AS (SELECT p, cnt FROM p1 ORDER BY cnt DESC, p LIMIT 1),
           |v1 AS (
           |  SELECT replace(syms, ' ' || (SELECT p FROM b1) || ' ',
           |    ' ' || replace((SELECT p FROM b1), ' ', '') || ' ') AS syms,
           |    freq
           |  FROM v0),
           |p2 AS (
           |  SELECT t[i] || ' ' || t[i+1] AS p,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(trim(syms), ' ') AS t, freq FROM v1),
           |    unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2 GROUP BY 1),
           |b2 AS (SELECT p, cnt FROM p2 ORDER BY cnt DESC, p LIMIT 1),
           |v2 AS (
           |  SELECT replace(syms, ' ' || (SELECT p FROM b2) || ' ',
           |    ' ' || replace((SELECT p FROM b2), ' ', '') || ' ') AS syms,
           |    freq
           |  FROM v1),
           |p3 AS (
           |  SELECT t[i] || ' ' || t[i+1] AS p,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(trim(syms), ' ') AS t, freq FROM v2),
           |    unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2 GROUP BY 1),
           |b3 AS (SELECT p, cnt FROM p3 ORDER BY cnt DESC, p LIMIT 1)
           |SELECT 1 AS rank, p AS pair, cnt FROM b1
           |UNION ALL SELECT 2, p, cnt FROM b2
           |UNION ALL SELECT 3, p, cnt FROM b3""".stripMargin,
    "bpe_encode" ->
      raw"""WITH toks AS (
           |  SELECT source, unnest(list_filter(
           |    regexp_split_to_array(lower(text), '[^\p{L}]+'),
           |    t -> t <> '')) AS w
           |  FROM documents),
           |vocab AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
           |v0 AS (
           |  SELECT ' ' || array_to_string(regexp_split_to_array(w, ''),
           |    ' ') || ' ' AS syms, freq
           |  FROM vocab),
           |p1 AS (
           |  SELECT t[i] || ' ' || t[i+1] AS p,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(trim(syms), ' ') AS t, freq FROM v0),
           |    unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2 GROUP BY 1),
           |b1 AS (SELECT p, cnt FROM p1 ORDER BY cnt DESC, p LIMIT 1),
           |v1 AS (
           |  SELECT replace(syms, ' ' || (SELECT p FROM b1) || ' ',
           |    ' ' || replace((SELECT p FROM b1), ' ', '') || ' ') AS syms,
           |    freq
           |  FROM v0),
           |p2 AS (
           |  SELECT t[i] || ' ' || t[i+1] AS p,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(trim(syms), ' ') AS t, freq FROM v1),
           |    unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2 GROUP BY 1),
           |b2 AS (SELECT p, cnt FROM p2 ORDER BY cnt DESC, p LIMIT 1),
           |v2 AS (
           |  SELECT replace(syms, ' ' || (SELECT p FROM b2) || ' ',
           |    ' ' || replace((SELECT p FROM b2), ' ', '') || ' ') AS syms,
           |    freq
           |  FROM v1),
           |p3 AS (
           |  SELECT t[i] || ' ' || t[i+1] AS p,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(trim(syms), ' ') AS t, freq FROM v2),
           |    unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2 GROUP BY 1),
           |b3 AS (SELECT p, cnt FROM p3 ORDER BY cnt DESC, p LIMIT 1),
           |wsyms0 AS (
           |  SELECT w, ' ' || array_to_string(regexp_split_to_array(w, ''),
           |    ' ') || ' ' AS syms
           |  FROM (SELECT DISTINCT w FROM toks)),
           |e1 AS (
           |  SELECT w, replace(syms, ' ' || (SELECT p FROM b1) || ' ',
           |    ' ' || replace((SELECT p FROM b1), ' ', '') || ' ') AS syms
           |  FROM wsyms0),
           |e2 AS (
           |  SELECT w, replace(syms, ' ' || (SELECT p FROM b2) || ' ',
           |    ' ' || replace((SELECT p FROM b2), ' ', '') || ' ') AS syms
           |  FROM e1),
           |e3 AS (
           |  SELECT w, replace(syms, ' ' || (SELECT p FROM b3) || ' ',
           |    ' ' || replace((SELECT p FROM b3), ' ', '') || ' ') AS syms
           |  FROM e2),
           |wc AS (
           |  SELECT w, len(string_split(trim(syms), ' ')) AS n FROM e3)
           |SELECT source, COUNT(*) AS n_words,
           |  CAST(SUM(n) AS BIGINT) AS n_tokens
           |FROM toks JOIN wc USING (w)
           |GROUP BY source""".stripMargin,
    "doc_lm_score" ->
      raw"""WITH toks AS (
           |  SELECT doc_id,
           |    string_split(trim(regexp_replace(lower(text),
           |        '[^\p{L}]+', ' ', 'g')), ' ') AS t
           |  FROM documents),
           |bg AS (
           |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
           |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2),
           |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
           |uni AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
           |        FROM big GROUP BY 1),
           |model AS (
           |  SELECT b.w1, b.w2,
           |    CAST(floor(1e6 * b.c12 / u.c1) AS BIGINT) AS ppm
           |  FROM big b JOIN uni u ON b.w1 = u.w1),
           |per AS (
           |  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           |    CAST(SUM(m.ppm) AS BIGINT) AS ppm_sum
           |  FROM bg g JOIN model m ON g.w1 = m.w1 AND g.w2 = m.w2
           |  GROUP BY 1)
           |SELECT doc_id, n_bigrams,
           |  CAST(floor(ppm_sum / n_bigrams) AS BIGINT) AS avg_ppm
           |FROM per ORDER BY avg_ppm ASC, doc_id LIMIT 20""".stripMargin,
    "contamination_ngram" ->
      raw"""WITH toks AS (
           |  SELECT doc_id, source,
           |    string_split(trim(regexp_replace(lower(text),
           |        '[^\p{L}]+', ' ', 'g')), ' ') AS t
           |  FROM documents),
           |sh AS (
           |  SELECT DISTINCT doc_id, source,
           |    t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3] AS g
           |  FROM toks, unnest(generate_series(1, len(t)-3)) AS u(i)
           |  WHERE len(t) >= 4),
           |eval_g AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'),
           |per AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           |    CAST(COUNT(*) FILTER (WHERE g IN (SELECT g FROM eval_g))
           |         AS BIGINT) AS n_hit
           |  FROM sh WHERE source <> 'src0' GROUP BY doc_id)
           |SELECT doc_id, n_grams, n_hit,
           |  CAST(n_hit AS DOUBLE) / n_grams AS contamination
           |FROM per WHERE n_hit > 0""".stripMargin,
    "text_stats" -> textStatsSql,
    "pipeline_kept_docs" ->
      s"""WITH $langPredSql,
         |hashed AS (
         |  SELECT doc_id, lang,
         |    md5(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')))
         |      AS h
         |  FROM documents),
         |canon AS (SELECT h, MIN(doc_id) AS canonical_id
         |          FROM hashed GROUP BY h),
         |quality AS (SELECT doc_id, quality_score FROM ($textStatsSql))
         |SELECT d.doc_id, d.lang, q.quality_score
         |FROM hashed d
         |JOIN canon c ON d.h = c.h AND d.doc_id = c.canonical_id
         |JOIN quality q ON q.doc_id = d.doc_id
         |JOIN lang_pred p ON p.doc_id = d.doc_id
         |WHERE q.quality_score >= 2 AND p.pred_lang = d.lang""".stripMargin,
    "lang_id" ->
      s"""WITH $langPredSql
         |SELECT lang, pred_lang, COUNT(*) AS n_docs
         |FROM lang_pred GROUP BY 1, 2""".stripMargin,
    "doc_term_stats" ->
      raw"""WITH tf AS (
           |  SELECT term, doc_id, COUNT(*) AS tf
           |  FROM (SELECT doc_id,
           |          unnest(regexp_split_to_array(lower(text), '[^\p{L}]+'))
           |            AS term
           |        FROM documents)
           |  WHERE term <> ''
           |  GROUP BY term, doc_id)
           |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
           |FROM tf GROUP BY term
           |ORDER BY df DESC, term LIMIT 50""".stripMargin,
    "ngram_freq" ->
      raw"""WITH toks AS (
           |  SELECT string_split(trim(regexp_replace(lower(text),
           |    '[^\p{L}]+', ' ', 'g')), ' ') AS t
           |  FROM documents),
           |bg AS (
           |  SELECT t[i] || ' ' || t[i+1] AS bigram
           |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
           |  WHERE len(t) >= 2)
           |SELECT bigram, COUNT(*) AS cnt FROM bg
           |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin,
    "token_count" ->
      raw"""SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           |    AS n_ws_tokens,
           |  CAST(SUM(len(regexp_extract_all(text,
           |      '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]'))) AS BIGINT)
           |    AS n_bpe_tokens
           |FROM documents GROUP BY source""".stripMargin)
}
