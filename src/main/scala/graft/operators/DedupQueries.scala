package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions._

/** Deduplication operators over the `documents` table — the LLM-training-
  * pipeline surface (exact dedup, MinHash+LSH near-dup, SimHash, n-gram
  * Jaccard verification, winnowing fingerprints).
  *
  * Cross-engine determinism: every hash in this module is `md5` of an
  * explicitly-constructed string — Spark and DuckDB produce identical hex,
  * so MinHash signatures, LSH buckets, and SimHash bits are bit-identical
  * in both engines and each query is fully value-hash verifiable (no
  * "probabilistic so unverifiable" cop-out: the randomness is in the hash
  * family, and the hash family is pinned).
  *
  * Scale notes (the 100 TB design points):
  *   - The shingle→doc inverted lists drive both MinHash and Jaccard; the
  *     only shuffles are groupBy(doc) for signatures and groupBy(shingle)
  *     / groupBy(pair) for the join — all keyed aggregations with partial
  *     aggregation. No crossJoin anywhere: candidate pairs come from
  *     shared LSH buckets / shared shingles only.
  *   - Stop-shingles (document frequency > maxDF) are dropped before the
  *     pair join — the standard skew guard: a shingle shared by f docs
  *     contributes O(f²) pairs, so frequency-capping bounds the blow-up
  *     and removes exactly the shingles that carry no dedup signal.
  *   - MinHash signature width is 16 (4 bands × 4 rows) — per-doc state
  *     is 16 aggregating mins, O(1) memory per key regardless of doc size.
  */
object DedupQueries {

  private val NumHashes = 16
  private val BandRows  = 4
  private val NumBands  = NumHashes / BandRows
  /** Stop-shingle cap: shingles present in more docs carry no signal. */
  private val MaxDF = 100L

  /** Normalized text: lowercased, non-letter runs collapsed to single
    * spaces, trimmed — so trivial punctuation/case edits hash equal.
    * DuckDB twin: `trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g'))`.
    */
  private def normText(c: Column): Column =
    trim(regexp_replace(lower(c), TokenSep, " "))

  private val normSql =
    raw"trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g'))"

  /** 3-token shingles of the normalized text; `docShingles` is the shared
    * front end of minhash / jaccard. `dedup=false` skips the distinct
    * shuffle for consumers whose aggregation is duplicate-insensitive
    * (minhash: min over a larger multiset is unchanged).
    */
  private def docShingles(s: SparkSession, dir: String,
                          dedup: Boolean = true): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), split(normText(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val sh = toks.select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - 3), i =>
          concat_ws(" ", element_at(col("t"), i + 1),
            element_at(col("t"), i + 2), element_at(col("t"), i + 3))))
          .as("shingle"))
    if (dedup) sh.distinct() else sh
  }

  private val shinglesSql =
    raw"""WITH toks AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS t
         |  FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
         |  FROM toks, unnest(generate_series(1, len(t)-2)) AS u(i))""".stripMargin

  /** Exact dedup: group identical normalized texts by md5, keep the
    * smallest doc_id as canonical. One groupBy on a 32-byte key — at
    * 100 TB this is the cheapest possible full-corpus dedup (the text
    * itself never shuffles, only its hash).
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(md5(normText(col("text"))).as("text_hash"), col("doc_id"))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("canonical_id"),
           count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-dup candidates.
    *
    * Pipeline: shingles → 16 md5-min signatures per doc → 4 bands of 4 →
    * band-bucket join → candidate pairs with the number of agreeing bands.
    * The per-(doc,hash) min is a single conditional-aggregation pass (16
    * `min(when(h=i))` columns), so the signature stage is one shuffle of
    * the shingle set, and the pair stage shuffles only bucket ids.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(s, dir, dedup = false)
    // 16 min-hashes as 16 aggregation columns over the shingle rows —
    // no explode-by-hash-id, so the shuffle moves |shingles| rows (with
    // map-side partial mins), not 16×|shingles|. md5 dominates the cost
    // (measured), so each shingle computes only NumBands md5s, carved
    // into four 8-hex-char (32-bit) windows each: hash h = window h%4 of
    // md5 "(h/4):shingle". Fixed-width lowercase hex ⇒ lexicographic min
    // == numeric min, so no hex→int conversion is needed (conv() costs
    // more than it saves — also measured).
    val seeded = sh.select(Seq(col("doc_id")) ++ (0 until NumBands).map(j =>
      md5(concat(lit(s"$j:"), col("shingle"))).as(s"h$j")): _*)
    val sigCols = (0 until NumHashes).map { i =>
      val (j, w) = (i / 4, i % 4)
      min(substring(col(s"h$j"), w * 8 + 1, 8)).as(s"m$i")
    }
    val sig = seeded.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bands = sig.select(col("doc_id"),
      explode(array((0 until NumBands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|",
            (0 until BandRows).map(r => col(s"m${b * BandRows + r}")): _*))
            .as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** SimHash: 32-bit fingerprint from the top bit of each md5 nibble of
    * each distinct token, majority-voted. One groupBy(doc) with 32
    * conditional sums — fully codegen'd, no explode by bit position.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(normText(col("text")))).as("tok"))
      .distinct()
      .select(col("doc_id"), md5(col("tok")).as("th"))
    val sumCols = (1 to 32).map(i =>
      sum(when(substring(col("th"), i, 1) >= "8", 1).otherwise(-1))
        .as(s"s$i"))
    val sums = tok.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
    sums.select(col("doc_id"),
      concat((1 to 32).map(i =>
        when(col(s"s$i") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** N-gram Jaccard: exact similarity for every pair of docs sharing at
    * least one non-stop shingle. Inverted-list self-join (never a cross
    * join): |A∩B| from the shingle join, |A|,|B| from per-doc counts,
    * then J = inter/(|A|+|B|−inter) in exact integer arithmetic until the
    * final IEEE division. Pairs with J ≥ 0.5 survive.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // Inverted-list formulation: ONE groupBy(shingle) builds the posting
    // lists; pair generation is a relational explode over each list (the
    // MaxDF cap bounds it at O(MaxDF²) per shingle) and per-doc sizes
    // fall out of the same lists — so the corpus is scanned twice and the
    // doc-shingle set shuffles once, vs the naive self-join's 6 scans.
    // collect_set subsumes the per-doc shingle dedup (its partial-agg
    // buffer is already a set), so the raw shingles shuffle once instead
    // of distinct-then-regroup shuffling them twice.
    val lists = docShingles(s, dir, dedup = false)
      .groupBy("shingle")
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) <= MaxDF)
    val sizes = lists.select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = lists.filter(size(col("docs")) >= 2)
      .select(explode(flatten(transform(col("docs"), (x, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Winnowing-style document fingerprint: the 5 lexicographically
    * smallest md5s of the doc's character 8-grams — a compact sketch for
    * containment/near-dup lookup.
    *
    * Uses the native `graft_min_k` aggregate ([[graft.functions.MinKDistinct]])
    * instead of `sort_array(collect_set(...))[1:5]`: the agg buffer is a
    * bounded ≤5-string set with map-side partial aggregation, so the
    * shuffle moves 5 hashes per doc per partition — not every 8-gram of
    * every document, which is the difference between O(k) and O(doc
    * length) shuffle bytes at 100 TB.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    // the transform lambda emits the (cheap) substrings; md5 stays a
    // top-level expression so it runs codegen'd, not interpreted
    // per-element inside the higher-order function
    Tables.documents(s, dir)
      .select(col("doc_id"), normText(col("text")).as("nt"))
      .filter(length(col("nt")) >= 8)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("nt")) - 7), i =>
          substring(col("nt"), i, lit(8)))).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .groupBy("doc_id")
      .agg(array_join(call_function("graft_min_k", col("gh"), lit(5)), ",")
        .as("fingerprint"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> dedupExact _,
    "dedup_minhash_lsh"   -> dedupMinhashLsh _,
    "dedup_simhash"       -> dedupSimhash _,
    "dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "doc_fingerprint"     -> docFingerprint _)

  private val simhashSumsSql = (1 to 32).map(i =>
    s"SUM(CASE WHEN substr(th, $i, 1) >= '8' THEN 1 ELSE -1 END) AS s$i")
    .mkString(",\n    ")
  private val simhashBitsSql = (1 to 32).map(i =>
    s"CASE WHEN s$i > 0 THEN '1' ELSE '0' END").mkString(" || ")

  private val minhashSigSql = (0 until NumHashes).map { i =>
    val (j, w) = (i / 4, i % 4)
    s"MIN(substr(h$j, ${w * 8 + 1}, 8)) AS m$i"
  }.mkString(",\n    ")
  private val minhashBandSql = (0 until NumBands).map { b =>
    val cols = (0 until BandRows).map(r => s"m${b * BandRows + r}")
    s"  SELECT doc_id, $b AS band, md5(${cols.mkString(" || '|' || ")}) AS sig FROM sig"
  }.mkString("\n  UNION ALL\n")

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      s"""SELECT md5($normSql) AS text_hash,
         |  MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""$shinglesSql,
         |seeded AS (
         |  SELECT doc_id,
         |    ${(0 until NumBands).map(j =>
                 s"md5('$j:' || shingle) AS h$j").mkString(", ")}
         |  FROM sh),
         |sig AS (
         |  SELECT doc_id,
         |    $minhashSigSql
         |  FROM seeded GROUP BY doc_id),
         |bands AS (
         |$minhashBandSql)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "dedup_simhash" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, md5(w) AS th
         |  FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
         |        FROM documents)
         |  WHERE w <> ''),
         |sums AS (
         |  SELECT doc_id,
         |    $simhashSumsSql
         |  FROM tok GROUP BY doc_id)
         |SELECT doc_id, $simhashBitsSql AS simhash FROM sums""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""$shinglesSql,
         |nonstop AS (
         |  SELECT sh.doc_id, sh.shingle FROM sh
         |  JOIN (SELECT shingle FROM sh GROUP BY shingle
         |        HAVING COUNT(*) <= $MaxDF) ok USING (shingle)),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM nonstop GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM nonstop a JOIN nonstop b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
         |    AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
         |      >= 0.5""".stripMargin,
    "doc_fingerprint" ->
      s"""WITH grams AS (
         |  SELECT DISTINCT doc_id, md5(substr(nt, i, 8)) AS gh
         |  FROM (SELECT doc_id, $normSql AS nt FROM documents)
         |       t, unnest(generate_series(1, len(nt) - 7)) AS u(i)
         |  WHERE len(nt) >= 8)
         |SELECT doc_id,
         |  array_to_string(list_sort(list(DISTINCT gh))[1:5], ',')
         |    AS fingerprint
         |FROM grams GROUP BY doc_id""".stripMargin)
}
