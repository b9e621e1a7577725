package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Checkpoint.CheckpointOps
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

  /** Tokenized documents for the typed (map-side) dedup kernels. The
    * lower/split stays RELATIONAL so tokenization is Spark-exact (JVM
    * `String.toLowerCase` applies full case mapping, e.g. ß→ss, which
    * would diverge from Spark's and DuckDB's simple mapping); only the
    * hash kernels below run in typed code.
    */
  private def docTokens(s: SparkSession, dir: String)
      : Dataset[(Long, Array[String])] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), split(normText(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .as[(Long, Array[String])]
  }

  private def md5Hex(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
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
    * Pipeline: tokens → per-doc 16-min signature + 4 band signatures
    * (single typed map pass, zero shuffle) → band-bucket join → candidate
    * pairs with the number of agreeing bands. Values are bit-identical to
    * the pure-SQL oracle: hash h = 8-hex-char window h%4 of
    * md5("(h/4):shingle"), minimized per doc.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = bandRows(docTokens(s, dir))
    // Bucket-local pair expansion instead of a bands⨝bands self-join: a
    // self-join would recompute the typed signature subtree once per side
    // (object-operator plans don't canonicalize for exchange reuse), and
    // at scale a join shuffles the band rows twice. One groupBy(bucket)
    // + in-bucket pair loop touches every band row exactly once. Within a
    // band a doc appears once, so pair multiplicity = #agreeing bands.
    bands
      .groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) >= 2)
      .select(col("docs")).as[Array[Long]]
      .flatMap(d => packedPairsOf(d, withDiagonal = false))
      .toDF("pair")
      .groupBy("pair")
      .agg(count(lit(1)).as("n_bands"))
      .select(shiftright(col("pair"), 32).as("doc_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_b"),
        col("n_bands"))
  }

  /** (doc_id, band, sig) MinHash band-signature rows — the map-side
    * kernel shared by the full-corpus LSH pairing and the incremental
    * index. The whole signature stage is MAP-SIDE: one typed pass per
    * document computes all 16 min-hashes and the 4 band signatures — no
    * shuffle of shingle rows at all (the relational formulation shuffled
    * |shingles| rows into a groupBy(doc_id); at 100 TB that shuffle IS
    * the job). Hash h of a shingle = 32-bit window h%4 of
    * md5("(h/4):shingle"), digested directly from token bytes (no
    * shingle string is ever built); unsigned-int min == lexicographic
    * min of the fixed-width lowercase hex the oracle takes. Only the
    * (doc_id, band, sig) rows — 4 per doc — leave the map stage.
    */
  private def bandRows(docs: Dataset[(Long, Array[String])]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val prefixes = (0 until NumBands).map(j => s"$j:".getBytes(UTF_8)).toArray
    docs.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { case (docId, toks) =>
        val tb = new Array[Array[Byte]](toks.length)
        var t = 0
        while (t < toks.length) { tb(t) = toks(t).getBytes(UTF_8); t += 1 }
        val mins = Array.fill(NumHashes)(-1) // 0xffffffff = unsigned max
        var i = 0
        while (i + 2 < tb.length) {
          var j = 0
          while (j < NumBands) {
            md.reset()
            md.update(prefixes(j))
            md.update(tb(i)); md.update(' '.toByte)
            md.update(tb(i + 1)); md.update(' '.toByte)
            md.update(tb(i + 2))
            val d = md.digest()
            var w = 0
            while (w < BandRows) {
              val v = ((d(w * 4) & 0xff) << 24) | ((d(w * 4 + 1) & 0xff) << 16) |
                ((d(w * 4 + 2) & 0xff) << 8) | (d(w * 4 + 3) & 0xff)
              val k = j * 4 + w
              if (java.lang.Integer.compareUnsigned(v, mins(k)) < 0) mins(k) = v
              w += 1
            }
            j += 1
          }
          i += 1
        }
        (0 until NumBands).toArray.map { b =>
          val bandStr = (0 until BandRows)
            .map(r => f"${mins(b * BandRows + r)}%08x").mkString("|")
          (docId, b, md5Hex(md.digest(bandStr.getBytes(UTF_8))))
        }
      }
    }.toDF("doc_id", "band", "sig")
  }

  /** Batch slice for [[dedupIncremental]]: every 5th doc_id plays
    * "today's arrivals"; the rest are the already-indexed corpus.
    * Shared with the streaming twin in [[SourceQueries]].
    */
  private[operators] val BatchMod = 5L

  /** Build (or reuse) the persisted base-corpus band index for `dir`
    * and return its table name — the warehouse half of
    * [[dedupIncremental]], shared by the streaming twin.
    */
  private[operators] def ensureBandIndex(s: SparkSession,
                                         dir: String): String = {
    val suffix = Tables.dirKey(dir)
    val fp = Tables.dataFingerprint(s"$dir/documents.parquet")
    val bytes = org.apache.commons.io.FileUtils.sizeOf(
      new java.io.File(s"$dir/documents.parquet"))
    val nBuckets = graft.core.Warehouse.bucketCount(s, bytes)
    val prefix = s"graft_mh_bands_${suffix}_"
    val tbl = s"$prefix${fp}_b$nBuckets"
    graft.core.Warehouse.ensure(s, Seq(prefix), Seq(tbl)) {
      bandRows(docTokens(s, dir).filter(col("doc_id") % BatchMod =!= 0))
        .write.bucketBy(nBuckets, "band", "sig")
        .mode("overwrite").saveAsTable(tbl)
    }
    tbl
  }

  /** Band-signature rows of the batch slice — the arrival side of the
    * incremental join, shared by the batch and streaming twins. Works
    * on any documents frame (batch or streaming) with (doc_id, text).
    */
  private[operators] def batchBandRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    bandRows(docs
      .filter(col("doc_id") % BatchMod === 0)
      .select(col("doc_id"), split(normText(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .as[(Long, Array[String])])
  }

  /** INCREMENTAL near-dup: dedup a new document batch against a
    * PERSISTED corpus signature index instead of recomputing the corpus.
    *
    * At 100 TB the dominant dedup cost is not one batch's signatures —
    * it is re-reading the whole corpus every time new data arrives. This
    * operator stores the base corpus's (doc_id, band, sig) MinHash band
    * rows ONCE per corpus generation as a warehouse table bucketed on
    * the join key (band, sig) (fingerprint-keyed via
    * [[graft.core.Warehouse]], so a regenerated corpus rebuilds instead
    * of serving stale signatures; bucket count scales with corpus bytes
    * via [[graft.core.Warehouse.bucketCount]]). A new batch then
    * computes signatures only for its OWN documents and equi-joins the
    * stored index: the bucketed base side is read pre-partitioned with
    * zero shuffle, so incremental dedup moves O(|batch|) rows, not
    * O(|corpus|). Output: (doc_new, doc_base, n_bands) — each batch doc
    * with the base docs it near-duplicates and the band-agreement count.
    *
    * Persistence is semantically invisible: the oracle recomputes both
    * sides from scratch in SQL and must hash-match exactly.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val tbl = ensureBandIndex(s, dir)
    val batch = batchBandRows(Tables.documents(s, dir))
      .withColumnRenamed("doc_id", "doc_new")
    batch
      .join(s.table(tbl).withColumnRenamed("doc_id", "doc_base"),
        Seq("band", "sig"))
      .groupBy("doc_new", "doc_base")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** All ascending (a, b) pairs of a sorted id list — the in-bucket
    * candidate expansion shared by the LSH and Jaccard operators —
    * PACKED as `(a << 32) | b` primitive longs: tuple rows on this path
    * box two longs per candidate (51 M candidates at the 10× harness)
    * and the pack also halves the shuffled key width. Safe while ids
    * stay under 2^31 (guarded; generators keep doc_id ≤ 1e8). With
    * `withDiagonal`, (d, d) self-pairs lead the output — the Jaccard
    * size rows.
    */
  private def packedPairsOf(docs: Array[Long],
                            withDiagonal: Boolean): Array[Long] = {
    val n = docs.length
    // docs is sorted ascending: first/last bound the id range. Negative
    // or >31-bit ids would pack to garbage silently, so both ends are
    // checked.
    require(n > 0, "empty posting list")
    require(docs(0) >= 0 && docs(n - 1) < (1L << 31),
      s"doc_id range [${docs(0)}, ${docs(n - 1)}] not packable in 31 bits")
    val diag = if (withDiagonal) n else 0
    val out = new Array[Long](diag + n * (n - 1) / 2)
    var k = 0
    if (withDiagonal) {
      var d = 0
      while (d < n) { out(k) = (docs(d) << 32) | docs(d); k += 1; d += 1 }
    }
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = (docs(i) << 32) | docs(j)
        k += 1
        j += 1
      }
      i += 1
    }
    out
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

  /** Candidate-pair budget for [[dedupNgramJaccard]]'s exact
    * inverted-list expansion (`spark.graft.jaccard.pairBudget` to
    * override). The projected pair count Σ n·(n−1)/2 over the capped
    * posting lists rides the SAME job that materializes the lists (an
    * `observe` metric — no extra pass); past budget the operator falls
    * back to MinHash-LSH candidate generation with exact Jaccard
    * re-scoring of only those candidates. Why: the per-shingle MaxDF
    * cap bounds each list, but DUPLICATE DENSITY multiplies how many
    * lists sit just under the cap — measured on the 10× replicated-text
    * harness the candidate set grows 40.8× (51.6 M pairs) while natural
    * sf0.1 density is 1.27 M, so the exact path's cost is density-, not
    * size-, controlled. The default budget (8 M) clears every natural
    * harness density with 6× headroom and trips on the replicated one.
    */
  val JaccardPairBudgetConf = "spark.graft.jaccard.pairBudget"
  val JaccardPairBudgetDefault = 8000000L

  /** N-gram Jaccard: exact similarity for every pair of docs sharing at
    * least one non-stop shingle. Inverted-list self-join (never a cross
    * join): |A∩B| from the shingle join, |A|,|B| from per-doc counts,
    * then J = inter/(|A|+|B|−inter) in exact integer arithmetic until the
    * final IEEE division. Pairs with J ≥ 0.5 survive. Candidate
    * expansion is budgeted — see [[JaccardPairBudgetConf]]: past budget,
    * candidates come from the MinHash-LSH bands instead (recall < 1 by
    * design there; every returned pair still carries its EXACT Jaccard
    * and the ≥ 0.5 filter, so the fallback is a candidate-set change,
    * never a score change).
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Inverted-list formulation: ONE groupBy(shingle) builds the posting
    // lists; pair generation explodes each list (the MaxDF cap bounds it
    // at O(MaxDF²) per shingle) and per-doc sizes fall out of the same
    // lists — so the corpus is scanned twice and the doc-shingle set
    // shuffles once, vs the naive self-join's 6 scans. Shingles cross
    // the shuffle as 60-bit md5-prefix LONGS, not strings — the
    // doc-shingle relation is the operator's bulk (33 M rows at the 10×
    // harness), and an 8-byte key both shrinks it ~3× and turns the
    // posting-list aggregation into long ops. The same hash is computed
    // in the oracle, so a (cosmically unlikely, p≈n²/2⁶¹) collision
    // would still verify. Shingle emission and pair expansion are typed
    // kernels — the relational HOF equivalents run interpreted, outside
    // whole-stage codegen.
    val shingleRows = docTokens(s, dir).mapPartitions { docs =>
      val md = MessageDigest.getInstance("MD5")
      docs.flatMap { case (docId, toks) =>
        val seen = new java.util.HashSet[java.lang.Long]()
        val out = Seq.newBuilder[(Long, Long)]
        var i = 0
        while (i + 2 < toks.length) {
          val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
          val d = md.digest(sh.getBytes(UTF_8))
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
          val h = v >>> 4 // == BIGINT of the first 15 md5 hex digits
          if (seen.add(h)) out += ((docId, h))
          i += 1
        }
        out.result()
      }
    }.toDF("doc_id", "shingle")
    // The posting lists are ALWAYS materialized here (eager
    // localCheckpoint, even under the lazy-checkpoint plan-inspection
    // conf — the budget decision below needs the observed scalar NOW,
    // same always-eager precedent as dedupComponents' convergence
    // metric), and the projected candidate count rides that same job as
    // an observe metric: zero extra passes to know whether the exact
    // expansion is affordable BEFORE paying for it.
    val obs = org.apache.spark.sql.Observation()
    val lists = shingleRows
      .groupBy("shingle")
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) <= MaxDF)
      .observe(obs, coalesce(sum(
        expr("CAST(size(docs) AS BIGINT) * (size(docs) - 1) DIV 2")),
        lit(0L)).as("projected_pairs"))
      .localCheckpoint()
    val projected = obs.get("projected_pairs").asInstanceOf[Long]
    val budget = s.conf.get(JaccardPairBudgetConf,
      JaccardPairBudgetDefault.toString).toLong
    val jaccardOf = (inter: DataFrame, sizes: DataFrame) => inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    if (projected <= budget) {
      // Diagonal trick: ONE pass over the posting lists emits (d, d) per
      // member plus (a, b) per ascending pair; after groupBy-count the
      // diagonal rows ARE the per-doc sizes and the off-diagonal rows the
      // intersections — so sizes don't need a second traversal of `lists`
      // (object-operator subtrees don't get exchange reuse; without this
      // the whole shingle pipeline ran once per consumer). The aggregated
      // pair table is tiny (candidates + one diagonal row per doc), so it
      // is checkpointed (eager by default — see graft.core.Checkpoint)
      // and the final joins read the materialized blocks instead of
      // re-running the corpus scan.
      val pairCounts = lists
        .select(col("docs")).as[Array[Long]]
        .flatMap(d => packedPairsOf(d, withDiagonal = true))
        .toDF("pair")
        .groupBy("pair")
        .agg(count(lit(1)).as("n"))
        .select(shiftright(col("pair"), 32).as("doc_a"),
          col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_b"), col("n"))
        .sharedCheckpoint()
      val sizes = pairCounts.filter(col("doc_a") === col("doc_b"))
        .select(col("doc_a").as("doc_id"), col("n").as("sz"))
      val inter = pairCounts.filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("n").as("inter"))
      jaccardOf(inter, sizes)
    } else {
      // PAST BUDGET — duplicate-dense corpus. Candidates now come from
      // the MinHash-LSH bands (already the intended high-density path:
      // banded buckets find high-Jaccard pairs by construction, and the
      // per-bucket expansion is bounded by band collisions, not by
      // posting-list density). The exact Jaccard of each candidate is
      // then recomputed from the SAME capped posting lists, so scores
      // and the ≥ 0.5 filter are identical to the exact path — only
      // recall changes (a pair the LSH misses is lost; at ≥ 0.5 Jaccard
      // the 4×4 banding's miss probability is ≤ (1−J⁴)⁴ ≈ 6% at the
      // 0.5 boundary and vanishes above it).
      val nonstop = lists
        .select(explode(col("docs")).as("doc_id"), col("shingle"))
      val sizes = nonstop.groupBy("doc_id")
        .agg(count(lit(1)).as("sz"))
      val cand = dedupMinhashLsh(s, dir)
        .select(col("doc_a"), col("doc_b"))
      val inter = cand
        .join(nonstop.select(col("doc_id").as("doc_a"), col("shingle")),
          "doc_a")
        .join(nonstop.select(col("doc_id").as("doc_b"), col("shingle")),
          Seq("doc_b", "shingle"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      jaccardOf(inter, sizes)
    }
  }

  /** Winnowing-style document fingerprint: the 5 lexicographically
    * smallest distinct md5s of the doc's character 8-grams — a compact
    * sketch for containment/near-dup lookup.
    *
    * Computed entirely MAP-SIDE: one typed pass per document keeps a
    * bounded ≤5 set of smallest digests — the relational version
    * exploded every 8-gram (O(doc length) rows) into a groupBy(doc_id);
    * this one emits exactly one row per doc and shuffles nothing, which
    * is the difference between O(k) and O(doc length) intermediate bytes
    * at 100 TB. Gram windows are CODE-POINT based (like Spark's
    * `substring` and DuckDB's `substr`), with an ASCII fast path that
    * digests straight out of one shared byte array.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), normText(col("text")).as("nt"))
      .as[(Long, String)]
      .mapPartitions { docs =>
        val md = MessageDigest.getInstance("MD5")
        // top-5 smallest distinct 16-byte digests, ascending
        val top = new Array[Array[Byte]](5)
        def cmp(a: Array[Byte], b: Array[Byte]): Int = {
          var i = 0
          while (i < 16) {
            val d = (a(i) & 0xff) - (b(i) & 0xff)
            if (d != 0) return d
            i += 1
          }
          0
        }
        docs.flatMap { case (docId, nt) =>
          var ascii = true
          var surrogate = false
          var ci = 0
          while (ci < nt.length) {
            val c = nt.charAt(ci)
            if (c >= 128) ascii = false
            if (Character.isHighSurrogate(c)) surrogate = true
            ci += 1
          }
          // code-point count == char count unless supplementary chars
          val nCp = if (surrogate) nt.codePointCount(0, nt.length) else nt.length
          if (nCp < 8) Iterator.empty
          else {
            var n = 0 // entries used in `top`
            def offer(d: Array[Byte]): Unit = {
              if (n == 5 && cmp(d, top(4)) >= 0) return
              var i = 0
              while (i < n && cmp(top(i), d) < 0) i += 1
              if (i < n && cmp(top(i), d) == 0) return // duplicate
              val last = math.min(n, 4)
              var j = last
              while (j > i) { top(j) = top(j - 1); j -= 1 }
              top(i) = d
              if (n < 5) n += 1
            }
            if (ascii) {
              val bytes = nt.getBytes(UTF_8)
              var i = 0
              while (i + 8 <= bytes.length) {
                md.reset(); md.update(bytes, i, 8)
                offer(md.digest())
                i += 1
              }
            } else {
              // windows over code points (Spark/DuckDB substring semantics)
              val cps = nt.codePoints().toArray
              var i = 0
              while (i + 8 <= cps.length) {
                offer(md.digest(new String(cps, i, 8).getBytes(UTF_8)))
                i += 1
              }
            }
            val sb = new java.lang.StringBuilder(5 * 33)
            var i = 0
            while (i < n) {
              if (i > 0) sb.append(',')
              sb.append(md5Hex(top(i)))
              i += 1
            }
            Iterator.single((docId, sb.toString))
          }
        }
      }
      .toDF("doc_id", "fingerprint")
  }

  /** Winnowing-fingerprint candidate pairing — the step
    * [[docFingerprint]]'s digests exist FOR: two docs are near-dup
    * candidates iff they share ≥2 of their top-5 window digests (the
    * MOSS/winnowing rule). Candidates come from an inverted list per
    * digest (never a cross join); digests appearing in more than
    * [[MaxDF]] docs are boilerplate stop-digests and are dropped before
    * expansion — the same O(MaxDF²)-per-key bound as the Jaccard
    * operator. The digest table is 5 rows/doc, so the self-join moves
    * O(5N) narrow rows, and the fingerprint kernel (an object-producing
    * mapPartitions with no exchange reuse) is checkpointed so both join
    * sides read it once.
    */
  def fingerprintPairs(s: SparkSession, dir: String): DataFrame = {
    val grams = docFingerprint(s, dir)
      .select(col("doc_id"), explode(split(col("fingerprint"), ","))
        .as("gh"))
      .sharedCheckpoint()
    val capped = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= MaxDF)
      .select(col("gh"))
    val g = grams.join(capped, "gh")
    val a = g.select(col("gh"), col("doc_id").as("doc_a"))
    val b = g.select(col("gh"), col("doc_id").as("doc_b"))
    a.join(b, Seq("gh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
  }

  /** Max docs per simhash band bucket — the skew guard for the pair
    * expansion (same role as [[MaxDF]] for Jaccard).
    */
  private val MaxBucket = 200L

  /** SimHash near-dup pairs: candidates from 4 8-bit bands of the 32-bit
    * fingerprint (a pair is a candidate iff some band matches — hamming
    * distance ≤ 4 guarantees ≥1 clean band by pigeonhole, so recall is
    * exact for the ≤4 threshold modulo the bucket cap). The simhash rides
    * along into the bucket lists, so the exact hamming check runs inside
    * the in-bucket pair loop (early-exit past 4) and only surviving pairs
    * reach the final distinct — no join back to the fingerprint table,
    * no shuffle of failed candidates.
    */
  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = dedupSimhash(s, dir).select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring(col("simhash"), b * 8 + 1, 8).as("sub"))): _*)).as("bs"))
      .select(col("doc_id"), col("simhash"), col("bs.band"), col("bs.sub"))
    bands
      .groupBy("band", "sub")
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("simhash").as("_2")))).as("docs"))
      .filter(size(col("docs")).between(2, MaxBucket))
      .select(col("docs")).as[Array[(Long, String)]]
      .flatMap { docs =>
        val out = Seq.newBuilder[(Long, Long, Int)]
        var i = 0
        while (i < docs.length) {
          var j = i + 1
          while (j < docs.length) {
            val (sa, sb) = (docs(i)._2, docs(j)._2)
            var ham = 0
            var k = 0
            while (k < 32 && ham <= 4) {
              if (sa.charAt(k) != sb.charAt(k)) ham += 1
              k += 1
            }
            if (ham <= 4) out += ((docs(i)._1, docs(j)._1, ham))
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("doc_a", "doc_b", "hamming")
      .distinct()
  }

  /** Duplicate-cluster assignment: connected components over the strong
    * LSH candidate pairs (≥2 agreeing bands), labeling every clustered
    * doc with the smallest doc_id reachable from it — the step that turns
    * pairwise dedup hits into keep/drop groups in a training pipeline.
    *
    * Iterative min-label propagation: each round joins current labels to
    * the (symmetrized) edge list and takes the min over self + neighbor
    * labels; `localCheckpoint` per round truncates the growing lineage
    * (the standard large-scale CC loop — rounds ≈ log(component
    * diameter), and near-dup components are shallow). Convergence is
    * detected by the label-sum, which strictly decreases until fixpoint;
    * the fixpoint (min id per component) is unique, so the result is
    * independent of round count or partitioning. The sum rides along as
    * an `observe` metric on the SAME job that materializes the round's
    * checkpoint — ONE Spark job per round, no separate driver-side
    * convergence scan (at 100 TB each extra action is a full pass).
    * Oracle: DuckDB `WITH RECURSIVE` transitive closure over the same
    * pairs.
    */
  def dedupComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashLsh(s, dir).filter(col("n_bands") >= 2)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint() // edges are consumed every round — materialize
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .localCheckpoint()
    def observedCheckpoint(df: DataFrame, obs: org.apache.spark.sql.Observation)
        : DataFrame =
      df.observe(obs, sum(col("label")).as("label_sum")).localCheckpoint()
    val obs0 = org.apache.spark.sql.Observation("cc-round-0")
    var labels = observedCheckpoint(
      edges.select(col("src").as("v"), col("src").as("label")).distinct(),
      obs0)
    var lastSum = obs0.get("label_sum").asInstanceOf[Long]
    var converged = false
    var round = 0
    while (!converged && round < 50) {
      round += 1
      val viaNeighbor = edges
        .join(labels, edges("src") === labels("v"))
        .select(col("dst").as("v"), col("label"))
      val obs = org.apache.spark.sql.Observation(s"cc-round-$round")
      val next = observedCheckpoint(
        labels.select(col("v"), col("label")).union(viaNeighbor)
          .groupBy("v").agg(min(col("label")).as("label")),
        obs)
      val nextSum = obs.get("label_sum").asInstanceOf[Long]
      converged = nextSum == lastSum
      lastSum = nextSum
      labels = next
    }
    labels.select(col("v").as("doc_id"), col("label").as("component_id"))
  }

  /** The dedup ACTION: per near-duplicate component (the
    * [[dedupComponents]] clusters), keep one canonical document — the
    * highest [[TextQueries.textStats]] quality score, ties to the lowest
    * doc_id — and report the cluster size. This is the step a real
    * pipeline executes after clustering: everything upstream (LSH pairs,
    * label propagation) is shuffle-bounded as before, and the selection
    * itself is one rank window over the (tiny) component table joined to
    * the per-doc quality scan.
    */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = dedupComponents(s, dir)
    val quality = TextQueries.textStats(s, dir)
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("component_id"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    comp.join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_docs",
        count(lit(1)).over(Window.partitionBy(col("component_id"))))
      .filter(col("rn") === 1)
      .select(col("component_id"), col("doc_id").as("kept_doc_id"),
        col("quality_score").as("kept_quality"), col("n_docs"))
  }

  /** Fuzzy entity resolution by BLOCKING + exact rescoring — the
    * standard shape for "these two names are the same thing modulo a
    * typo": candidate pairs are generated only WITHIN a block (here
    * the name's head noun — in production a phonetic key, a sorted
    * token prefix, or an LSH bucket), so pair count is Σ block², never
    * corpus², and the exact Levenshtein distance — identical classic
    * edit distance in Spark and DuckDB, codegen'd — re-scores only the
    * blocked candidates. The same block-then-rescore discipline as the
    * MinHash/SimHash entries, on the string-similarity axis; the
    * equi-join on the block key is an ordinary shuffle join, no
    * cartesian anywhere (lint-checked like the rest of the catalog).
    */
  def fuzzyNamePairs(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("n").as("n_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"),
      col("n").as("n_b"))
    // the distance is O(|a|·|b|) per pair and dominates the blocked
    // candidates' cost — compute it once, filter on the column (Spark
    // does not CSE across Filter and Project)
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("bigint"))
      .filter(col("dist") <= 4)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }

  /** Segment width for [[dedupSegments]]: the corpus is single-line
    * synthetic text, so the CCNet "line" / C4 "three-sentence span"
    * unit is a fixed 10-token chunk.
    */
  private val SegLen = 10

  /** Segment-level exact dedup — the sub-document granularity the
    * whole-document entries can't see (CCNet dedups at the line level;
    * Gopher drops documents whose duplicate-line fraction exceeds 0.30
    * — boilerplate headers/footers duplicate across a crawl while the
    * documents containing them stay unique). Each document is cut into
    * fixed [[SegLen]]-token segments; a segment INSTANCE is duplicated
    * when its text occurs ≥2 times corpus-wide (including repeats
    * inside one document). Output is per-document budget accounting —
    * total segments, duplicated segments, and the Gopher-style `keep`
    * verdict (duplicated fraction ≤ 0.30, compared in integer space so
    * no float crosses the engine boundary).
    *
    * 100 TB shape: segments never shuffle as text — each one collapses
    * to its md5 inside the projection, so the three keyed exchanges
    * (doc,h), (h), (doc) move 32-byte hashes with partial aggregation;
    * the corpus-wide occurrence count is a window partitioned by the
    * hash, never an unpartitioned window or a self-join.
    */
  def dedupSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), split(normText(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val segs = toks.select(col("doc_id"),
      explode(transform(
        sequence(lit(0L), floor((size(col("t")) - 1) / lit(SegLen))),
        i => md5(array_join(
          slice(col("t"), (i * SegLen + 1).cast("int"), lit(SegLen)), " "))))
        .as("h"))
    val perDocSeg = segs.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    val corpusWide = perDocSeg
      .withColumn("total", sum(col("c")).over(Window.partitionBy("h")))
    corpusWide.groupBy("doc_id").agg(
        sum(col("c")).as("n_segs"),
        sum(when(col("total") >= 2, col("c")).otherwise(lit(0L)))
          .as("n_dup_segs"))
      .withColumn("keep", col("n_dup_segs") * 10 <= col("n_segs") * 3)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_segments"      -> dedupSegments _,
    "fuzzy_name_pairs"    -> fuzzyNamePairs _,
    "dedup_keep_best"     -> dedupKeepBest _,
    "dedup_exact"         -> dedupExact _,
    "dedup_minhash_lsh"   -> dedupMinhashLsh _,
    "dedup_incremental"   -> dedupIncremental _,
    "dedup_simhash"       -> dedupSimhash _,
    "dedup_simhash_pairs" -> dedupSimhashPairs _,
    "dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "dedup_components"    -> dedupComponents _,
    "doc_fingerprint"     -> docFingerprint _,
    "fingerprint_pairs"   -> fingerprintPairs _)

  private val simhashSumsSql = (1 to 32).map(i =>
    s"SUM(CASE WHEN substr(th, $i, 1) >= '8' THEN 1 ELSE -1 END) AS s$i")
    .mkString(",\n    ")
  private val simhashBitsSql = (1 to 32).map(i =>
    s"CASE WHEN s$i > 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** Shared simhash CTE chain (tok → sums → sims) for the simhash and
    * simhash-pairs oracles.
    */
  private lazy val simhashCteSql =
    s"""tok AS (
       |  SELECT DISTINCT doc_id, md5(w) AS th
       |  FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
       |        FROM documents)
       |  WHERE w <> ''),
       |sums AS (
       |  SELECT doc_id,
       |    $simhashSumsSql
       |  FROM tok GROUP BY doc_id),
       |sims AS (SELECT doc_id, $simhashBitsSql AS simhash FROM sums)"""
      .stripMargin

  private val minhashSigSql = (0 until NumHashes).map { i =>
    val (j, w) = (i / 4, i % 4)
    s"MIN(substr(h$j, ${w * 8 + 1}, 8)) AS m$i"
  }.mkString(",\n    ")
  private val minhashBandSql = (0 until NumBands).map { b =>
    val cols = (0 until BandRows).map(r => s"m${b * BandRows + r}")
    s"  SELECT doc_id, $b AS band, md5(${cols.mkString(" || '|' || ")}) AS sig FROM sig"
  }.mkString("\n  UNION ALL\n")

  /** Shared CTE chain (shingles → signatures → bands) for every
    * minhash-family oracle; caller prepends `WITH `/`WITH RECURSIVE `.
    */
  private lazy val minhashBandsBody =
    s"""${shinglesSql.stripPrefix("WITH ")},
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
       |$minhashBandSql)""".stripMargin

  /** [[minhashBandsBody]] extended with the full-corpus candidate-pair
    * join (the minhash / connected-components oracles). */
  private lazy val minhashPairsBody =
    s"""$minhashBandsBody,
       |mh_pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "fuzzy_name_pairs" ->
      """WITH names AS (
        |  SELECT p_name, COUNT(*) AS n FROM part GROUP BY 1),
        |b AS (
        |  SELECT p_name, n,
        |    string_split(p_name, ' ')[-1] AS blk
        |  FROM names)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |  levenshtein(a.p_name, c.p_name) AS dist,
        |  a.n AS n_a, c.n AS n_b
        |FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        |WHERE levenshtein(a.p_name, c.p_name) <= 4""".stripMargin,
    "dedup_exact" ->
      s"""SELECT md5($normSql) AS text_hash,
         |  MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $minhashPairsBody
         |SELECT doc_a, doc_b, n_bands FROM mh_pairs""".stripMargin,
    "dedup_incremental" ->
      s"""WITH $minhashBandsBody
         |SELECT b.doc_id AS doc_new, a.doc_id AS doc_base,
         |  COUNT(*) AS n_bands
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.sig = b.sig
         |WHERE b.doc_id % $BatchMod = 0 AND a.doc_id % $BatchMod <> 0
         |GROUP BY 1, 2""".stripMargin,
    "dedup_components" ->
      s"""WITH RECURSIVE $minhashPairsBody,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |  WHERE n_bands >= 2
         |  UNION
         |  SELECT doc_b, doc_a FROM mh_pairs WHERE n_bands >= 2),
         |reach AS (
         |  SELECT DISTINCT src AS v, src AS w FROM edges
         |  UNION
         |  SELECT e.src, r.w FROM edges e JOIN reach r ON e.dst = r.v)
         |SELECT v AS doc_id, MIN(w) AS component_id FROM reach
         |GROUP BY v""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashPairsBody,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |  WHERE n_bands >= 2
         |  UNION
         |  SELECT doc_b, doc_a FROM mh_pairs WHERE n_bands >= 2),
         |reach AS (
         |  SELECT DISTINCT src AS v, src AS w FROM edges
         |  UNION
         |  SELECT e.src, r.w FROM edges e JOIN reach r ON e.dst = r.v),
         |comp AS (SELECT v AS doc_id, MIN(w) AS component_id FROM reach
         |         GROUP BY v),
         |q AS (SELECT doc_id, quality_score
         |      FROM (${TextQueries.textStatsSql}) t),
         |ranked AS (
         |  SELECT c.component_id, c.doc_id, q.quality_score,
         |    row_number() OVER (PARTITION BY c.component_id
         |      ORDER BY q.quality_score DESC, c.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY c.component_id) AS n
         |  FROM comp c JOIN q USING (doc_id))
         |SELECT component_id, doc_id AS kept_doc_id,
         |  CAST(quality_score AS BIGINT) AS kept_quality,
         |  CAST(n AS BIGINT) AS n_docs
         |FROM ranked WHERE rn = 1""".stripMargin,
    "dedup_simhash" ->
      s"WITH $simhashCteSql\nSELECT doc_id, simhash FROM sims",
    "dedup_simhash_pairs" ->
      s"""WITH $simhashCteSql,
         |bands AS (
         |  SELECT doc_id, b, substr(simhash, b * 8 + 1, 8) AS sub
         |  FROM sims, unnest([0, 1, 2, 3]) AS u(b)),
         |buckets AS (
         |  SELECT b, sub FROM bands GROUP BY b, sub
         |  HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN buckets k ON x.b = k.b AND x.sub = k.sub
         |       JOIN bands y ON y.b = k.b AND y.sub = k.sub
         |  WHERE x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT doc_a, doc_b,
         |    ${(1 to 32).map(i =>
              s"(CASE WHEN substr(sa.simhash, $i, 1) <> " +
              s"substr(sb.simhash, $i, 1) THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS hamming
         |  FROM pairs
         |  JOIN sims sa ON sa.doc_id = doc_a
         |  JOIN sims sb ON sb.doc_id = doc_b)
         |WHERE hamming <= 4""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""$shinglesSql,
         |shh AS (
         |  SELECT DISTINCT doc_id,
         |    CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS shingle
         |  FROM sh),
         |nonstop AS (
         |  SELECT shh.doc_id, shh.shingle FROM shh
         |  JOIN (SELECT shingle FROM shh GROUP BY shingle
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
         |FROM grams GROUP BY doc_id""".stripMargin,
    "fingerprint_pairs" ->
      s"""WITH grams0 AS (
         |  SELECT DISTINCT doc_id, md5(substr(nt, i, 8)) AS gh
         |  FROM (SELECT doc_id, $normSql AS nt FROM documents)
         |       t, unnest(generate_series(1, len(nt) - 7)) AS u(i)
         |  WHERE len(nt) >= 8),
         |fpl AS (
         |  SELECT doc_id, list_sort(list(DISTINCT gh))[1:5] AS ghs
         |  FROM grams0 GROUP BY doc_id),
         |fp AS (SELECT doc_id, unnest(ghs) AS gh FROM fpl),
         |capped AS (
         |  SELECT gh FROM fp GROUP BY gh
         |  HAVING COUNT(*) BETWEEN 2 AND 100),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    COUNT(*) AS shared
         |  FROM fp a
         |  JOIN capped c ON a.gh = c.gh
         |  JOIN fp b ON a.gh = b.gh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 2""".stripMargin,
    "dedup_segments" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS t
         |  FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
         |segs AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(0, (len(t)-1)//$SegLen),
         |      i -> md5(array_to_string(
         |        list_slice(t, i*$SegLen+1, i*$SegLen+$SegLen), ' ')))) AS h
         |  FROM toks),
         |pds AS (SELECT doc_id, h, COUNT(*) AS c FROM segs GROUP BY 1, 2),
         |tot AS (
         |  SELECT doc_id, c, SUM(c) OVER (PARTITION BY h) AS total
         |  FROM pds)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_segs,
         |  CAST(SUM(CASE WHEN total >= 2 THEN c ELSE 0 END) AS BIGINT)
         |    AS n_dup_segs,
         |  (SUM(CASE WHEN total >= 2 THEN c ELSE 0 END) * 10 <= SUM(c) * 3)
         |    AS keep
         |FROM tot GROUP BY doc_id""".stripMargin)
}
